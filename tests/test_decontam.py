"""Benchmark decontamination vs a pure-python shingle replay."""

import re

import pandas as pd
import pytest

from fog_spark.datapipe.decontam import decontaminate, shingle_frame


def py_shingles(text: str, n: int) -> set:
    ts = re.findall("[a-z0-9]+", text.lower())
    return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}


def py_decontam(train: dict, bench: dict, n: int, thr: float) -> dict:
    bsh = set().union(*(py_shingles(t, n) for t in bench.values())) if bench else set()
    out = {}
    for d, t in train.items():
        sh = py_shingles(t, n)
        hits = len(sh & bsh)
        r = round(hits / len(sh), 6) if sh else 0.0
        out[d] = (len(sh), hits, r, r >= thr)
    return out


TRAIN = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox sat still",          # partial overlap with bench
    3: "completely different words here now ok",  # no overlap
    4: "xy",                                      # < n tokens -> no shingles
    5: "alpha beta gamma alpha beta gamma alpha", # repeated shingles dedup
}
BENCH = {
    100: "a quick brown fox jumps over fences",
    101: "alpha beta gamma delta",
}


def _df(spark, d):
    return spark.createDataFrame(
        pd.DataFrame([(k, v) for k, v in d.items()], columns=["doc_id", "text"])
    )


@pytest.mark.parametrize("bcast", [True, False])
def test_decontaminate_matches_python(spark, bcast):
    got = {
        r["doc_id"]: (
            r["n_unique_shingles"],
            r["n_contaminated"],
            r["contamination_r"],
            r["flagged"],
        )
        for r in decontaminate(
            _df(spark, TRAIN), _df(spark, BENCH), n=3, threshold=0.3,
            broadcast_benchmark=bcast,
        ).collect()
    }
    assert got == py_decontam(TRAIN, BENCH, 3, 0.3)


def test_zero_shingle_doc_is_clean(spark):
    rows = decontaminate(_df(spark, {4: "xy"}), _df(spark, BENCH), n=3).collect()
    assert [(r["n_unique_shingles"], r["contamination_r"], r["flagged"]) for r in rows] == [
        (0, 0.0, False)
    ]


def test_shingle_frame_distinct(spark):
    rows = shingle_frame(_df(spark, {5: TRAIN[5]}), 3).collect()
    gs = [r["g"] for r in rows]
    assert len(gs) == len(set(gs)) == len(py_shingles(TRAIN[5], 3))


def test_benchmark_side_is_broadcast(spark):
    plan = decontaminate(
        _df(spark, TRAIN), _df(spark, BENCH), n=3, broadcast_benchmark=True
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
