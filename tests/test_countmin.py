"""Count-Min sketch vs a pure-python replay + its classic guarantees."""

import hashlib

import pandas as pd
import pytest

from fog_spark.datapipe.sketches import cm_estimate, cm_merge, cm_sketch


def py_bucket(x: str, row: int, width: int, salt: int) -> int:
    h = hashlib.md5(f"cm{salt}:{row}:{x}".encode()).hexdigest()[:13]
    return int(h, 16) % width


def py_cm(items, depth, width, salt):
    sk = {}
    for x in items:
        for r in range(depth):
            k = (r, py_bucket(x, r, width, salt))
            sk[k] = sk.get(k, 0) + 1
    return sk


ITEMS = (["apple"] * 50 + ["pear"] * 20 + ["plum"] * 5
         + [f"noise{i}" for i in range(200)])


def _df(spark, items):
    return spark.createDataFrame(pd.DataFrame({"t": items}))


def test_sketch_matches_python(spark):
    got = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(_df(spark, ITEMS), "t", depth=3, width=64, salt=7).collect()
    }
    assert got == py_cm(ITEMS, 3, 64, 7)


def test_estimate_one_sided_and_tight_when_wide(spark):
    df = _df(spark, ITEMS)
    true = {x: ITEMS.count(x) for x in ("apple", "pear", "plum")}
    probes = _df(spark, list(true))
    # narrow sketch: one-sided error
    sk = cm_sketch(df, "t", depth=3, width=16, salt=7)
    est = {r["item"]: r["est_c"] for r in cm_estimate(sk, probes, "t", 3, 16, 7).collect()}
    assert all(est[x] >= c for x, c in true.items())
    # wide sketch: few items, no collisions -> exact
    skw = cm_sketch(df, "t", depth=4, width=4096, salt=7)
    estw = {r["item"]: r["est_c"] for r in cm_estimate(skw, probes, "t", 4, 4096, 7).collect()}
    assert estw == true


def test_merge_equals_union(spark):
    a, b = ITEMS[:100], ITEMS[100:]
    merged = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_merge(
            cm_sketch(_df(spark, a), "t", 3, 64, 7),
            cm_sketch(_df(spark, b), "t", 3, 64, 7),
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["c"]
        for r in cm_sketch(_df(spark, ITEMS), "t", 3, 64, 7).collect()
    }
    assert merged == whole


def test_unseen_item_estimates_from_collisions_only(spark):
    sk = cm_sketch(_df(spark, ITEMS), "t", depth=4, width=4096, salt=7)
    est = cm_estimate(sk, _df(spark, ["never-seen"]), "t", 4, 4096, 7).collect()
    assert est[0]["est_c"] == 0  # wide sketch: all 4 buckets empty
