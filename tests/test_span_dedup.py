"""Span-level exact dedup vs a pure-python replay."""

import re

import pandas as pd

from fog_spark.datapipe.dedup import span_dedup_stats


def py_spans(text: str, k: int):
    ts = re.findall("[a-z0-9]+", text.lower())
    return [" ".join(ts[i * k : (i + 1) * k]) for i in range(len(ts) // k)]


def py_span_dedup(docs: dict, k: int) -> dict:
    from collections import Counter

    ct = Counter(s for t in docs.values() for s in py_spans(t, k))
    out = {}
    for d, t in docs.items():
        sp = py_spans(t, k)
        dup = sum(1 for s in sp if ct[s] > 1)
        out[d] = (len(sp), dup, round(dup / len(sp), 6) if sp else 0.0)
    return out


COMMON = "alpha beta gamma delta"  # 4 tokens: combines into shared spans
DOCS = {
    1: f"{COMMON} one two three four unique tail piece here extra pad words",
    2: f"{COMMON} one two three four other ending entirely different now yes",
    3: "totally fresh content with no repeats at all nine ten eleven twelve",
    4: "short doc",                    # < k tokens: no spans
    5: f"{COMMON} one two three four unique tail piece here extra pad words",  # exact dup of 1
}


def test_matches_python(spark):
    k = 4
    df = spark.createDataFrame(pd.DataFrame(sorted(DOCS.items()), columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
        for r in span_dedup_stats(df, k=k).collect()
    }
    assert got == py_span_dedup(DOCS, k)
    # structural expectations: docs 1/5 fully duplicated, 4 has no spans
    assert got[1][2] == 1.0 and got[5][2] == 1.0
    assert got[4] == (0, 0, 0.0)
    assert got[3][1] == 0


def test_intra_doc_repeat_counts(spark):
    # the same span text twice INSIDE one doc is a duplicate
    docs = {7: "a b c d a b c d x y z w"}
    df = spark.createDataFrame(pd.DataFrame(sorted(docs.items()), columns=["doc_id", "text"]))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac"])
        for r in span_dedup_stats(df, k=4).collect()
    }
    assert got == py_span_dedup(docs, 4)
    assert got[7] == (3, 2, round(2 / 3, 6))
