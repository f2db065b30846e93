"""Repetition quality rules vs a pure-python replay."""

import re
from collections import Counter

import pandas as pd
import pytest

from fog_spark.datapipe.text import repetition_scores


def py_rep(text: str, thr=(0.2, 0.18, 0.3)):
    ts = re.findall("[a-z0-9]+", text.lower())
    toks = Counter(ts)
    bigs = Counter(" ".join(ts[i : i + 2]) for i in range(len(ts) - 1))
    tris = Counter(" ".join(ts[i : i + 3]) for i in range(len(ts) - 2))
    ttf = round(max(toks.values()) / len(ts), 6)
    tbf = round(max(bigs.values()) / sum(bigs.values()), 6) if bigs else 0.0
    n_tri = sum(tris.values())
    dtf = round((n_tri - len(tris)) / n_tri, 6) if tris else 0.0
    return (
        len(ts), ttf, tbf, dtf,
        ttf > thr[0] or tbf > thr[1] or dtf > thr[2],
    )


DOCS = {
    1: "spam spam spam spam spam",                       # all three trip
    2: "the quick brown fox jumps over the lazy dog",    # clean
    3: "a b a b a b a b",                                # bigram loop
    4: "one two three one two three seven eight nine",   # dup trigram
    5: "solo",                                           # 1 token: no grams
    6: "alpha bravo charlie delta echo foxtrot golf hotel india juliet",  # clean
}


@pytest.mark.parametrize("doc_id", sorted(DOCS))
def test_matches_python(spark, doc_id):
    df = spark.createDataFrame(pd.DataFrame([(doc_id, DOCS[doc_id])], columns=["doc_id", "text"]))
    r = repetition_scores(df).collect()[0]
    got = (r["n_tokens"], r["top_token_frac"], r["top_bigram_frac"],
           r["dup_trigram_frac"], r["flagged"])
    assert got == py_rep(DOCS[doc_id])


def test_flags(spark):
    df = spark.createDataFrame(pd.DataFrame(sorted(DOCS.items()), columns=["doc_id", "text"]))
    got = {r["id"]: r["flagged"] for r in repetition_scores(df).collect()}
    assert got == {d: py_rep(t)[4] for d, t in DOCS.items()}
    assert got[1] and got[3] and not got[6]
