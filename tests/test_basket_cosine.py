"""Basket cosine top-k vs a pure-python replay."""

import math

import pandas as pd
import pytest

from fog_spark.datapipe.similarity import basket_cosine_topk

BASKETS = {
    1: ["milk", "bread", "eggs"],
    2: ["milk", "bread"],
    3: ["milk", "beer"],
    4: ["beer", "chips"],
    5: ["beer", "chips", "milk"],
    6: ["bread", "eggs"],
}


def py_topk(baskets, k, max_basket=None):
    deg = {}
    for its in baskets.values():
        for it in set(its):
            deg[it] = deg.get(it, 0) + 1
    use = {b: set(i) for b, i in baskets.items()
           if max_basket is None or len(set(i)) <= max_basket}
    co = {}
    for its in use.values():
        for a in its:
            for b in its:
                if a != b:
                    co[(a, b)] = co.get((a, b), 0) + 1
    sc = {
        p: (n, round(n / math.sqrt(deg[p[0]] * deg[p[1]]), 6))
        for p, n in co.items()
    }
    out = {}
    for a in {p[0] for p in sc}:
        nb = sorted(
            ((b, *sc[(a, b)]) for (x, b) in sc if x == a),
            key=lambda t: (-t[2], t[0]),
        )[:k]
        out[a] = [(b, n, c, i + 1) for i, (b, n, c) in enumerate(nb)]
    return out


def _df(spark, baskets):
    rows = [(bk, it) for bk, its in sorted(baskets.items()) for it in its]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["bk", "it"]))


@pytest.mark.parametrize("k", [1, 2, 10])
def test_matches_python(spark, k):
    got = {}
    for r in basket_cosine_topk(_df(spark, BASKETS), "bk", "it", k=k).collect():
        got.setdefault(r["a"], []).append((r["b"], r["n_ab"], r["cos_r"], r["rk"]))
    for a in got:
        got[a].sort(key=lambda t: t[3])
    assert got == py_topk(BASKETS, k)


def test_max_basket_cap_drops_pairs_not_degrees(spark):
    b = dict(BASKETS)
    b[9] = [f"x{i}" for i in range(10)] + ["milk"]  # oversized basket
    got = {}
    for r in basket_cosine_topk(_df(spark, b), "bk", "it", k=3, max_basket=5).collect():
        got.setdefault(r["a"], []).append((r["b"], r["n_ab"], r["cos_r"], r["rk"]))
    for a in got:
        got[a].sort(key=lambda t: t[3])
    assert got == py_topk(b, 3, max_basket=5)
    # the capped basket contributed to milk's denominator but no pairs
    assert not any(x.startswith("x") for nbrs in got.values() for x, *_ in nbrs)


def test_duplicate_item_rows_count_once(spark):
    b = {1: ["a", "a", "b"], 2: ["a", "b", "b"]}
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["cos_r"])
        for r in basket_cosine_topk(_df(spark, b), "bk", "it", k=5).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (2, 1.0)}
