"""Walker alias-table weighted sampling: exactness and corpus checks."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fog_spark.algorithms.walks import build_alias_tables, weighted_random_walks_alias


def _edges_df(spark, triples):
    pdf = pd.DataFrame(triples, columns=["src", "dst", "weight"])
    return spark.createDataFrame(pdf)


def test_alias_table_distribution_is_fraction_exact(spark):
    """P(dst) enumerated from the table == w/tot as exact rationals,
    for every vertex of a random weighted graph."""
    rng = np.random.default_rng(5)
    triples = []
    for s in range(12):
        for d in rng.choice(40, size=rng.integers(1, 9), replace=False):
            triples.append((s, int(d) + 100, float(rng.integers(1, 50)) / 10.0))
    rows = build_alias_tables(_edges_df(spark, triples), weight_scale=10).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    want = {}
    for s, d, w in triples:
        want[(s, d)] = want.get((s, d), 0) + 0  # dedup below uses max like the impl
        want[(s, d)] = max(want[(s, d)], round(w * 10))
    for s, rs in by_src.items():
        n = rs[0]["outdeg"]
        tot = rs[0]["tot"]
        assert len(rs) == n
        p = {}
        for r in rs:
            assert 0 <= r["prob"] <= tot
            p[r["dst"]] = p.get(r["dst"], Fraction(0)) + Fraction(r["prob"], tot * n)
            p[r["alias_dst"]] = p.get(r["alias_dst"], Fraction(0)) + Fraction(tot - r["prob"], tot * n)
        assert sum(p.values()) == 1
        for d, frac in p.items():
            assert frac == Fraction(want[(s, d)], tot), (s, d)


def test_alias_table_rejects_zero_integer_weights(spark):
    with pytest.raises(ValueError, match="weight_scale"):
        build_alias_tables(_edges_df(spark, [(0, 1, 0.04)]), weight_scale=10)


def test_alias_walks_follow_edges_and_are_deterministic(spark):
    rng = np.random.default_rng(11)
    triples = [
        (int(a), int(b), float(w) / 10.0)
        for a, b, w in zip(
            rng.integers(0, 25, 120), rng.integers(0, 25, 120), rng.integers(1, 30, 120)
        )
        if a != b
    ]
    edges = _edges_df(spark, triples)
    out1 = sorted(map(tuple, weighted_random_walks_alias(edges, length=4, seed=7).collect()))
    out2 = sorted(map(tuple, weighted_random_walks_alias(edges, length=4, seed=7).collect()))
    assert out1 == out2
    eset = {(s, d) for s, d, _ in triples}
    walks = {}
    for wid, step, v in out1:
        walks.setdefault(wid, {})[step] = v
    n_trans = 0
    for wid, steps in walks.items():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in eset
            n_trans += 1
    assert n_trans > 0


def test_alias_walks_match_weights_empirically(spark):
    """Star 0 -> {1,2,3} with weights 1:2:7 — step-1 frequencies over a
    large corpus approach 0.1/0.2/0.7 (loose bound: hash streams are
    pseudo-random, not seeded numpy)."""
    edges = _edges_df(spark, [(0, 1, 0.1), (0, 2, 0.2), (0, 3, 0.7)])
    verts = spark.createDataFrame(pd.DataFrame({"id": [0]}))
    out = weighted_random_walks_alias(
        edges, length=1, walks_per_vertex=4000, vertices=verts, seed=3
    )
    counts = {r["vertex"]: r["n"] for r in
              out.where(F.col("step") == 1).groupBy("vertex").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == 4000
    for v, p in [(1, 0.1), (2, 0.2), (3, 0.7)]:
        assert abs(counts.get(v, 0) / total - p) < 0.03, (v, counts)
