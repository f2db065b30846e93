"""Triad census vs a brute-force enumeration with independent
canonicalization."""

import itertools

from fog_spark.algorithms.triads import _BIT, triad_census
from fog_spark.fixtures import make_er_graph


def _py_census(pairs):
    es = {(int(s), int(t)) for s, t in pairs if s != t}
    verts = sorted({v for e in es for v in e})
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(verts, 3):
        tri = (x, y, z)
        linked_dyads = sum(
            1
            for i, j in ((0, 1), (0, 2), (1, 2))
            if (tri[i], tri[j]) in es or (tri[j], tri[i]) in es
        )
        if linked_dyads < 2:
            continue
        best = None
        for perm in itertools.permutations(range(3)):
            code = 0
            for (i, j), bit in _BIT.items():
                if (tri[perm[i]], tri[perm[j]]) in es:
                    code += bit
            best = code if best is None else min(best, code)
        counts[best] = counts.get(best, 0) + 1
    return counts


def _run(spark, pairs):
    df = spark.createDataFrame(sorted(set(pairs)), ["src", "dst"])
    return {r["triad_code"]: r["n_triads"] for r in triad_census(df).collect()}


def test_triad_census_er(spark):
    g = make_er_graph(n=18, p=0.15, seed=2)
    pairs = [(int(s), int(t)) for s, t in g.edges if s != t]
    got = _run(spark, pairs)
    expected = _py_census(pairs)
    assert got == expected
    assert len(expected) >= 6  # fixture hits a real variety of classes


def test_triad_census_hand_graphs(spark):
    # directed 3-cycle: one triad, canonical code of {x->y, y->z, z->x}
    cyc = [(0, 1), (1, 2), (2, 0)]
    got = _run(spark, cyc)
    assert got == _py_census(cyc)
    assert sum(got.values()) == 1
    # mutual dyad + spoke, plus an untouched extra edge far away
    g2 = [(0, 1), (1, 0), (1, 2), (10, 11)]
    got2 = _run(spark, g2)
    assert got2 == _py_census(g2)
    assert sum(got2.values()) == 1  # the (10,11) dyad joins no triple


def test_triad_classes_cap(spark):
    """At most the 13 connected triad isomorphism classes can appear."""
    g = make_er_graph(n=14, p=0.5, seed=6)
    pairs = [(int(s), int(t)) for s, t in g.edges if s != t]
    got = _run(spark, pairs)
    assert got == _py_census(pairs)
    assert len(got) <= 13


def _py_census_full(pairs):
    es = {(int(s), int(t)) for s, t in pairs if s != t}
    verts = sorted({v for e in es for v in e})
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(verts, 3):
        tri = (x, y, z)
        best = None
        for perm in itertools.permutations(range(3)):
            code = 0
            for (i, j), bit in _BIT.items():
                if (tri[perm[i]], tri[perm[j]]) in es:
                    code += bit
            best = code if best is None else min(best, code)
        counts[best] = counts.get(best, 0) + 1
    return {c: n for c, n in counts.items() if n > 0}


def test_triad_census_full_er(spark):
    from fog_spark.algorithms.triads import triad_census_full

    g = make_er_graph(n=16, p=0.12, seed=4)
    pairs = [(int(s), int(t)) for s, t in g.edges if s != t]
    df = spark.createDataFrame(sorted(set(pairs)), ["src", "dst"])
    got = {r["triad_code"]: r["n_triads"] for r in triad_census_full(df).collect()}
    expected = _py_census_full(pairs)
    assert got == expected
    assert 0 in expected and 1 in expected  # empties and asym-dyad triads present
    n = len({v for e in set(pairs) for v in e})
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6


def test_triad_census_full_with_mutuals(spark):
    from fog_spark.algorithms.triads import triad_census_full

    pairs = [(0, 1), (1, 0), (2, 3), (3, 4), (4, 3), (5, 0)]
    df = spark.createDataFrame(pairs, ["src", "dst"])
    got = {r["triad_code"]: r["n_triads"] for r in triad_census_full(df).collect()}
    assert got == _py_census_full(pairs)
