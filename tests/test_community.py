"""Modularity + synchronous Louvain local moves vs pure-python oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fog_spark.algorithms.community import louvain_local_move, modularity
from fog_spark.fixtures import named_graphs

GRAPHS = named_graphs()


def _sym_simple(edges: np.ndarray) -> set[tuple[int, int]]:
    """Both orientations, no self-loops, no duplicates — the canonical
    symmetric form community ops operate on."""
    out = set()
    for s, d in edges.tolist():
        if s != d:
            out.add((s, d))
            out.add((d, s))
    return out


def _sym_spark(spark, edges: np.ndarray):
    import pandas as pd

    rows = sorted(_sym_simple(edges))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))


def py_modularity(sym: set[tuple[int, int]], labels: dict[int, int]) -> tuple[int, float]:
    m2 = len(sym)
    deg: dict[int, int] = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    intra2 = sum(1 for s, d in sym if labels[s] == labels[d])
    dc: dict[int, int] = {}
    for v, k in deg.items():
        dc[labels[v]] = dc.get(labels[v], 0) + k
    q = (m2 * intra2 - sum(x * x for x in dc.values())) / (m2 * m2)
    return len(dc), q


def py_louvain_rounds(sym: set[tuple[int, int]], rounds: int) -> dict[int, int]:
    deg: dict[int, int] = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    m2 = len(sym)
    lab = {v: v for v in deg}
    for _ in range(rounds):
        dc: dict[int, int] = {}
        for v, k in deg.items():
            dc[lab[v]] = dc.get(lab[v], 0) + k
        k2: dict[int, dict[int, int]] = {v: {} for v in deg}
        for s, d in sym:
            c = lab[d]
            k2[s][c] = k2[s].get(c, 0) + 1
        new = {}
        for v in deg:
            cands = dict(k2[v])
            cands.setdefault(lab[v], 0)
            best = None
            for c, kvc in cands.items():
                gain2 = m2 * kvc - deg[v] * (dc[c] - (deg[v] if c == lab[v] else 0))
                key = (-gain2, c)
                if best is None or key < best:
                    best, pick = key, c
            new[v] = pick
        lab = new
    return lab


@pytest.mark.parametrize("name", ["g_tri", "g_two_comp", "g_er_n100", "g_plaw_n1000"])
def test_modularity_matches_python(spark, name):
    g = GRAPHS[name]
    sym = _sym_simple(g.edges)
    sdf = _sym_spark(spark, g.edges)
    # score the singleton labeling (every vertex its own community)
    verts = sorted({s for s, _ in sym})
    labels = spark.createDataFrame([(v, v) for v in verts], "id long, label long")
    n_c, q = py_modularity(sym, {v: v for v in verts})
    row = modularity(sdf, labels).collect()[0]
    assert row["n_communities"] == n_c
    assert row["n_undirected_edges"] == len(sym) // 2
    assert row["modularity_r"] == pytest.approx(round(q, 6), abs=1e-9)


@pytest.mark.parametrize("name,rounds", [("g_tri", 1), ("g_two_comp", 2), ("g_er_n100", 2)])
def test_louvain_move_matches_python(spark, name, rounds):
    g = GRAPHS[name]
    sym = _sym_simple(g.edges)
    sdf = _sym_spark(spark, g.edges)
    expected = py_louvain_rounds(sym, rounds)
    got = {r["id"]: r["label"] for r in louvain_local_move(sdf, rounds=rounds).collect()}
    assert got == expected


def test_louvain_improves_modularity_on_two_cliques(spark):
    """Two 4-cliques joined by one bridge: one move round must find the
    cliques (Q > 0) vs the singleton start (Q < 0)."""
    import pandas as pd

    cl1 = [(a, b) for a in range(4) for b in range(4) if a != b]
    cl2 = [(a + 10, b + 10) for a, b in cl1]
    rows = sorted(set(cl1 + cl2 + [(0, 10), (10, 0)]))
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    sym = set(rows)
    labels1 = louvain_local_move(sdf, rounds=1)
    q1 = modularity(sdf, labels1).collect()[0]["modularity_r"]
    _, q0 = py_modularity(sym, {v: v for v in {s for s, _ in sym}})
    assert q0 < 0 < q1
    # matches the python replica too
    exp = py_louvain_rounds(sym, 1)
    got = {r["id"]: r["label"] for r in labels1.collect()}
    assert got == exp


def test_modularity_perfect_split_is_positive(spark):
    """Disconnected cliques labeled by clique: Q = 1 - sum (dc/m2)^2."""
    import pandas as pd

    cl1 = [(a, b) for a in range(3) for b in range(3) if a != b]
    cl2 = [(a + 5, b + 5) for a, b in cl1]
    rows = sorted(set(cl1 + cl2))
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    labels = spark.createDataFrame(
        [(v, 0) for v in range(3)] + [(v + 5, 1) for v in range(3)], "id long, label long"
    )
    row = modularity(sdf, labels).collect()[0]
    assert row["intra_edges"] == row["n_undirected_edges"] == 6
    assert row["modularity_r"] == pytest.approx(0.5, abs=1e-9)
