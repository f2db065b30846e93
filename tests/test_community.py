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


# ---------------------------------------------------------------------------
# full Louvain: weighted moves + contraction (louvain_levels)
# ---------------------------------------------------------------------------

from fog_spark.algorithms.community import (  # noqa: E402
    contract_graph,
    louvain_levels,
    louvain_local_move_weighted,
)


def py_louvain_rounds_w(wedges: dict, rounds: int, alternate: bool = False) -> dict:
    """Replay of the weighted synchronous move loop. ``wedges``:
    {(src, dst): w} with both orientations; self-loops allowed."""
    deg: dict[int, int] = {}
    for (s, _), w in wedges.items():
        deg[s] = deg.get(s, 0) + w
    m2 = sum(wedges.values())
    lab = {v: v for v in deg}
    for rr in range(1, rounds + 1):
        dc: dict[int, int] = {}
        for v, k in deg.items():
            dc[lab[v]] = dc.get(lab[v], 0) + k
        k2: dict[int, dict[int, int]] = {v: {} for v in deg}
        for (s, d), w in wedges.items():
            if s == d:
                continue
            c = lab[d]
            k2[s][c] = k2[s].get(c, 0) + w
        new = {}
        for v in deg:
            cands = dict(k2[v])
            cands.setdefault(lab[v], 0)
            if alternate:
                cands = {
                    c: kvc
                    for c, kvc in cands.items()
                    if c == lab[v] or (c <= lab[v] if rr % 2 == 1 else c >= lab[v])
                }
            best = None
            for c, kvc in cands.items():
                gain2 = m2 * kvc - deg[v] * (dc[c] - (deg[v] if c == lab[v] else 0))
                key = (-gain2, c)
                if best is None or key < best:
                    best, pick = key, c
            new[v] = pick
        lab = new
    return lab


def py_contract(wedges: dict, lab: dict) -> dict:
    out: dict[tuple[int, int], int] = {}
    for (s, d), w in wedges.items():
        k = (lab[s], lab[d])
        out[k] = out.get(k, 0) + w
    return out


def py_louvain_levels(sym: set, move_rounds: int, levels: int) -> dict:
    wedges = {e: 1 for e in sym}
    total = None
    for lvl in range(1, levels + 1):
        lab = py_louvain_rounds_w(wedges, move_rounds, alternate=True)
        total = lab if total is None else {v: lab[c] for v, c in total.items()}
        if lvl < levels:
            wedges = py_contract(wedges, lab)
    return total


def _wedges_spark(spark, wedges: dict):
    import pandas as pd

    rows = sorted((s, d, w) for (s, d), w in wedges.items())
    return spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "w"]))


def test_weighted_move_with_self_loops_matches_python(spark):
    """Hand-built super-graph: two heavy self-loop vertices bridged by a
    light edge plus a satellite — the exact shape phase 2 produces."""
    wedges = {
        (0, 0): 12, (1, 1): 6, (0, 1): 2, (1, 0): 2,
        (2, 1): 1, (1, 2): 1, (2, 2): 0 or 0,
    }
    wedges = {k: v for k, v in wedges.items() if v > 0}
    exp = py_louvain_rounds_w(wedges, 2)
    got = {
        r["id"]: r["label"]
        for r in louvain_local_move_weighted(_wedges_spark(spark, wedges), rounds=2).collect()
    }
    assert got == exp


def test_contract_graph_self_loop_is_2x_intra(spark):
    """Two 3-cliques + bridge, perfect labels: each super self-loop
    carries 2x the 3 intra edges; the bridge carries 1 each way."""
    import pandas as pd

    cl1 = [(a, b) for a in range(3) for b in range(3) if a != b]
    cl2 = [(a + 5, b + 5) for a, b in cl1]
    rows = sorted(set(cl1 + cl2 + [(0, 5), (5, 0)]))
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst"]))
    sdf = sdf.withColumn("w", F.lit(1).cast("long"))
    labels = spark.createDataFrame(
        [(v, 0) for v in range(3)] + [(v + 5, 5) for v in range(3)],
        "id long, label long",
    )
    got = {
        (r["src"], r["dst"]): r["w"] for r in contract_graph(sdf, labels).collect()
    }
    assert got == {(0, 0): 6, (5, 5): 6, (0, 5): 1, (5, 0): 1}


@pytest.mark.parametrize("name,mr,lv", [("g_two_comp", 2, 2), ("g_er_n100", 2, 2), ("g_plaw_n1000", 1, 2)])
def test_louvain_levels_matches_python(spark, name, mr, lv):
    g = GRAPHS[name]
    sym = _sym_simple(g.edges)
    exp = py_louvain_levels(sym, mr, lv)
    got = {
        r["id"]: r["label"]
        for r in louvain_levels(_sym_spark(spark, g.edges), move_rounds=mr, levels=lv).collect()
    }
    assert got == exp


def test_louvain_levels_merges_clique_groups(spark):
    """Hierarchy fixture: four 4-cliques; 0-1 and 2-3 tightly bridged
    (3 bridges), 1-2 loosely (1 bridge). Level 1 finds the cliques;
    level 2 must merge within the tight pairs — strictly improving
    modularity over the level-1 labeling."""
    import pandas as pd

    def clique(base):
        return [(a + base, b + base) for a in range(4) for b in range(4) if a != b]

    rows = set(clique(0) + clique(10) + clique(20) + clique(30))
    tight = [(0, 10), (1, 11), (2, 12), (20, 30), (21, 31), (22, 32)]
    loose = [(13, 23)]
    for a, b in tight + loose:
        rows.add((a, b))
        rows.add((b, a))
    sdf = spark.createDataFrame(pd.DataFrame(sorted(rows), columns=["src", "dst"]))
    sym = set(map(tuple, sorted(rows)))

    exp = py_louvain_levels(sym, 2, 2)
    l2 = louvain_levels(sdf, move_rounds=2, levels=2)
    got = {r["id"]: r["label"] for r in l2.collect()}
    assert got == exp

    l1 = louvain_local_move(sdf, rounds=2)
    q1 = modularity(sdf, l1).collect()[0]["modularity_r"]
    q2 = modularity(sdf, l2).collect()[0]["modularity_r"]
    assert len(set(got.values())) < len({r["label"] for r in l1.collect()})
    assert q2 > q1


def test_louvain_levels_one_level_equals_local_move(spark):
    g = GRAPHS["g_two_comp"]
    sdf = _sym_spark(spark, g.edges)
    a = {r["id"]: r["label"] for r in louvain_levels(sdf, move_rounds=2, levels=1).collect()}
    b = {r["id"]: r["label"] for r in louvain_local_move(sdf, rounds=2).collect()}
    assert a == b
