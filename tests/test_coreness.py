"""h-index coreness iteration vs the Batagelj-Zaversnik peel."""

import heapq
from collections import defaultdict

import numpy as np
import pandas as pd

from fog_spark.algorithms.coreness import coreness


def py_coreness(E):
    adj = defaultdict(set)
    for a, b in E:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    cur = {v: len(adj[v]) for v in adj}
    heap = [(d, v) for v, d in cur.items()]
    heapq.heapify(heap)
    core, removed, k = {}, set(), 0
    while heap:
        d, v = heapq.heappop(heap)
        if v in removed or d != cur[v]:
            continue
        k = max(k, d)
        core[v] = k
        removed.add(v)
        for u in adj[v]:
            if u not in removed:
                cur[u] -= 1
                heapq.heappush(heap, (cur[u], u))
    return core


def _run(spark, E, **kw):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    return {r["id"]: r["coreness"] for r in coreness(df, **kw).collect()}


def test_coreness_clique_with_tail(spark):
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    E = k5 + [(0, 10), (10, 11), (11, 12)]
    got = _run(spark, E)
    assert got == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4, 10: 1, 11: 1, 12: 1}


def test_coreness_random_graphs_match_peel(spark):
    for seed in (3, 29):
        rng = np.random.default_rng(seed)
        E = [(int(a), int(b)) for a, b in rng.integers(0, 40, size=(200, 2)) if a != b]
        assert _run(spark, E) == py_coreness(E), seed


def test_coreness_fixed_rounds_upper_bounds_and_resume(spark, tmp_path):
    from fog_spark.engine.checkpoint import RunContext

    rng = np.random.default_rng(7)
    E = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(140, 2)) if a != b]
    exact = py_coreness(E)
    r1 = _run(spark, E, rounds=1)
    assert all(r1[v] >= exact[v] for v in exact)  # monotone decrease from degree
    ctx = RunContext(spark, str(tmp_path), "cn", collect_lineage=False)
    _run(spark, E, rounds=2, ctx=ctx)
    ctx2 = RunContext(spark, str(tmp_path), "cn", collect_lineage=False)
    assert _run(spark, E, ctx=ctx2) == exact  # resumes round 2, converges
