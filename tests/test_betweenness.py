"""Sampled betweenness (Brandes pivots) vs a pure-Python Brandes."""

from collections import defaultdict, deque

import numpy as np
import pandas as pd

from fog_spark.algorithms.betweenness import betweenness_sampled


def brandes_deltas(edges, roots, max_depth=None):
    """(v, root) -> (dist, delta) by the textbook algorithm (Brandes
    2001), optionally truncated: vertices at dist == max_depth are not
    expanded (mirrors the engine's k-bounded form)."""
    adj = defaultdict(list)
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
    out = {}
    for s in roots:
        dist, sigma, preds, order = {s: 0}, {s: 1.0}, defaultdict(list), []
        dq = deque([s])
        while dq:
            v = dq.popleft()
            if max_depth is not None and dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
        for v in dist:
            out[(v, s)] = (dist[v], delta[v])
    return out


def _random_edges(n, m, seed):
    rng = np.random.default_rng(seed)
    return [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))]


def _run(spark, edges, roots, **kw):
    pdf = pd.DataFrame(sorted(set((s, d) for s, d in edges if s != d)), columns=["src", "dst"])
    df = betweenness_sampled(spark.createDataFrame(pdf), roots, assume_simple=True, **kw)
    return {(r["id"], r["root"]): (r["dist"], r["delta"]) for r in df.collect()}


def _check(got, want):
    assert set(got) == set(want)
    for k, (dist, delta) in want.items():
        assert got[k][0] == dist, k
        assert abs(got[k][1] - delta) < 1e-9, (k, got[k][1], delta)


def test_betweenness_full_depth_matches_brandes(spark):
    edges = _random_edges(40, 200, seed=3)
    roots = [0, 1, 5]
    _check(_run(spark, edges, roots), brandes_deltas(edges, roots))


def test_betweenness_symmetric_graph(spark):
    base = _random_edges(30, 90, seed=9)
    edges = base + [(d, s) for s, d in base]
    roots = [2, 7]
    _check(_run(spark, edges, roots), brandes_deltas(edges, roots))


def test_betweenness_truncated_depth(spark):
    edges = _random_edges(40, 160, seed=11)
    roots = [0, 3]
    _check(
        _run(spark, edges, roots, max_depth=2),
        brandes_deltas(edges, roots, max_depth=2),
    )


def test_betweenness_path_graph_known_values(spark):
    # 0 -> 1 -> 2 -> 3: delta from root 0 is 2, 1, 0 at vertices 1, 2, 3
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _run(spark, edges, [0])
    assert got[(1, 0)] == (1, 2.0)
    assert got[(2, 0)] == (2, 1.0)
    assert got[(3, 0)] == (3, 0.0)
