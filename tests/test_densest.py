"""Densest-subgraph peel vs an exact-Fraction python replay."""

from fractions import Fraction

import pandas as pd

from fog_spark.algorithms.densest import densest_subgraph


def py_peel(E, num, den, max_rounds=None):
    adj = {}
    for a, b in E:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(adj)
    removed, stats = {}, {}
    t = 0
    while alive:
        t += 1
        deg = {v: len(adj[v] & alive) for v in alive}
        sd, nv = sum(deg.values()), len(alive)
        stats[t] = Fraction(sd, 2 * nv)
        doomed = {v for v in alive if den * deg[v] * nv <= (den + num) * sd}
        for v in doomed:
            removed[v] = t
        alive -= doomed
        if max_rounds is not None and t >= max_rounds:
            for v in alive:
                removed[v] = t + 1
            break
    best = max(stats, key=lambda k: (stats[k], -k))
    return removed, best, stats


def _run(spark, E, **kw):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    return densest_subgraph(df, **kw)


def test_peel_matches_python_replay(spark):
    import random

    rng = random.Random(5)
    E = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    E = [(a, b) for a, b in E if a != b]
    res = _run(spark, E, eps_num=3, eps_den=10, max_rounds=3)
    exp, best, stats = py_peel(E, 3, 10, max_rounds=3)
    got = {r["id"]: r["removed_round"] for r in res.rounds.collect()}
    assert got == exp
    assert res.best_round == best
    assert abs(res.best_density - float(stats[best])) < 1e-12


def test_clique_survives_chain(spark):
    # a 6-clique (density 2.5) attached to a long chain (density ~1)
    clique = [(i, j) for i in range(6) for j in range(6) if i < j]
    chain = [(5 + i, 6 + i) for i in range(1, 20)]
    res = _run(spark, clique + chain, eps_num=3, eps_den=10)
    rr = {r["id"]: r["removed_round"] for r in res.rounds.collect()}
    # every clique vertex outlives every chain-only vertex
    last_chain = max(rr[v] for v in range(7, 26))
    first_clique = min(rr[v] for v in range(6))
    assert first_clique > last_chain
    assert res.best_size == 6 and res.best_edges == 15
    assert abs(res.best_density - 2.5) < 1e-12
