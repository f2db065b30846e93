"""Jones-Plassmann coloring vs a pure-Python replay (same priorities)."""

import pandas as pd

from fog_spark.algorithms.coloring import greedy_coloring
from tests.test_mis import pri


def py_coloring(E, salt=5, max_rounds=None):
    adj = {}
    for a, b in E:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(adj)
    color, out = {}, {}
    t = 0
    while alive:
        t += 1
        win = {v for v in alive if all(pri(v, salt) < pri(u, salt) for u in adj[v] & alive)}
        for w in sorted(win):
            forb = {color[u] for u in adj[w] if u in color}
            c = 0
            while c in forb:
                c += 1
            color[w] = c
            out[w] = (c, t)
        alive -= win
        if max_rounds is not None and t >= max_rounds:
            for v in alive:
                out[v] = (-1, t + 1)
            break
    return out


def _run(spark, E, **kw):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    res = greedy_coloring(df, **kw)
    return {r["id"]: (r["color"], r["round"]) for r in res.collect()}


def test_coloring_matches_python_replay(spark):
    import random

    rng = random.Random(17)
    E = list({(rng.randrange(35), rng.randrange(35)) for _ in range(180)})
    E = [(a, b) for a, b in E if a != b]
    got = _run(spark, E, salt=5)
    assert got == py_coloring(E, salt=5)


def test_coloring_is_proper_and_bounded(spark):
    import random

    rng = random.Random(29)
    E = list({(rng.randrange(50), rng.randrange(50)) for _ in range(400)})
    E = [(a, b) for a, b in E if a != b]
    got = _run(spark, E, salt=9)
    adj, deg = {}, {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # proper: no edge joins equal colors; bound: color(v) <= deg(v)
    for v, nbrs in adj.items():
        cv = got[v][0]
        assert cv <= len(nbrs)
        assert all(got[u][0] != cv for u in nbrs)


def test_coloring_fixed_rounds_survivors(spark):
    E = [(i, i + 1) for i in range(60)]
    got = _run(spark, E, salt=5, max_rounds=2)
    exp = py_coloring(E, salt=5, max_rounds=2)
    assert got == exp
    assert any(c == -1 and r == 3 for c, r in got.values())
