"""Luby MIS vs a pure-Python replay with identical md5 priorities."""

import hashlib

import pandas as pd

from fog_spark.algorithms.mis import maximal_independent_set


def pri(v, salt=5):
    return hashlib.md5(f"mis{salt}:{v}".encode()).hexdigest() + "-" + str(v).zfill(12)


def py_mis(E, salt=5, max_rounds=None):
    adj = {}
    for a, b in E:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(adj)
    out = {}
    t = 0
    while alive:
        t += 1
        win = {v for v in alive if all(pri(v, salt) < pri(u, salt) for u in adj[v] & alive)}
        doomed = {u for w in win for u in adj[w] & alive} - win
        for w in win:
            out[w] = (1, t)
        for u in doomed:
            out[u] = (0, t)
        alive -= win | doomed
        if max_rounds is not None and t >= max_rounds:
            for v in alive:
                out[v] = (0, t + 1)
            break
    return out


def _run(spark, E, **kw):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    res = maximal_independent_set(df, **kw)
    return {r["id"]: (r["in_mis"], r["round"]) for r in res.collect()}


def test_mis_matches_python_replay(spark):
    import random

    rng = random.Random(11)
    E = list({(rng.randrange(40), rng.randrange(40)) for _ in range(160)})
    E = [(a, b) for a, b in E if a != b]
    got = _run(spark, E, salt=5)
    assert got == py_mis(E, salt=5)


def test_mis_is_independent_and_maximal(spark):
    import random

    rng = random.Random(23)
    E = list({(rng.randrange(60), rng.randrange(60)) for _ in range(300)})
    E = [(a, b) for a, b in E if a != b]
    got = _run(spark, E, salt=7)
    mis = {v for v, (m, _) in got.items() if m}
    adj = {}
    for a, b in E:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # independent: no edge inside the MIS
    assert not any(u in mis and v in mis for u in adj for v in adj[u])
    # maximal: every non-member has a MIS neighbor
    assert all(adj[v] & mis for v in adj if v not in mis)


def test_mis_fixed_rounds_survivors(spark):
    # a long path peels slowly; cap rounds and check the survivor marker
    E = [(i, i + 1) for i in range(50)]
    got = _run(spark, E, salt=5, max_rounds=1)
    exp = py_mis(E, salt=5, max_rounds=1)
    assert got == exp
    assert any(r == 2 and m == 0 for m, r in got.values())
