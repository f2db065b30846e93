"""Greedy matching vs a pure-Python replay with identical priorities."""

import hashlib

import pandas as pd

from fog_spark.algorithms.matching import greedy_matching


def epri(a, b, salt=5):
    lo, hi = (a, b) if a <= b else (b, a)
    return (hashlib.md5(f"mat{salt}:{lo}~{hi}".encode()).hexdigest()
            + "-" + str(lo).zfill(12) + "~" + str(hi).zfill(12))


def py_matching(E, salt=5, max_rounds=None):
    alive = {tuple(sorted(e)) for e in E if e[0] != e[1]}
    out = {}
    t = 0
    while alive:
        t += 1
        vmin = {}
        for a, b in alive:
            p = epri(a, b, salt)
            for v in (a, b):
                if v not in vmin or p < vmin[v]:
                    vmin[v] = p
        win = {(a, b) for a, b in alive
               if epri(a, b, salt) == vmin[a] == vmin[b]}
        matched = {v for e in win for v in e}
        for e in win:
            out[e] = t
        alive = {(a, b) for a, b in alive
                 if (a, b) not in win and a not in matched and b not in matched}
        if max_rounds is not None and t >= max_rounds:
            break
    return out


def _run(spark, E, **kw):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    res = greedy_matching(df, **kw)
    return {(r["a"], r["b"]): r["round"] for r in res.collect()}


def test_matching_matches_python_replay(spark):
    import random

    rng = random.Random(31)
    E = list({(rng.randrange(40), rng.randrange(40)) for _ in range(170)})
    E = [(a, b) for a, b in E if a != b]
    assert _run(spark, E, salt=5) == py_matching(E, salt=5)


def test_matching_is_valid_and_maximal(spark):
    import random

    rng = random.Random(41)
    E = list({(rng.randrange(60), rng.randrange(60)) for _ in range(320)})
    E = [(a, b) for a, b in E if a != b]
    got = _run(spark, E, salt=7)
    touched = [v for e in got for v in e]
    assert len(touched) == len(set(touched))  # a matching: no vertex twice
    # maximal: every edge has a matched endpoint
    matched = set(touched)
    assert all(a in matched or b in matched for a, b in E)


def test_matching_fixed_rounds_prefix(spark):
    E = [(i, i + 1) for i in range(40)]
    full = py_matching(E, salt=5)
    got = _run(spark, E, salt=5, max_rounds=1)
    exp = {e: t for e, t in full.items() if t <= 1}
    assert got == exp


def test_vertex_cover_covers_every_edge(spark):
    import random

    from fog_spark.algorithms.matching import vertex_cover

    rng = random.Random(77)
    E = list({(rng.randrange(50), rng.randrange(50)) for _ in range(220)})
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    cover = {r["id"] for r in vertex_cover(df, salt=5).collect()}
    for a, b in E:
        if a != b:
            assert a in cover or b in cover, (a, b)
    # 2-approximation: endpoints of a matching M -> |cover| = 2|M|,
    # and any cover needs >= |M| vertices, so |cover| <= 2 * OPT.
    m = py_matching(E, salt=5)
    assert len(cover) == 2 * len(m)
