"""ANF / HyperBall neighborhood function vs exact python BFS balls."""

from collections import defaultdict, deque

import pandas as pd

from fog_spark.algorithms.anf import neighborhood_function, neighborhood_sketches


def py_ball_sizes(E, radius):
    adj = defaultdict(list)
    verts = set()
    for a, b in E:
        verts.update((a, b))
        if a != b:
            adj[a].append(b)
    out = {}
    for v in verts:
        seen = {v}
        q = deque([(v, 0)])
        while q:
            u, d = q.popleft()
            if d == radius:
                continue
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    q.append((w, d + 1))
        out[v] = len(seen)
    return out


def _run(spark, E, radius, k):
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    rows = neighborhood_function(df, radius=radius, k=k).collect()
    return {r["id"]: (r["n_seen"], r["estimate"]) for r in rows}


def test_exact_when_k_covers_ball(spark):
    # chain 0->1->2->3->4 plus a 3-cycle 10->11->12->10
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    exact = py_ball_sizes(E, 2)
    got = _run(spark, E, radius=2, k=64)
    assert set(got) == set(exact)
    for v, n in exact.items():
        n_seen, est = got[v]
        assert n_seen == n, (v, n_seen, n)
        assert est == float(n), (v, est, n)


def test_estimate_tracks_exact_on_random_graph(spark):
    import random

    rng = random.Random(7)
    n = 120
    E = [(rng.randrange(n), rng.randrange(n)) for _ in range(600)]
    E = [(a, b) for a, b in E if a != b]
    exact = py_ball_sizes(E, 3)
    got = _run(spark, E, radius=3, k=16)
    # KMV rse ~ 1/sqrt(k-2) ~ 27%; allow 3 sigma on balls past the
    # exact regime, require identity below it
    for v, n in exact.items():
        n_seen, est = got[v]
        if n < 16:
            assert n_seen == n and est == float(n), (v, n_seen, est, n)
        else:
            assert n_seen == 16
            assert abs(est - n) / n < 0.8, (v, est, n)


def test_sketch_saturates_at_eccentricity(spark):
    # radius beyond the longest path must not change the sketch
    E = [(0, 1), (1, 2), (2, 3)]
    df = pd.DataFrame(E, columns=["src", "dst"])
    s3 = neighborhood_sketches(spark.createDataFrame(df), radius=3, k=8)
    s5 = neighborhood_sketches(spark.createDataFrame(df), radius=5, k=8)
    a = {r["id"]: list(r["hvs"]) for r in s3.collect()}
    b = {r["id"]: list(r["hvs"]) for r in s5.collect()}
    assert a == b


def test_anf_curve_exact_small_k_and_reaches90(spark):
    from fog_spark.algorithms.anf import anf_curve

    # chain 0->1->2->3->4: ball sizes by r are exact when k > max ball
    E = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    rows = {r["r"]: r for r in anf_curve(df, radius=4, k=64).collect()}
    sizes = py_ball_sizes(E, 0)
    for r in range(5):
        sizes = py_ball_sizes(E, r)
        assert rows[r]["n_micro"] == sum(sizes.values()) * 1_000_000
    # monotone non-decreasing, final r always reaches90
    ns = [rows[r]["n_micro"] for r in range(5)]
    assert ns == sorted(ns)
    assert rows[4]["reaches90"]
    first = min(r for r in range(5) if rows[r]["reaches90"])
    n_final = rows[4]["n_micro"]
    assert rows[first]["n_micro"] * 10 >= n_final * 9
    if first > 0:
        assert rows[first - 1]["n_micro"] * 10 < n_final * 9
