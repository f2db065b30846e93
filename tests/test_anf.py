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


def test_bounded_merge_matches_unbounded_and_plan_is_bounded(spark):
    """The live KMV merge must (a) reproduce the flatten/collect_list
    merge bit-for-bit and (b) plan the bounded shape: a Window ranking
    with no collect_list over un-truncated flattened arrays below it —
    the O(deg*k) single-buffer form is the executor-OOM shape on hubs."""
    import pandas as pd

    from pyspark.sql import functions as F

    from fog_spark.algorithms.anf import _bounded_bottom_k_merge, _merged_bottom_k

    # hub fixture: vertex 0 receives 3000 sketches of 4 hashes each
    rows = [(0, [h * 7 + j for j in range(4)]) for h in range(3000)]
    rows += [(1, [5, 6]), (2, [1])]
    df = spark.createDataFrame(pd.DataFrame({"id": [r[0] for r in rows], "hvs": [r[1] for r in rows]}))
    k = 16
    bounded = {r["id"]: r["hvs"] for r in _bounded_bottom_k_merge(df, k).collect()}
    unbounded = {
        r["id"]: r["hvs"]
        for r in df.groupBy("id").agg(_merged_bottom_k(k).alias("hvs")).collect()
    }
    assert bounded == unbounded
    plan = _bounded_bottom_k_merge(df, k)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "flatten" not in plan.lower()


def test_neighborhood_sketches_use_bounded_merge(spark):
    """Usage pin: one ANF round's plan must contain the windowed rank,
    not the flatten/collect_list merge."""
    import pandas as pd

    from fog_spark.algorithms.anf import _bounded_bottom_k_merge, _kmv_hash
    from pyspark.sql import functions as F

    E = [(0, 1), (1, 2), (2, 0)]
    df = spark.createDataFrame(pd.DataFrame(E, columns=["src", "dst"]))
    state = df.select(F.col("src").alias("id"), F.array(_kmv_hash(F.col("src"))).alias("hvs"))
    contrib = df.join(state, df["dst"] == state["id"]).select(df["src"].alias("id"), "hvs")
    merged = _bounded_bottom_k_merge(state.unionByName(contrib), 16)
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "flatten" not in plan.lower()


def test_bounded_merge_keeps_empty_sketch_ids(spark):
    """An id whose every input sketch is empty must survive the merge
    with an empty array (the flatten merge kept it; explode would drop
    it)."""
    import pandas as pd

    from fog_spark.algorithms.anf import _bounded_bottom_k_merge, _merged_bottom_k

    df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 0, 1], "hvs": [[], [], [7, 3]]})
    )
    bounded = {r["id"]: r["hvs"] for r in _bounded_bottom_k_merge(df, 4).collect()}
    unbounded = {
        r["id"]: r["hvs"]
        for r in df.groupBy("id").agg(_merged_bottom_k(4).alias("hvs")).collect()
    }
    assert bounded == unbounded == {0: [], 1: [3, 7]}
