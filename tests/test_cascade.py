"""Independent-cascade influence vs a python md5 replay."""

import hashlib

from fog_spark.algorithms.cascade import HASH_DEN, active_edges, influence_spread
from fog_spark.fixtures import make_er_graph


def _fold8(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_active(pairs, k, p_num):
    return [(s, t) for s, t in pairs if _fold8(f"{s}-{t}-{k}") < p_num]


def _py_reach(pairs, root):
    adj = {}
    for s, t in pairs:
        adj.setdefault(s, []).append(t)
    vis, work = {root}, [root]
    while work:
        v = work.pop()
        for w in adj.get(v, []):
            if w not in vis:
                vis.add(w)
                work.append(w)
    return len(vis)


def test_active_edges_replay(spark):
    g = make_er_graph(n=30, p=0.1, seed=5)
    pairs = sorted({(int(s), int(t)) for s, t in g.edges if s != t})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    p_num = int(0.4 * HASH_DEN)
    for k in range(2):
        got = sorted((r["src"], r["dst"]) for r in active_edges(df, k, p_num).collect())
        assert got == _py_active(pairs, k, p_num)


def test_influence_spread_replay(spark):
    g = make_er_graph(n=30, p=0.1, seed=5)
    pairs = sorted({(int(s), int(t)) for s, t in g.edges if s != t})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    seeds = spark.createDataFrame([(0,), (7,), (29,)], ["root"])
    p_num = int(0.35 * HASH_DEN)
    got = {
        (r["seed"], r["sample"]): r["reach"]
        for r in influence_spread(df, seeds, p_num, samples=2).collect()
    }
    expected = {
        (root, k): _py_reach(_py_active(pairs, k, p_num), root)
        for root in (0, 7, 29)
        for k in range(2)
    }
    assert got == expected


def test_isolated_seed_reaches_itself(spark):
    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["root"])
    rows = influence_spread(df, seeds, p_num=HASH_DEN, samples=1).collect()
    assert [(r["seed"], r["sample"], r["reach"]) for r in rows] == [(99, 0, 1)]


def test_percolation_curve_replay(spark):
    from fog_spark.algorithms.cascade import percolation_curve

    g = make_er_graph(n=40, p=0.06, seed=12)
    pairs = sorted({(int(s), int(t)) for s, t in g.edges if s != t})
    df = spark.createDataFrame(pairs, ["src", "dst"])
    p_nums = [int(0.3 * HASH_DEN), int(0.8 * HASH_DEN), HASH_DEN]
    got = {
        r["p_num"]: (r["n_edges"], r["n_components"], r["max_component"])
        for r in percolation_curve(df, p_nums).collect()
    }
    expected = {}
    for p in p_nums:
        act = _py_active(pairs, 0, p)
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in act:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        sizes = {}
        for v in parent:
            sizes[find(v)] = sizes.get(find(v), 0) + 1
        expected[p] = (
            len(act),
            len(sizes) if act else 0,
            max(sizes.values()) if act else 0,
        )
    assert got == expected
    # monotone: keeping more edges never shrinks the giant component
    mx = [got[p][2] for p in p_nums]
    assert mx == sorted(mx)


def test_influence_spread_dedups_duplicate_seeds(spark):
    """ADVICE r5: duplicate seed ids (e.g. CLI --seeds 3,3) must not
    inflate reach or emit duplicate (seed, sample) rows."""
    import pandas as pd

    from fog_spark.algorithms.cascade import influence_spread

    edges = spark.createDataFrame(
        pd.DataFrame([(1, 2), (2, 3)], columns=["src", "dst"]))
    dup = spark.createDataFrame(pd.DataFrame({"root": [1, 1]}))
    uniq = spark.createDataFrame(pd.DataFrame({"root": [1]}))
    got_dup = sorted(map(tuple, influence_spread(edges, dup, p_num=100, samples=2).collect()))
    got_uniq = sorted(map(tuple, influence_spread(edges, uniq, p_num=100, samples=2).collect()))
    assert got_dup == got_uniq
    assert len(got_dup) == 2  # one row per (seed, sample)
