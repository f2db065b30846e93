"""Seeded label spreading vs a python micro-integer replay."""

from fog_spark.algorithms.labelspread import UNIT, label_spreading
from fog_spark.fixtures import make_er_graph, named_graphs


def _py_spread(pairs, seeds, rounds):
    sym = sorted({(s, t) for s, t in pairs if s != t} | {(t, s) for s, t in pairs if s != t})
    adj: dict[int, list[int]] = {}
    for s, t in sym:
        adj.setdefault(s, []).append(t)
    state = {(i, l): UNIT for i, l in seeds.items()}
    for _ in range(rounds):
        nxt: dict[tuple, int] = {}
        for (i, l), m in state.items():
            share = m // len(adj.get(i, [1]))
            for nb in adj.get(i, []):
                nxt[(nb, l)] = nxt.get((nb, l), 0) + share
        nxt = {k: v for k, v in nxt.items() if v > 0 and k[0] not in seeds}
        for i, l in seeds.items():
            nxt[(i, l)] = UNIT
        state = nxt
    best: dict[int, tuple] = {}
    for (i, l), m in state.items():
        cur = best.get(i)
        if cur is None or (-m, l) < (-cur[1], cur[0]):
            best[i] = (l, m)
    return {i: (l, m) for i, (l, m) in best.items()}


def _run(spark, pairs, seeds, rounds=3):
    df = spark.createDataFrame(sorted(pairs), ["src", "dst"])
    sdf = spark.createDataFrame(sorted(seeds.items()), ["id", "label"])
    return {
        r["id"]: (r["label"], r["m"])
        for r in label_spreading(df, sdf, rounds=rounds).collect()
    }


def test_label_spread_er_matches_replay(spark):
    g = make_er_graph(n=40, p=0.07, seed=9)
    pairs = [(int(s), int(t)) for s, t in g.edges if s != t]
    seeds = {0: 100, 7: 200, 13: 300}
    assert _run(spark, pairs, seeds) == _py_spread(pairs, seeds, 3)


def test_label_spread_two_camps(spark):
    # two cliques bridged by one edge: each side adopts its own seed
    left = [(a, b) for a in range(4) for b in range(4) if a < b]
    right = [(a, b) for a in range(5, 9) for b in range(5, 9) if a < b]
    pairs = left + right + [(3, 5)]
    seeds = {0: 1, 8: 2}
    got = _run(spark, pairs, seeds)
    assert got == _py_spread(pairs, seeds, 3)
    assert all(got[v][0] == 1 for v in range(4) if v in got)
    assert all(got[v][0] == 2 for v in range(6, 9) if v in got)


def test_label_spread_seeds_stay_clamped(spark):
    g = named_graphs()["g_cycle"]
    pairs = [(int(s), int(t)) for s, t in g.edges]
    seeds = {0: 42}
    got = _run(spark, pairs, seeds, rounds=5)
    assert got[0] == (42, UNIT)
