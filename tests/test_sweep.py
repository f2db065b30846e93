"""PPR sweep cut vs an inline conductance replay."""

from fog_spark.algorithms.pagerank import pagerank_personalized
from fog_spark.algorithms.sweep import sweep_cut


def _py_sweep(score_order, und, topk):
    """score_order: ids high-to-low; returns [(k, id, phi)]."""
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    two_m = 2 * len(und)
    out, prefix, vol, cut = [], set(), 0, 0
    for k, v in enumerate(score_order[:topk], start=1):
        e_in = sum(1 for a, b in und if (a == v and b in prefix) or (b == v and a in prefix))
        vol += deg[v]
        cut += deg[v] - 2 * e_in
        prefix.add(v)
        out.append((k, v, round(cut / min(vol, two_m - vol), 6)))
    return out


def test_sweep_cut_two_communities(spark):
    # two cliques joined by one bridge: the min-phi prefix is one clique
    left = [(a, b) for a in range(6) for b in range(6) if a < b]
    right = [(a, b) for a in range(6, 12) for b in range(6, 12) if a < b]
    und = left + right + [(5, 6)]
    pairs = und + [(b, a) for a, b in und]  # symmetric directed input
    df = spark.createDataFrame(sorted(pairs), ["src", "dst"])
    seed = spark.createDataFrame([(0,)], ["id"])
    ranks, _ = pagerank_personalized(df, seed, tol=0.0, max_iters=3)

    got = [(r["k"], r["id"], r["phi_r"]) for r in sweep_cut(ranks, df, topk=8).orderBy("k").collect()]

    rdict = {r["id"]: r["rank"] for r in ranks.collect()}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda v: (-round(rdict[v] / deg[v], 9), v))
    assert got == _py_sweep(order, und, 8)
    # the curve's minimum is the seed-side clique, all 6 members
    best_k = min(got, key=lambda t: (t[2], t[0]))[0]
    assert best_k == 6
    assert {g[1] for g in got[:6]} == set(range(6))
