"""CC / BFS / SSSP vs NumPy oracles on the fixture zoo."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fog_spark import oracles
from fog_spark.algorithms import bfs_levels, connected_components, sssp
from fog_spark.fixtures import graph_to_spark, named_graphs

GRAPHS = named_graphs()


def _col(df, key, n, default=None):
    rows = {r["id"]: r[key] for r in df.collect()}
    return [rows.get(i, default) for i in range(n)]


@pytest.mark.parametrize("name", ["g_line", "g_cycle", "g_two_comp", "g_dag", "g_er_n100", "g_plaw_n1000"])
def test_cc_exact(spark, name):
    g = GRAPHS[name]
    expected = oracles.wcc(g.edges, g.n)
    vertices = spark.range(g.n).select("id")
    got = _col(connected_components(graph_to_spark(spark, g), vertices), "component", g.n)
    assert got == expected.tolist()


def test_cc_isolated_vertex_keeps_own_id(spark):
    g = GRAPHS["g_two_comp"]  # vertex 6 is isolated
    vertices = spark.range(g.n).select("id")
    got = _col(connected_components(graph_to_spark(spark, g), vertices), "component", g.n)
    assert got[6] == 6
    assert got[:3] == [0, 0, 0] and got[3:6] == [3, 3, 3]


@pytest.mark.parametrize("name,root", [("g_line", 0), ("g_cycle", 2), ("g_dag", 0), ("g_er_n100", 0), ("g_selfloop", 0)])
def test_bfs_levels(spark, name, root):
    g = GRAPHS[name]
    expected = oracles.bfs(g.edges, g.n, root)
    vertices = spark.range(g.n).select("id")
    got = _col(bfs_levels(graph_to_spark(spark, g), root, vertices), "level", g.n)
    assert got == expected.tolist()


def test_bfs_unreached_sentinel(spark):
    g = GRAPHS["g_two_comp"]
    vertices = spark.range(g.n).select("id")
    got = _col(bfs_levels(graph_to_spark(spark, g), 0, vertices), "level", g.n)
    assert got[3] == oracles.UNREACHED and got[6] == oracles.UNREACHED


@pytest.mark.parametrize("name,src", [("g_line", 0), ("g_dag", 0), ("g_er_n100", 0)])
def test_sssp(spark, name, src):
    g = GRAPHS[name]
    exp_dist, exp_pred = oracles.sssp_fog(g.edges, g.weights(), g.n, src)
    vertices = spark.range(g.n).select("id")
    out = sssp(graph_to_spark(spark, g), src, vertices)
    dist = _col(out, "dist", g.n)
    pred = _col(out, "pred", g.n)
    assert np.allclose(dist, exp_dist, atol=1e-6, equal_nan=False)
    assert pred == exp_pred.tolist()


def test_sssp_unreached(spark):
    g = GRAPHS["g_two_comp"]
    vertices = spark.range(g.n).select("id")
    out = sssp(graph_to_spark(spark, g), 0, vertices)
    rows = {r["id"]: (r["dist"], r["pred"]) for r in out.collect()}
    assert rows[6] == (float("inf"), -1)


def test_multi_source_bfs_matches_per_root_numpy(spark):
    """Sparse multi-source BFS == k independent numpy BFS runs, with
    unreached pairs ABSENT (incl. a root with no out-edges)."""
    from fog_spark.algorithms.msbfs import multi_source_bfs

    g = GRAPHS["g_dag"]
    roots = [0, 2, g.n - 1]
    got = {(r["id"], r["root"]): r["dist"]
           for r in multi_source_bfs(graph_to_spark(spark, g), roots).collect()}
    for root in roots:
        lv = oracles.bfs(g.edges, g.n, root=root)
        for v in range(g.n):
            if lv[v] == oracles.UNREACHED:
                assert (v, root) not in got
            else:
                assert got[(v, root)] == lv[v], (v, root)


def test_multi_source_bfs_resume(spark, tmp_path):
    from fog_spark.algorithms.msbfs import multi_source_bfs
    from fog_spark.engine.checkpoint import RunContext

    g = GRAPHS["g_er_n100"]
    edges = graph_to_spark(spark, g)
    clean = {tuple(r) for r in multi_source_bfs(edges, [0, 5]).collect()}
    ctx1 = RunContext(spark, str(tmp_path), "runM")
    multi_source_bfs(edges, [0, 5], max_iters=1, ctx=ctx1)  # crash after 1 step
    ctx2 = RunContext(spark, str(tmp_path), "runM")
    resumed = {tuple(r) for r in multi_source_bfs(edges, [0, 5], ctx=ctx2).collect()}
    assert resumed == clean
