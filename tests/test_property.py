"""Property-based tests: random graphs vs the NumPy oracles.

Spark job latency bounds example counts; the fixture-zoo tests cover
breadth, these cover adversarial shapes hypothesis finds (multi-edges,
self-loops, isolated ids, dense clumps).
"""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from fog_spark import oracles
from fog_spark.algorithms import bfs_levels, connected_components, triangle_counts
from fog_spark.algorithms.pagerank import pagerank_fog

N = 12

edge_lists = st.lists(
    st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
    min_size=1,
    max_size=40,
)

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _to_spark(spark, pairs):
    e = np.asarray(pairs, dtype=np.int64)
    from fog_spark.fixtures import Graph, graph_to_spark

    return graph_to_spark(spark, Graph("g_prop", e, N)), e


@SET
@given(pairs=edge_lists)
def test_cc_property(spark, pairs):
    edges, e = _to_spark(spark, pairs)
    vertices = spark.range(N).select("id")
    got = {r["id"]: r["component"] for r in connected_components(edges, vertices).collect()}
    want = oracles.wcc(e, N)
    assert [got[i] for i in range(N)] == want.tolist()


@SET
@given(pairs=edge_lists)
def test_bfs_property(spark, pairs):
    edges, e = _to_spark(spark, pairs)
    vertices = spark.range(N).select("id")
    got = {r["id"]: r["level"] for r in bfs_levels(edges, 0, vertices).collect()}
    want = oracles.bfs(e, N, 0)
    assert [got[i] for i in range(N)] == want.tolist()


@SET
@given(pairs=edge_lists)
def test_pagerank_fog_property(spark, pairs):
    edges, e = _to_spark(spark, pairs)
    vertices = spark.range(N).select("id")
    got = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=4).collect()}
    want = oracles.pagerank_fog(e, N, niters=4)
    assert np.allclose([got[i] for i in range(N)], want, atol=1e-6)


@SET
@given(pairs=edge_lists)
def test_triangles_property(spark, pairs):
    edges, e = _to_spark(spark, pairs)
    vertices = spark.range(N).select("id")
    got = {r["id"]: r["tri_count"] for r in triangle_counts(edges, vertices).collect()}
    per, _ = oracles.triangles(e, N)
    assert [got[i] for i in range(N)] == per.tolist()


@SET
@given(pairs=edge_lists, threshold=st.integers(1, 6), n_salts=st.integers(2, 8))
def test_salted_algorithms_property(spark, pairs, threshold, n_salts):
    """Salted and plain gathers must agree for ANY hub threshold and
    salt count — including thresholds low enough that every dst is a
    'hub' — on adversarial graphs (multi-edges, self-loops, clumps)."""
    edges, e = _to_spark(spark, pairs)
    vertices = spark.range(N).select("id")
    plain_cc = {r["id"]: r["component"] for r in connected_components(edges, vertices, hub_threshold=None).collect()}
    salted_cc = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices, hub_threshold=threshold, n_salts=n_salts).collect()
    }
    assert salted_cc == plain_cc
    plain_pr = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=3, hub_threshold=None).collect()}
    salted_pr = {
        r["id"]: r["rank"]
        for r in pagerank_fog(edges, vertices, niters=3, hub_threshold=threshold, n_salts=n_salts).collect()
    }
    assert np.allclose([salted_pr[i] for i in range(N)], [plain_pr[i] for i in range(N)], rtol=1e-9)
