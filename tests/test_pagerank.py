"""PageRank vs the NumPy oracles, FOG-mode quirks included."""

import numpy as np
import pytest

from fog_spark import oracles
from fog_spark.algorithms.pagerank import pagerank_fog, pagerank_standard
from fog_spark.fixtures import graph_to_spark, named_graphs

GRAPHS = named_graphs()


def _ranks(df, n):
    rows = {r["id"]: r["rank"] for r in df.collect()}
    return np.array([rows[i] for i in range(n)])


@pytest.mark.parametrize("name", ["g_cycle", "g_selfloop", "g_star_in", "g_star_out", "g_dag", "g_er_n100"])
def test_pagerank_fog_matches_oracle(spark, name):
    g = GRAPHS[name]
    expected = oracles.pagerank_fog(g.edges, g.n, niters=10)
    vertices = spark.range(g.n).select("id")
    got = _ranks(pagerank_fog(graph_to_spark(spark, g), vertices, niters=10), g.n)
    assert np.allclose(got, expected, atol=1e-6)


def test_pagerank_fog_csr_kernel_matches_df_kernel(spark):
    g = GRAPHS["g_er_n100"]
    vertices = spark.range(g.n).select("id")
    edges = graph_to_spark(spark, g)
    df_ranks = _ranks(pagerank_fog(edges, vertices, niters=5, kernel="df"), g.n)
    csr_ranks = _ranks(pagerank_fog(edges, vertices, niters=5, kernel="csr"), g.n)
    expected = oracles.pagerank_fog(g.edges, g.n, niters=5)
    assert np.allclose(df_ranks, expected, atol=1e-6)
    assert np.allclose(csr_ranks, expected, atol=1e-6)


def test_pagerank_fog_selfloop_participates(spark):
    """GLOBAL scatter keeps self-loops (fogsrc/cpu_thread.cpp:509-534)."""
    g = GRAPHS["g_selfloop"]
    expected = oracles.pagerank_fog(g.edges, g.n, niters=3)
    vertices = spark.range(g.n).select("id")
    got = _ranks(pagerank_fog(graph_to_spark(spark, g), vertices, niters=3), g.n)
    assert np.allclose(got, expected, atol=1e-6)
    # sanity: the self-loop vertices differ from a version without loops
    no_loops = g.edges[g.edges[:, 0] != g.edges[:, 1]]
    alt = oracles.pagerank_fog(no_loops, g.n, niters=3)
    assert not np.allclose(expected, alt)


def test_pagerank_standard_converges_to_1e6(spark):
    g = GRAPHS["g_er_n100"]
    expected, _ = oracles.pagerank_standard(g.edges, g.n, tol=1e-6)
    vertices = spark.range(g.n).select("id")
    got_df, iters = pagerank_standard(graph_to_spark(spark, g), vertices, tol=1e-6)
    got = _ranks(got_df.withColumnRenamed("rank", "rank"), g.n)
    assert iters < 200
    assert np.allclose(got, expected, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6  # normalized: total mass conserved
