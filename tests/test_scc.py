"""SCC vs the Tarjan oracle."""

import numpy as np
import pytest

from fog_spark import oracles
from fog_spark.algorithms.scc import strongly_connected_components
from fog_spark.fixtures import Graph, graph_to_spark, make_er_graph, named_graphs, _g

GRAPHS = named_graphs()
GRAPHS["g_scc_mixed"] = _g(
    "g_scc_mixed",
    # two directed cycles bridged by a one-way edge + a tail
    [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (5, 6)],
)


def _col(df, n):
    rows = {r["id"]: r["component"] for r in df.collect()}
    return [rows.get(i) for i in range(n)]


@pytest.mark.parametrize("name", ["g_line", "g_cycle", "g_two_comp", "g_dag", "g_scc_mixed", "g_selfloop"])
def test_scc_exact(spark, name):
    g = GRAPHS[name]
    expected = oracles.scc(g.edges, g.n)
    vertices = spark.range(g.n).select("id")
    got = _col(strongly_connected_components(graph_to_spark(spark, g), vertices), g.n)
    assert got == expected.tolist()


def test_scc_er_graph(spark):
    g = make_er_graph(n=60, p=0.06, seed=11)
    expected = oracles.scc(g.edges, g.n)
    vertices = spark.range(g.n).select("id")
    got = _col(strongly_connected_components(graph_to_spark(spark, g), vertices), g.n)
    assert got == expected.tolist()


def test_scc_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    vertices = spark.range(3).select("id")
    got = {r["id"]: r["component"] for r in strongly_connected_components(empty, vertices).collect()}
    assert got == {0: 0, 1: 1, 2: 2}
