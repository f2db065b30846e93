"""Minimum spanning forest (Borůvka) vs the Kruskal oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fog_spark.algorithms.msf import minimum_spanning_forest
from fog_spark.engine.checkpoint import RunContext
from fog_spark.fixtures import graph_to_spark, named_graphs
from fog_spark.oracles import msf_kruskal

GRAPHS = named_graphs()


def _spark_msf(spark, g, **kw):
    return {
        (r["a"], r["b"], r["w"])
        for r in minimum_spanning_forest(graph_to_spark(spark, g), **kw).collect()
    }


@pytest.mark.parametrize(
    "name",
    ["g_line", "g_cycle", "g_selfloop", "g_two_comp", "g_dag", "g_star_in",
     "g_tri", "g_er_n100", "g_plaw_n1000"],
)
def test_msf_matches_kruskal(spark, name):
    g = GRAPHS[name]
    expected = msf_kruskal(g.edges, g.weights())
    got = _spark_msf(spark, g)
    assert got == expected


def test_msf_long_chain_needs_log_rounds_not_diameter(spark):
    """A path with monotone weights makes every vertex's pick point the
    same way — the pointer graph is ONE chain of length |V|. Pointer
    jumping must still contract it (hash-min would need |V| rounds;
    Borůvka itself converges in one pick round here since all picks
    chain into one component)."""
    import pandas as pd

    n = 64
    rows = [(i, i + 1, float(i + 1)) for i in range(n - 1)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    e = np.array([[r[0], r[1]] for r in rows])
    w = np.array([r[2] for r in rows])
    got = {
        (r["a"], r["b"], r["w"])
        for r in minimum_spanning_forest(edges).collect()
    }
    assert got == msf_kruskal(e, w)  # the whole path IS the MSF


def test_msf_bridge_between_mutual_pairs(spark):
    """Regression for the min-partner contraction bug: two mutually
    picking pairs joined by a bridge edge that NEITHER endpoint of
    which has as its own pick would lose the bridge under a
    min-partner-over-all-picked-edges pointer graph. Weights force:
    (1,10) and (2,9) as mutual picks, bridge (9,10) picked by nobody in
    round 1, then picked in round 2."""
    import pandas as pd

    rows = [(1, 10, 1.0), (2, 9, 1.0), (9, 10, 5.0)]
    edges = spark.createDataFrame(pd.DataFrame(rows, columns=["src", "dst", "weight"]))
    got = {
        (r["a"], r["b"], r["w"])
        for r in minimum_spanning_forest(edges).collect()
    }
    e = np.array([[r[0], r[1]] for r in rows])
    w = np.array([r[2] for r in rows])
    assert got == msf_kruskal(e, w) == {(1, 10, 1.0), (2, 9, 1.0), (9, 10, 5.0)}


def test_msf_fixed_rounds_converged_is_noop(spark):
    g = GRAPHS["g_er_n100"]
    expected = msf_kruskal(g.edges, g.weights())
    assert _spark_msf(spark, g, rounds=12) == expected  # >= convergence count


def test_msf_resume_returns_full_forest(spark, tmp_path):
    """Kill after round 1, resume: the final forest includes the rounds
    committed BEFORE the crash (read back from the run dir)."""
    g = GRAPHS["g_er_n100"]
    clean = _spark_msf(spark, g)
    ctx1 = RunContext(spark, str(tmp_path), "msf1")
    _spark_msf(spark, g, rounds=1, ctx=ctx1)  # "crash" after round 1
    assert ctx1.last_committed()["superstep"] == 1
    ctx2 = RunContext(spark, str(tmp_path), "msf1")
    resumed = _spark_msf(spark, g, ctx=ctx2)
    assert resumed == clean == msf_kruskal(g.edges, g.weights())
