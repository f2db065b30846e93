"""Multi-JVM smoke: the engine on a REAL two-executor cluster.

Everything else in this sandbox runs local[k] — one JVM, where
broadcast/shuffle serialization bugs can hide (a local reference never
crosses a process boundary). ``local-cluster[2,2,1536]`` launches two
separate executor JVMs with 2 cores each, so the superstep engine's
broadcasts, shuffles, and checkpoint commits all cross real process
boundaries. Plan-shape validation, not timing.

Runs pagerank_fog (vs the numpy oracle), connected_components (vs
union-find), and a checkpoint resume — the three seams most likely to
differ multi-JVM. Exit code 0 + final PASS line on success.

Invoked by tests/test_local_cluster.py in a subprocess (one JVM-owning
SparkContext per python process).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def main() -> int:
    import numpy as np
    from pyspark.sql import SparkSession

    from fog_spark import oracles
    from fog_spark.fixtures import graph_to_spark, named_graphs

    spark = (
        SparkSession.builder.master("local-cluster[2,2,1536]")
        .appName("fogspark-lc-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "2g")
        .config("spark.executor.memory", "1g")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    g = named_graphs()["g_er_n100"]
    edges = graph_to_spark(spark, g)
    vertices = spark.range(g.n).select("id")

    from fog_spark.algorithms.cc import connected_components
    from fog_spark.algorithms.pagerank import pagerank_fog
    from fog_spark.engine.checkpoint import RunContext

    got = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=5).collect()}
    expect = oracles.pagerank_fog(g.edges, g.n, niters=5)
    assert np.allclose([got[i] for i in range(g.n)], expect, atol=1e-6), "pagerank mismatch"
    print("pagerank multi-JVM ok")

    comps = {r["id"]: r["component"] for r in connected_components(edges, vertices).collect()}
    wcc = oracles.wcc(g.edges, g.n)
    assert all(comps[i] == wcc[i] for i in range(g.n)), "cc mismatch"
    print("cc multi-JVM ok")

    run_dir = tempfile.mkdtemp(prefix="lc-ckpt-")
    ctx1 = RunContext(spark, run_dir, "lc")
    pagerank_fog(edges, vertices, niters=2, ctx=ctx1)
    ctx2 = RunContext(spark, run_dir, "lc")
    resumed = {r["id"]: r["rank"] for r in pagerank_fog(edges, vertices, niters=5, ctx=ctx2).collect()}
    assert ctx2.last_committed()["superstep"] == 5
    assert np.allclose([resumed[i] for i in range(g.n)], expect, rtol=1e-12), "resume mismatch"
    print("checkpoint resume multi-JVM ok")

    spark.stop()
    print("LOCAL-CLUSTER SMOKE PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
