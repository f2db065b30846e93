"""spark-submit driver for the --py-files deploy smoke.

Launched as

    spark-submit --master local-cluster[2,2,1536] \
        --py-files fog_spark.zip tools/pyfiles_smoke_driver.py

from a directory that does NOT contain the repo, so the fog_spark
import can only be satisfied by the shipped zip — the north_rule's
exact deploy shape (spark-submit --py-files on a multi-executor
cluster). Runs pagerank_fog on an inline graph across two real
executor JVMs and checks the numpy oracle. Prints PYFILES-PASS on
success.
"""

from __future__ import annotations

import sys


def main() -> int:
    import numpy as np
    from pyspark.sql import SparkSession

    import fog_spark
    from fog_spark import oracles
    from fog_spark.algorithms.pagerank import pagerank_fog

    if "fog_spark.zip" not in (fog_spark.__file__ or ""):
        print(f"FAIL: fog_spark imported from {fog_spark.__file__}, not the zip")
        return 1

    spark = SparkSession.builder.getOrCreate()
    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [(i, (i + 1) % 40) for i in range(40)]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(sorted(set(edges)), ["src", "dst"])
    got = {r["id"]: r["rank"] for r in pagerank_fog(df, niters=5).collect()}
    expected = oracles.pagerank_fog(np.array(sorted(set(edges))), 40, niters=5)
    ids = sorted(got)
    ok = np.allclose([got[i] for i in ids], expected[ids], atol=1e-9)
    n_execs = spark.sparkContext.defaultParallelism
    print(f"executors parallelism={n_execs} vertices={len(ids)}")
    spark.stop()
    if not ok:
        print("FAIL: pagerank mismatch vs numpy oracle")
        return 1
    print("PYFILES-PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
