"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship: FOG-mode PageRank over the part co-occurrence
                  link graph at sf0.001, top-100 by id (mirrors the
                  reference's finalize print, application/pagerank.hpp:121-128).
queries()       — one entry per implemented operator (SURVEY.md §2 +
                  training-pipeline ops); see fog_spark/queries.py.
oracle_sql()    — matching DuckDB-runnable ANSI SQL per query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fog_spark.queries import ORACLES, QUERIES, cooccur_edges  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fog_spark.algorithms.pagerank import pagerank_fog

    edges = cooccur_edges(spark, SF_SMOKE)
    ranks = pagerank_fog(edges, niters=10)
    return ranks.orderBy("id").limit(100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
