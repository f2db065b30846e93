"""Salted-key skew mitigation for hub vertices.

FOG handles stragglers with work stealing (reference:
fogsrc/fog_engine.cpp:560-758, rebalance_sched_tasks :926-1043). In
Spark the residual problem after AQE's skew-join splitting is a single
hub key (the `utils.py` imported by everyone) whose gather lands on one
reducer. The fix is classic two-stage aggregation: fan the hot key out
across ``n_salts`` sub-keys, partially aggregate, then finish.

For the algebraic folds this engine uses (sum/min/max/count — SURVEY
§2.4, all commutative-associative) the re-aggregation function is
mechanical: sum/count -> sum, min -> min, max -> max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    msgs: DataFrame,
    key: str,
    aggs: list[tuple[str, str, str]],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage groupBy(key) for skewed keys.

    aggs: list of (fn, col, alias) with fn in {sum, min, max, count}.
    The salt derives from a hash of ``salt_source`` (default: a random
    spread via monotonically varying partition data is avoided — we hash
    the full row's shuffle-free column) so the stage-1 exchange spreads
    one hot ``key`` over ``n_salts`` reducers.
    """
    salt = F.pmod(F.hash(F.col(salt_source)) if salt_source else F.spark_partition_id(), F.lit(n_salts))
    stage1_aggs: list[Column] = []
    stage2_aggs: list[Column] = []
    for fn, col, alias in aggs:
        if fn == "count":
            stage1_aggs.append(F.count(col).alias(alias))
        else:
            stage1_aggs.append(getattr(F, fn)(col).alias(alias))
        stage2_aggs.append(_REAGG[fn](alias).alias(alias))
    partial = msgs.withColumn("_salt", salt).groupBy(key, "_salt").agg(*stage1_aggs)
    return partial.groupBy(key).agg(*stage2_aggs)


def top_degree_keys(edges: DataFrame, key: str = "dst", threshold: int = 1_000_000) -> DataFrame:
    """Keys whose degree exceeds ``threshold`` — candidates for salting /
    broadcast special-casing at 10^12-edge scale."""
    return edges.groupBy(key).count().filter(F.col("count") > threshold).select(key)
