"""Temporal joins over event streams: as-of (point-in-time) join.

The reference engine is graph-only; training-data pipelines over event
logs need the point-in-time lookup ("the latest right row at or before
this left row's timestamp, per key") that plain equi-joins cannot
express and a range cross-join cannot afford.

Spark has no ASOF JOIN operator, so this is the classic union+window
formulation — (a) of the custom-operator ladder: a composition of
existing DataFrame ops, no UDF:

    tag left side=1, right side=0
    union on (key, ts, side, payload)
    matched = last(payload, ignoreNulls) OVER (
        PARTITION BY key ORDER BY ts, side
        ROWS UNBOUNDED PRECEDING .. CURRENT ROW)
    keep side=1 rows

Cost: ONE hash shuffle on the key (the window exchange) over
|left| + |right| rows — at 100 TB this is the same shape as any keyed
aggregation; no per-key quadratic work, no driver involvement. Right
rows sort BEFORE left rows at equal timestamps, so the match is
inclusive (right_ts <= left_ts), matching DuckDB's ASOF `>=` semantics
(the correctness oracle for the driver query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``right_ts`` <= ``left_ts`` sharing the ``on`` key(s)
    (NULLs when none). Right payload columns are suffixed; the matched
    right timestamp is exposed as ``<right_ts><suffix>``.

    ``tolerance_s``: maximum allowed staleness in seconds — a match
    older than ``left_ts - tolerance_s`` is nulled out (pandas
    merge_asof semantics).

    Ambiguity note: if the right side has several rows at the SAME
    (key, ts) the winner is tie-broken arbitrarily — pre-aggregate the
    right side to unique (key, ts) when determinism matters.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]

    payload = F.struct(
        F.col(right_ts).alias("__ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__evt_ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(  # noqa: E741
        *keys,
        F.col(left_ts).alias("__evt_ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__evt_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__payload", ignorenulls=True).over(w)
    out = r.unionByName(l).withColumn("__m", matched).where(F.col("__side") == 1)
    if tolerance_s is not None:
        fresh = F.col("__m.__ts").cast("double") >= (
            F.col("__evt_ts").cast("double") - F.lit(float(tolerance_s))
        )
        out = out.withColumn("__m", F.when(fresh, F.col("__m")))
    return out.select(
        *keys,
        *[F.col(c) for c in left.columns if c not in keys],
        F.col("__m.__ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
