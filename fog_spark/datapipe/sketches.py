"""Approximate-distinct sketches for link-graph reach queries.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but
its register layout is engine-specific — no external oracle can
reproduce its estimates, and two engines disagree in the last digits.
For a *driver-checkable* sketch this module implements KMV (K-Minimum-
Values / bottom-k, Bar-Yossef et al. 2002 — the theta-sketch family):

    hash every distinct value to a uniform 52-bit integer; keep the k
    smallest per group; if the k-th smallest normalized hash is R, the
    unbiased distinct estimate is (k-1)/R. Groups with at most k
    distinct values report their EXACT count.

The hash is md5-based (first 13 hex chars = 52 bits, exactly
representable in a double), so the estimate is a deterministic
function of the value set — DuckDB replays it bit-for-bit (see
queries.SQL_KMV_REACH).

Scale shape: one distinct + one per-group window shuffle — the same
cost envelope as any grouped top-k. The sketch is MERGEABLE (union two
groups' hash sets, keep the k smallest), so at 100 TB the same
construction runs as a partial-aggregate tree; this implementation
expresses it as a window because Spark's row_number already does the
per-group bottom-k with map-side partial sort.

Accuracy: relative standard error ~ 1/sqrt(k-2) (k=64 -> ~12.7%),
pytest-verified on random multisets against the exact count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_KMV_BITS = 52  # 13 hex chars; 2^52 fits a double exactly


def _kmv_hash(col) -> "F.Column":
    """Uniform integer in [1, 2^52]: md5 hex prefix folded to an int,
    +1 so the normalized value is in (0, 1] (R = 0 would divide by
    zero). Cross-engine: Spark conv() == DuckDB strpos digit-fold."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("long") + 1


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., n_seen, estimate): approximate distinct
    ``value_col`` count per group via the bottom-k sketch.

    ``n_seen`` = min(k, true distinct count) — the sketch size kept;
    ``estimate`` = exact count when the group holds <= k distinct
    values, else (k-1) / (kth smallest hash / 2^52).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    d = df.select(*groups, value_col).distinct()
    hashed = d.withColumn("hv", _kmv_hash(F.col(value_col)))
    w = Window.partitionBy(*groups).orderBy("hv")
    ranked = (
        hashed.withColumn("r", F.row_number().over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(Window.partitionBy(*groups)))
        .where(F.col("r") == F.least(F.col("n_distinct"), F.lit(k)))
    )
    est = F.when(
        F.col("n_distinct") <= k, F.col("n_distinct").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("hv") / F.lit(float(2 ** _KMV_BITS))))
    return ranked.select(
        *groups,
        F.least(F.col("n_distinct"), F.lit(k)).alias("n_seen"),
        est.alias("estimate"),
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """(group_cols..., hvs): the raw bottom-k sketch per group — the k
    smallest value hashes, ascending. This is the MERGEABLE form: the
    bottom-k of a union equals the bottom-k of the concatenated
    per-part bottom-k sets, so sketches roll up through any partial-
    aggregation tree (see ``kmv_union_estimate``)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    d = df.select(*groups, value_col).distinct()
    hashed = d.withColumn("hv", _kmv_hash(F.col(value_col)))
    w = Window.partitionBy(*groups).orderBy("hv")
    return (
        hashed.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k)
        .groupBy(*groups)
        .agg(F.sort_array(F.collect_list("hv")).alias("hvs"))
    )


def kmv_union_estimate(
    sketches: DataFrame,
    k: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Merge bottom-k sketches and estimate the distinct count of the
    UNION of their underlying sets — without revisiting the data.

    ``by=None`` merges every input row into one global estimate;
    otherwise one merged estimate per ``by`` group (roll-up). Merge =
    explode + distinct hv (equal values hash equally across sketches)
    + bottom-k again; estimate rule identical to ``kmv_distinct``.
    """
    groups = list(by) if by else []
    ex = sketches.select(*groups, F.explode("hvs").alias("hv")).distinct()
    w = Window.partitionBy(*groups).orderBy("hv") if groups else Window.orderBy("hv")
    ranked = (
        ex.withColumn("r", F.row_number().over(w))
        .withColumn("n_distinct", F.count(F.lit(1)).over(
            Window.partitionBy(*groups) if groups else Window.partitionBy()))
        .where(F.col("r") == F.least(F.col("n_distinct"), F.lit(k)))
    )
    est = F.when(
        F.col("n_distinct") <= k, F.col("n_distinct").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.col("hv") / F.lit(float(2 ** _KMV_BITS))))
    return ranked.select(
        *groups,
        F.least(F.col("n_distinct"), F.lit(k)).alias("n_seen"),
        est.alias("estimate"),
    )
