"""Deterministic stratified sampling for corpus rebalancing.

A 100 TB training-data pipeline resamples its corpus per stratum
(language, source, quality band) with DIFFERENT rates — and the sample
must be reproducible across runs, engines and retries, so the "random"
draw is a pure function of the row key: the first 13 hex chars of
``md5(salt:key)`` folded to an integer (52 bits — double-exact, the
same cross-engine fold as datapipe/sketches.py), taken mod 1e6 as a
uniform bucket. A row survives iff its bucket clears its stratum's
rate. No shuffle at all for rate sampling — it is a pure filter the
scan pushes down around; fixed-size-per-stratum sampling adds one
keyed shuffle for the per-stratum hash-order window.

Not in FOG (a graph engine, fogsrc/main.cpp:51-135); sampling is part
of the LLM-data-pipeline extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

BUCKETS = 1_000_000


def hash_bucket(col, salt: int):
    """Uniform bucket in [0, 1e6) from md5(salt:key) — replayable in
    DuckDB via the strpos digit fold (queries._hex_fold_sql)."""
    h = F.md5(F.concat(F.lit(f"smp{salt}:"), col.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 13), 16, 10).cast("long"), F.lit(BUCKETS))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: int = 7,
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    ``rates`` maps stratum value -> keep rate in [0, 1]; strata absent
    from the map keep ``default_rate``. The decision is per-key hash
    thresholding (bucket < rate * 1e6), so the same key always draws
    the same verdict — resumable jobs and A/B engines agree row-for-row.
    """
    expr = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        expr = F.when(F.col(strata_col) == F.lit(k), F.lit(float(v))).otherwise(expr)
    thresh = (expr * BUCKETS).cast("long")
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def mix_weights(
    df: DataFrame,
    strata_col: str = "lang",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """(stratum, n, rate_r, expected_r): per-stratum keep-rates that
    rebalance the corpus toward a target mixture — the knob a training
    run turns to fix language/source imbalance (e.g. the Pile §2.2 /
    ROOTS §3 mixture tables). ``target`` maps stratum -> desired share
    (shares for listed strata; default: uniform over observed strata).

    rate(s) = min(1, share(s) * total / n(s)) — downsample-only (no
    duplication); feed the rates straight into ``stratified_sample``
    for the deterministic hash filter. expected_r = rate * n is the
    resulting stratum size before rounding.

    Scale shape: one groupBy over the corpus + one broadcast of the
    one-row totals frame onto the per-stratum counts — the output is
    |strata| rows, driver-scale by construction.
    """
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total"), F.count("*").alias("n_strata")
    )
    j = counts.crossJoin(F.broadcast(totals))
    if target is None:
        share = F.lit(1.0) / F.col("n_strata")
    else:
        share = F.lit(0.0)
        for k, v in sorted(target.items()):
            share = F.when(
                F.col("stratum") == F.lit(k), F.lit(float(v))
            ).otherwise(share)
    rate = F.least(F.lit(1.0), (share * F.col("total")) / F.col("n"))
    return j.select(
        "stratum",
        "n",
        F.round(rate, 6).alias("rate_r"),
        F.round(rate * F.col("n"), 6).alias("expected_r"),
    )


def stratified_take(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: int = 7,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by hash order
    (deterministic, engine-replayable). One keyed shuffle; the window
    sorts only within each stratum. For heavily skewed strata at the
    100 TB tier, pre-filter with ``stratified_sample`` at a rate that
    overshoots k, then take — the window then sorts a bounded set.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
