"""Benchmark decontamination: n-gram overlap of a corpus against a
held-out evaluation set.

The standard training-data hygiene step (GPT-3 appendix C, Gopher §A.8,
Llama 2 §A.6): an evaluation example is "contaminated" if its n-grams
appear in training documents, and vice versa a training document is
flagged when too many of its distinct n-gram shingles occur anywhere in
the benchmark set. This module implements the training-side flagging:

    contamination(d) = |shingles(d) ∩ shingles(benchmark)|
                       / |shingles(d)|

over distinct word n-grams (the same shingle machinery as n-gram
Jaccard dedup, datapipe/dedup.py).

Scale shape: the benchmark shingle set is DISTINCT-reduced first (eval
suites are tiny next to a 100 TB corpus) and joined by shingle string —
a broadcast hash join whenever the benchmark fits, else a keyed shuffle
on the shingle; the corpus side is one explode + distinct + two keyed
aggregations. Nothing is all-pairs: a corpus document never meets
another corpus document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def shingle_frame(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, g): DISTINCT word n-gram shingles per document. Documents
    shorter than n tokens emit no rows (Spark sequence(1, 0) would
    DESCEND — the when-guard keeps both engines at empty)."""
    ts = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    base = docs.select(F.col(id_col).alias("id"), ts.alias("ts"))
    ng = F.when(
        F.size("ts") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("ts", i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select("id", F.explode(ng).alias("g")).distinct()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination against the benchmark shingle set.

    Returns every corpus document as (doc_id, n_unique_shingles,
    n_contaminated, contamination_r, flagged): distinct-shingle count,
    how many of them occur anywhere in ``benchmark``, their ratio
    (round 6; 0.0 for shingle-less docs), and ratio >= ``threshold``.

    ``broadcast_benchmark``: hint the distinct benchmark shingles to
    every executor (the right plan whenever the eval suite is MBs
    against a TB corpus); pass False to fall back to a shuffle join
    when the benchmark itself is corpus-sized.
    """
    doc_sh = shingle_frame(docs, n, id_col, text_col)
    bench_sh = shingle_frame(benchmark, n, id_col, text_col).select("g").distinct()
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)

    hit = doc_sh.join(bench_sh, "g", "left_semi")
    per_doc = doc_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_unique_shingles"))
    hits = hit.groupBy("id").agg(F.count(F.lit(1)).alias("n_contaminated"))

    out = (
        docs.select(F.col(id_col).alias("id"))
        .distinct()
        .join(per_doc, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_unique_shingles", F.lit(0)).alias("n_unique_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.round(
                F.when(
                    F.coalesce("n_unique_shingles", F.lit(0)) > 0,
                    F.coalesce("n_contaminated", F.lit(0))
                    / F.col("n_unique_shingles"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination_r"),
        )
        .withColumn("flagged", F.col("contamination_r") >= F.lit(threshold))
    )
    return out
