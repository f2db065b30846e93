"""Sequence packing: concat-and-chunk documents into fixed-size token
context windows — the standard LLM training-data layout step (pack the
tokenized corpus end-to-end, then cut every ``window`` tokens; each
training sequence is a "bin" that may span document boundaries).

The hard part at 100 TB is the global token offset of every document:
a naive ``sum() OVER (ORDER BY doc_id)`` is a single-partition window.
This module computes it as a classic two-pass distributed prefix sum:

1. range-partition the (id, n_tokens) ledger by id and stamp each row
   with its partition id, materialized ONCE so every consumer sees the
   same partitioning;
2. per-partition subtotals — one row per partition — are collected to
   the driver (driver transfer is O(#partitions), never O(|docs|)) and
   turned into per-partition base offsets;
3. a partition-LOCAL cumulative window (partitionBy pid) plus the
   broadcast base gives every document its exact global offset with no
   global sort bottleneck.

Documents then explode onto the [floor(start/W), floor((end-1)/W)]
range of windows they overlap — a document of n tokens emits
ceil-ish n/W segments, so output size is linear in corpus tokens.

The resulting manifest is deterministic (corpus order = doc id order,
tokenizer = the shared [a-z0-9]+ convention from datapipe.dedup) and
exactly replayable by a single-window SQL oracle at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fog_spark.datapipe.dedup import TOKEN_RE
from fog_spark.engine.superstep import materialize


def document_offsets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tok, start): global token offset of each document in
    id-order corpus concatenation. Zero-token documents keep a row
    (n_tok = 0) but occupy no tokens."""
    # NULL text tokenizes like the empty string (size/regexp over NULL
    # would otherwise NULL the partition subtotals and crash the driver
    # cumsum with int(None))
    n_tok = F.size(
        F.regexp_extract_all(F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_RE), 0)
    )
    ledger = docs.select(F.col(id_col).alias("id"), n_tok.cast("long").alias("n_tok"))
    parts = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # one concrete RDD so the subtotal pass and the local-cumsum pass
    # observe the SAME partition stamps
    staged = materialize(
        ledger.repartitionByRange(parts, "id").withColumn(
            "pid", F.spark_partition_id()
        )
    )
    subtotals = sorted(
        staged.groupBy("pid").agg(F.sum("n_tok").alias("tot")).collect(),
        key=lambda r: r["pid"],
    )
    base, acc = [], 0
    for r in subtotals:
        base.append((r["pid"], acc))
        acc += int(r["tot"] or 0)
    base_df = F.broadcast(
        docs.sparkSession.createDataFrame(base or [(0, 0)], ["pid", "base"])
    )
    w = Window.partitionBy("pid").orderBy("id")
    return (
        staged.join(base_df, "pid")
        .select(
            "id",
            "n_tok",
            (F.col("base") + F.sum("n_tok").over(w) - F.col("n_tok")).alias("start"),
        )
    )


def pack_documents(
    docs: DataFrame,
    window: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Packing manifest (bin, doc_id, doc_off, bin_off, len): the
    segment of ``len`` tokens starting at token ``doc_off`` of the
    document lands at offset ``bin_off`` inside context window ``bin``.
    Every window except the last is exactly ``window`` tokens full."""
    offs = document_offsets(docs, id_col, text_col).filter(F.col("n_tok") > 0)
    end = F.col("start") + F.col("n_tok")
    spans = offs.select(
        F.col("id").alias("doc_id"),
        "start",
        end.alias("end"),
        F.explode(
            F.sequence(
                F.expr(f"start div {window}"),
                F.expr(f"(start + n_tok - 1) div {window}"),
            )
        ).alias("bin"),
    )
    seg_start = F.greatest(F.col("start"), F.col("bin") * window)
    seg_end = F.least(F.col("end"), (F.col("bin") + 1) * window)
    return spans.select(
        "bin",
        "doc_id",
        (seg_start - F.col("start")).alias("doc_off"),
        (seg_start - F.col("bin") * window).alias("bin_off"),
        (seg_end - seg_start).alias("len"),
    )
