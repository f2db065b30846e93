"""Structured Streaming front-end: incremental graph + event ingestion.

The reference is batch-only (SURVEY §2.6: no streams/watermarks); this
module is part of the training-data-pipeline surface: link graphs grow
continuously (new commits land), so the edge table and its derived
state must be maintainable incrementally instead of recomputed.

- ``stream_edges``: file-source stream of edge parquet drops
  (micro-batch = one commit batch of newly derived edges).
- ``incremental_degrees``: foreachBatch merge of per-batch degree deltas
  into a durable degree table — the streaming analogue of the engine's
  cached degree side-input. foreachBatch + merge keeps state growth
  O(vertices touched), unlike complete-mode aggregation which rewrites
  the world every trigger.
- ``stream_event_sessions``: watermarked session_window aggregation over
  the events stream (late data handled by the watermark).
- ``stream_running_user_stats``: applyInPandasWithState custom stateful
  operator (running count/max per user) — the escape hatch for stateful
  logic Spark's built-in operators can't express.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def stream_edges(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EDGE_SCHEMA).parquet(input_dir)


def incremental_degrees(
    edges_stream: DataFrame, degrees_path: str, checkpoint_dir: str, available_now: bool = True
):
    """Maintain (id, outdeg) durably under a stream of new edges.

    Each micro-batch computes its degree DELTA and merges it into the
    parquet-backed table (read + full-outer + overwrite; the Iceberg
    deployment swaps this for a MERGE INTO on a partitioned table).
    """
    spark = edges_stream.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        # idempotence: foreachBatch is at-least-once; a marker file inside
        # the table dir (underscore-prefixed: ignored by parquet readers)
        # travels atomically with the os.replace, so a replayed batch
        # after a crash is skipped instead of double-counted.
        marker = os.path.join(degrees_path, "_applied_batch")
        if os.path.exists(marker):
            with open(marker) as f:
                if batch_id <= int(f.read().strip()):
                    return
        delta = batch.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
        if os.path.exists(degrees_path):
            cur = spark.read.parquet(degrees_path)
            merged = (
                cur.select(F.col("id").alias("cid"), "outdeg")
                .join(delta, F.col("cid") == delta["id"], "full_outer")
                .select(
                    F.coalesce("cid", "id").alias("id"),
                    (F.coalesce("outdeg", F.lit(0)) + F.coalesce("d", F.lit(0))).alias("outdeg"),
                )
            )
        else:
            merged = delta.select("id", F.col("d").alias("outdeg"))
        tmp = degrees_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied_batch"), "w") as f:
            f.write(str(batch_id))
        import shutil

        if os.path.exists(degrees_path):
            shutil.rmtree(degrees_path)
        os.replace(tmp, degrees_path)

    writer = edges_stream.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_event_sessions(
    events_stream: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Watermarked session aggregation: (user_id, session_window, n, sum_value)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select("user_id", F.col("w.start").alias("start"), F.col("w.end").alias("end"), "n_events", "sum_value")
    )


_STATE_SCHEMA = "user_id LONG, n LONG, max_value DOUBLE"
_OUT_SCHEMA = "user_id LONG, n LONG, max_value DOUBLE"


def _stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        _, n, mx = state.get
    else:
        n, mx = 0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((user_id, n, mx))
    yield pd.DataFrame({"user_id": [user_id], "n": [n], "max_value": [mx]})


def stream_running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user (count, max value)."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _stats_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
