"""Structured Streaming front-end: incremental graph + event ingestion.

The reference is batch-only (SURVEY §2.6: no streams/watermarks); this
module is part of the training-data-pipeline surface: link graphs grow
continuously (new commits land), so the edge table and its derived
state must be maintainable incrementally instead of recomputed.

- ``stream_edges``: file-source stream of edge parquet drops
  (micro-batch = one commit batch of newly derived edges).
- ``incremental_degrees``: foreachBatch publishes each micro-batch's
  degree DELTA as its own immutable partition (``batch=<id>/``) via
  atomic rename — O(delta) work per trigger, never a rewrite of the
  accumulated table, and replay-idempotent because a batch directory
  that already exists is skipped. ``read_degrees`` folds base + deltas;
  ``compact_degrees`` periodically rolls deltas into a new base and
  vacuums with a one-compaction-cycle grace window, so in-flight
  readers (eager listing, lazy scan) never lose parts under them.
  This is the parquet-dir stand-in for an Iceberg MERGE INTO /
  snapshot-append table; all path ops go through the Hadoop FS API
  (engine/fs), not local-POSIX ``os`` calls.
- ``incremental_edge_log`` / ``read_edge_log`` / ``compact_edge_log``:
  the same publish/compact machinery over the RAW edges themselves (the
  delta is the batch verbatim, the fold is concatenation), so the graph
  algorithms run directly off the streaming-maintained table — the
  streaming→graph bridge. ``read_edge_log`` feeds ``pagerank_fog`` /
  ``pagerank_standard`` unchanged, and ``pagerank_standard``'s
  ``init_ranks=`` warm start re-converges from the previous fixed point
  after a delta batch instead of from uniform.
- ``stream_event_sessions``: watermarked session_window aggregation over
  the events stream (late data handled by the watermark).
- ``stream_running_user_stats``: applyInPandasWithState custom stateful
  operator (running count/max per user) — the escape hatch for stateful
  logic Spark's built-in operators can't express.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from fog_spark.engine import fs

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


def stream_edges(spark: SparkSession, input_dir: str) -> DataFrame:
    return spark.readStream.schema(EDGE_SCHEMA).parquet(input_dir)


def _part_ids(spark: SparkSession, path: str, prefix: str) -> list[int]:
    return _ids_from(fs.list_names(spark, path), prefix)


def _ids_from(names: list[str], prefix: str) -> list[int]:
    return sorted(int(n.split("=", 1)[1]) for n in names if n.startswith(prefix + "="))


def _current_parts(names: list[str], degrees_path: str) -> list[str]:
    """base + later deltas from ONE directory listing (a single snapshot:
    deriving bases and batches from separate listings races against a
    concurrently publishing stream)."""
    bases = _ids_from(names, "base")
    k = bases[-1] if bases else -1
    return ([f"{degrees_path}/base={k}"] if k >= 0 else []) + [
        f"{degrees_path}/batch={b}" for b in _ids_from(names, "batch") if b > k
    ]


def _incremental(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    delta_fn,
    available_now: bool = True,
):
    """Maintain a derived table durably under a stream of new rows.

    Each micro-batch writes ONLY its own delta (``delta_fn(batch)``),
    published as an immutable ``batch=<id>/`` partition by atomic
    rename:

    - per-trigger cost is O(batch), never O(accumulated table);
    - replays (foreachBatch is at-least-once) are skipped because the
      target partition already exists — no marker files, no swap window
      in which a crash can lose accumulated state;
    - readers (``_read``) fold base + deltas and are never exposed to a
      half-written partition (the temp dir is invisible until the
      rename).
    """
    spark = stream.sparkSession

    def publish_batch(batch: DataFrame, batch_id: int) -> None:
        bdir = f"{path}/batch={batch_id}"
        if fs.exists(spark, bdir):  # at-least-once replay: already applied
            return
        bases = _part_ids(spark, path, "base")
        if bases and batch_id <= bases[-1]:
            # replayed batch already folded into the base by compaction
            # (the base name records the max applied batch id)
            return
        delta = delta_fn(batch)
        tmp = f"{path}/.tmp-batch-{batch_id}"
        fs.delete(spark, tmp)
        delta.write.mode("overwrite").parquet(tmp)
        if not fs.rename(spark, tmp, bdir):
            raise IOError(f"delta publish failed: {tmp} -> {bdir}")

    writer = stream.writeStream.foreachBatch(publish_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_degrees(
    edges_stream: DataFrame, degrees_path: str, checkpoint_dir: str, available_now: bool = True
):
    """Maintain (id, outdeg) durably under a stream of new edges
    (see ``_incremental`` for the publish contract)."""
    return _incremental(
        edges_stream,
        degrees_path,
        checkpoint_dir,
        lambda batch: batch.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).cast("long").alias("outdeg")
        ),
        available_now,
    )


_DEGREES_EMPTY = "id LONG, outdeg LONG"


def _fold_degrees(df: DataFrame) -> DataFrame:
    return df.groupBy("id").agg(F.sum("outdeg").cast("long").alias("outdeg"))


def _fold_parts(spark: SparkSession, parts: list[str], fold_fn, empty_schema: str) -> DataFrame:
    if not parts:
        return spark.createDataFrame([], empty_schema)
    return fold_fn(spark.read.parquet(*parts))


def _read(spark: SparkSession, path: str, fold_fn, empty_schema: str) -> DataFrame:
    return _fold_parts(spark, _current_parts(fs.list_names(spark, path), path), fold_fn, empty_schema)


def read_degrees(spark: SparkSession, degrees_path: str) -> DataFrame:
    """(id, outdeg): current degree table = newest base + later deltas.

    The part list comes from one eager directory listing but the
    returned DataFrame scans lazily, so a reader holds its snapshot
    valid for one full compaction cycle (compact_degrees vacuums only
    parts made dead by the PREVIOUS compaction). A frame kept unscanned
    across MORE than one compaction is out of contract — re-call
    read_degrees instead of caching the lazy frame that long."""
    return _read(spark, degrees_path, _fold_degrees, _DEGREES_EMPTY)


def compact_degrees(spark: SparkSession, degrees_path: str) -> None:
    """Roll published degree deltas into a new base (see ``_compact``)."""
    _compact(spark, degrees_path, _fold_degrees, _DEGREES_EMPTY)


def _compact(spark: SparkSession, path: str, fold_fn, empty_schema: str) -> None:
    """Roll published deltas into a new base partition.

    Crash- and concurrency-safe: the folded part set AND the new base's
    id come from ONE directory listing (a batch published after the
    snapshot is neither folded nor vacuumed — it stays a live delta
    above the new base's watermark); the new ``base=<K>`` lands by
    atomic rename BEFORE anything is deleted, and ``_read``
    ignores deltas ≤ the newest base — so every intermediate state
    reads correctly. Vacuuming is DELAYED one cycle: this call deletes
    only the base/deltas that the PREVIOUS compaction made dead, so an
    in-flight reader (eager listing, lazy scan) keeps a valid snapshot
    for a full compaction period. Run periodically so the read-side
    union stays short.
    """
    names = fs.list_names(spark, path)
    batches = _ids_from(names, "batch")
    if not batches:
        return
    k = batches[-1]
    prior_bases = [b for b in _ids_from(names, "base") if b < k]
    prev = prior_bases[-1] if prior_bases else -1
    base_dir = f"{path}/base={k}"
    if not fs.exists(spark, base_dir):  # re-run after a crash mid-vacuum skips the publish
        agg = _fold_parts(spark, _current_parts(names, path), fold_fn, empty_schema)
        tmp = f"{path}/.tmp-base-{k}"
        fs.delete(spark, tmp)
        agg.write.mode("overwrite").parquet(tmp)
        if not fs.rename(spark, tmp, base_dir):
            raise IOError(f"base publish failed: {tmp}")
    # The grace marker tracks elapsed cycles explicitly, so an IDLE
    # stream (repeated compactions, no new batches) still converges to
    # zero dead parts: a marker for base=k written by a PREVIOUS
    # completed call means one full compaction cycle has passed since
    # base=k became current, and everything it superseded is vacuumable.
    grace_marker = f"{path}/.grace={k}"
    if fs.exists(spark, grace_marker):
        for b in prior_bases:
            fs.delete(spark, f"{path}/base={b}")
        for b in batches:
            if b <= k:
                fs.delete(spark, f"{path}/batch={b}")
    else:
        # one-cycle grace window: keep base=prev and the deltas folded
        # into base=k; drop only what the previous compaction superseded
        for b in prior_bases[:-1]:
            fs.delete(spark, f"{path}/base={b}")
        for b in batches:
            if b <= prev:
                fs.delete(spark, f"{path}/batch={b}")
    for name in fs.list_names(spark, path):  # retire stale markers
        if name.startswith(".grace=") and name != f".grace={k}":
            fs.delete(spark, f"{path}/{name}")
    fs.mkdirs(spark, grace_marker)


_EDGES_EMPTY = "src LONG, dst LONG, weight DOUBLE"


def incremental_edge_log(
    edges_stream: DataFrame, edges_path: str, checkpoint_dir: str, available_now: bool = True
):
    """Maintain the RAW edge table durably under a stream of new edges.

    The delta IS the micro-batch and the fold is concatenation, so the
    accumulated table is exactly the union of all published batches —
    the streaming-maintained input for the batch graph algorithms
    (``read_edge_log`` → ``pagerank_fog`` / ``pagerank_standard`` /
    ``cc`` unchanged). Publish contract as in ``_incremental``.
    """
    return _incremental(
        edges_stream, edges_path, checkpoint_dir, lambda batch: batch, available_now
    )


def read_edge_log(spark: SparkSession, edges_path: str) -> DataFrame:
    """(src, dst, weight): current edge table = newest base + later deltas.

    Same single-snapshot / one-compaction-cycle validity contract as
    ``read_degrees``. The returned frame is a lazy parquet scan of the
    live parts — O(|edges|) only when an algorithm actually runs over
    it, and partition-prunable like any static edge table.
    """
    return _read(spark, edges_path, lambda df: df, _EDGES_EMPTY)


def compact_edge_log(spark: SparkSession, edges_path: str) -> None:
    """Concatenate published edge deltas into a new base (see ``_compact``).

    For the edge log compaction trades many small delta files for one
    well-sized base — the small-files problem, not recomputation, is
    what it solves here.
    """
    _compact(spark, edges_path, lambda df: df, _EDGES_EMPTY)


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
