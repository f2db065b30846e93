"""Per-superstep durable checkpoints with partition lineage + metrics.

FOG writes vertex state back to the ``.attr`` file at the end of a run
(reference: fogsrc/fog_engine.cpp:245-261) and cannot survive a crash
mid-iteration. The north_rule upgrades this: every superstep commits

- ``state/step=K/``  — the full vertex-state DataFrame as parquet (one
  file per Spark partition = the "per-partition vertex state");
- ``metrics/step=K.json`` — superstep number, active count,
  convergence delta, wall time, and per-partition lineage (partition id
  → row count) — published by atomic rename only AFTER the parquet
  commit, so a metric file always names a complete snapshot, and a
  crash mid-commit leaves at worst an invisible temp file (never a
  truncated record, which the old append-to-jsonl layout could).

All path operations go through the Hadoop FileSystem API (engine/fs),
so the run directory can live on ``file:/``, ``hdfs://`` or any object
store with an FS connector — not just the driver's local disk.
``resume()`` restores the loop from the last committed superstep whose
state snapshot is actually present. In production the same layout maps
1:1 onto an Iceberg table partitioned by (run_id, superstep) with
snapshot commits; parquet-on-dir is the sandbox stand-in (no Iceberg
runtime jars in this container).
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from fog_spark.engine import fs


class RunContext:
    def __init__(self, spark: SparkSession, run_dir: str, run_id: str = "run0", collect_lineage: bool = True):
        self.spark = spark
        self.root = f"{run_dir.rstrip('/')}/{run_id}"
        self.run_id = run_id
        self.collect_lineage = collect_lineage
        fs.mkdirs(spark, self._metrics_dir())

    # -- state ------------------------------------------------------------

    def _state_dir(self, step: int, name: str) -> str:
        return f"{self.root}/{name}/step={step:05d}"

    def write_state(self, df: DataFrame, step: int, name: str = "state") -> DataFrame:
        """Durably write one superstep's state; return the re-read frame
        (lineage now starts at the parquet scan — the plan is cut).

        Commit protocol: write to a temp dir, atomically rename into
        place. A pre-existing dir for the same step (re-run after
        resume) is renamed aside first and deleted only after the new
        snapshot is live, so no crash window destroys the only copy.
        """
        path = self._state_dir(step, name)
        tmp = path + ".tmp"
        aside = path + ".old"
        fs.delete(self.spark, tmp)
        df.write.mode("overwrite").parquet(tmp)
        fs.delete(self.spark, aside)
        had_old = False
        if fs.exists(self.spark, path):
            had_old = fs.rename(self.spark, path, aside)
            if not had_old:  # FS refused the aside rename: clear the way
                fs.delete(self.spark, path)
        if not fs.rename(self.spark, tmp, path):
            raise IOError(f"checkpoint commit rename failed: {tmp} -> {path}")
        if had_old:
            fs.delete(self.spark, aside)
        return self.spark.read.parquet(path)

    def read_state(self, step: int, name: str = "state") -> DataFrame:
        return self.spark.read.parquet(self._state_dir(step, name))

    # -- metrics / lineage --------------------------------------------------

    def _metrics_dir(self) -> str:
        return f"{self.root}/metrics"

    def _metric_path(self, step: int) -> str:
        return f"{self._metrics_dir()}/step={step:05d}.json"

    def lineage_of(self, df: DataFrame) -> dict[str, int]:
        """partition id -> row count of a (just-materialized) state frame."""
        if not self.collect_lineage:
            return {}
        rows = df.groupBy(F.spark_partition_id().alias("p")).count().collect()
        return {str(r["p"]): r["count"] for r in rows}

    def commit(self, step: int, *, active: int, delta: float | None, wall_s: float, lineage: dict | None = None, **extra) -> None:
        rec = {
            "run_id": self.run_id,
            "superstep": step,
            "active": active,
            "delta": delta,
            "wall_s": round(wall_s, 4),
            "ts": time.time(),
            "lineage": lineage or {},
            **extra,
        }
        path = self._metric_path(step)
        tmp = f"{self._metrics_dir()}/.tmp-{step:05d}.json"
        fs.write_text(self.spark, tmp, json.dumps(rec))
        fs.delete(self.spark, path)
        if not fs.rename(self.spark, tmp, path):
            # a silently dropped metric would make the committed state
            # invisible to resume — fail loudly like write_state does
            raise IOError(f"metric commit rename failed: {tmp} -> {path}")

    def metrics(self) -> list[dict]:
        names = sorted(
            n for n in fs.list_names(self.spark, self._metrics_dir())
            if n.startswith("step=") and n.endswith(".json")
        )
        out = []
        for n in names:
            try:
                out.append(json.loads(fs.read_text(self.spark, f"{self._metrics_dir()}/{n}")))
            except (ValueError, OSError):
                # a damaged record must not brick resume — skip it; the
                # matching state snapshot is simply not resumed into
                continue
        return out

    def last_committed(self) -> dict | None:
        m = self.metrics()
        return m[-1] if m else None

    def resume_point(self, name: str = "state") -> tuple[int, DataFrame] | None:
        """(last committed superstep with a present snapshot, its state),
        or None if fresh. Walks backwards past any commit whose state
        directory is missing.

        Presence test = the directory exists: write_state publishes
        snapshots only by atomic rename of a fully-written temp dir, so
        an existing dir is complete by construction. (Deliberately NOT
        keyed on _SUCCESS: clusters with
        mapreduce.fileoutputcommitter.marksuccessfuljobs=false — common
        on object stores — write no marker, and requiring one would
        silently disable resume there.)"""
        for rec in reversed(self.metrics()):
            step = rec["superstep"]
            if fs.exists(self.spark, self._state_dir(step, name)):
                return step, self.read_state(step, name=name)
        return None
