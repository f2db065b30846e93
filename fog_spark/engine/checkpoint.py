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
    def __init__(self, spark: SparkSession, run_dir: str, run_id: str = "run0",
                 collect_lineage: bool = True, keep_last: int | None = None):
        """``keep_last=K`` turns on retention: every commit() vacuums
        snapshots/metrics older than the newest K supersteps (never the
        resume point). ``None`` (default) keeps full history."""
        self.spark = spark
        self.root = f"{run_dir.rstrip('/')}/{run_id}"
        self.run_id = run_id
        self.collect_lineage = collect_lineage
        self.keep_last = keep_last
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

    def state_at(self, step: int, name: str = "state") -> DataFrame | None:
        """The committed snapshot AT a specific superstep, or None when
        its directory is absent (vacuumed, or never written)."""
        if fs.exists(self.spark, self._state_dir(step, name)):
            return self.read_state(step, name=name)
        return None

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
        if self.keep_last is not None:
            self.vacuum(self.keep_last)

    def metrics(self) -> list[dict]:
        # sort by the parsed integer step, not the filename: at
        # step >= 100000 the %05d format widens and 'step=100000' would
        # sort lexicographically BEFORE 'step=99999'
        names = sorted(
            (n for n in fs.list_names(self.spark, self._metrics_dir())
             if n.startswith("step=") and n.endswith(".json")),
            key=lambda n: int(n[5:-5]),
        )
        out = []
        for n in names:
            try:
                out.append(json.loads(fs.read_text(self.spark, f"{self._metrics_dir()}/{n}")))
            except Exception:
                # a damaged record must not brick resume — skip it; the
                # matching state snapshot is simply not resumed into.
                # Broad on purpose: JVM-side read failures (file deleted
                # between list and read, transient object-store error)
                # surface as py4j.protocol.Py4JJavaError, not OSError.
                continue
        return out

    def vacuum(self, keep_last: int = 2, name: str = "state") -> list[int]:
        """Checkpoint retention: delete state snapshots + metric records
        older than the newest ``keep_last`` committed supersteps, so a
        1,000-superstep run stores O(keep_last) snapshots, not 1,000
        (FOG overwrites ONE .attr file in place —
        fogsrc/fog_engine.cpp:245-261 — this is the durable analogue).

        The newest step whose snapshot is actually PRESENT (the resume
        point) is always kept, even when commits newer than it lost
        their snapshots. Returns the vacuumed step numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        steps = [r["superstep"] for r in self.metrics()]
        if not steps:
            return []
        keep = set(steps[-keep_last:])
        for s in reversed(steps):  # protect the resume point
            if fs.exists(self.spark, self._state_dir(s, name)):
                keep.add(s)
                break
        min_keep = min(keep)
        # metric-less snapshots (the step-0 init write, or orphans from a
        # crash between write_state and commit) age out with the window too
        state_steps = {
            int(n[5:])
            for n in fs.list_names(self.spark, f"{self.root}/{name}")
            if n.startswith("step=") and n[5:].isdigit()
        }
        removed = []
        for s in sorted(set(steps) | state_steps):
            if s in keep:
                continue
            if s not in steps and s >= min_keep:
                continue  # metric-less dir at/above the window: possibly in-flight
            fs.delete(self.spark, self._state_dir(s, name))
            fs.delete(self.spark, self._metric_path(s))
            removed.append(s)
        return removed

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
