"""Per-superstep durable checkpoints with partition lineage + metrics.

FOG writes vertex state back to the ``.attr`` file at the end of a run
(reference: fogsrc/fog_engine.cpp:245-261) and cannot survive a crash
mid-iteration. The north_rule upgrades this: every superstep commits

- ``state/step=K/``  — the full vertex-state DataFrame as parquet (one
  file per Spark partition = the "per-partition vertex state");
- a line in ``metrics.jsonl`` — superstep number, active count,
  convergence delta, wall time, and per-partition lineage (partition id
  → row count) — appended only AFTER the parquet commit, so the last
  line always names a complete, readable snapshot.

``resume()`` restores the loop from the last committed superstep. In
production the same layout maps 1:1 onto an Iceberg table partitioned by
(run_id, superstep) with snapshot commits; parquet-on-dir is the sandbox
stand-in (no Iceberg runtime jars in this container).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class RunContext:
    def __init__(self, spark: SparkSession, run_dir: str, run_id: str = "run0", collect_lineage: bool = True):
        self.spark = spark
        self.root = os.path.join(run_dir, run_id)
        self.run_id = run_id
        self.collect_lineage = collect_lineage
        os.makedirs(self.root, exist_ok=True)
        self._metrics_path = os.path.join(self.root, "metrics.jsonl")

    # -- state ------------------------------------------------------------

    def _state_dir(self, step: int, name: str) -> str:
        return os.path.join(self.root, name, f"step={step:05d}")

    def write_state(self, df: DataFrame, step: int, name: str = "state") -> DataFrame:
        """Durably write one superstep's state; return the re-read frame
        (lineage now starts at the parquet scan — the plan is cut)."""
        path = self._state_dir(step, name)
        tmp = path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return self.spark.read.parquet(path)

    def read_state(self, step: int, name: str = "state") -> DataFrame:
        return self.spark.read.parquet(self._state_dir(step, name))

    # -- metrics / lineage --------------------------------------------------

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
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def last_committed(self) -> dict | None:
        m = self.metrics()
        return m[-1] if m else None

    def resume_point(self, name: str = "state") -> tuple[int, DataFrame] | None:
        """(last committed superstep, its state frame), or None if fresh."""
        last = self.last_committed()
        if last is None:
            return None
        step = last["superstep"]
        return step, self.read_state(step, name=name)
