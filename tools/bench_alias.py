"""Alias-table vs rejection sampling on a skew-weighted hub.

The rejection sampler's cost scales with attempts and its residue with
(1 - w_min/w_max)^attempts: on a graph where one edge weight dominates
(w_max/w_min = 1000), most draws reject and most walks fall back to the
exact cumulative gather. The Walker alias table pays one point-lookup
join + two hash draws per step REGARDLESS of the weight distribution —
this records both walls on the same fixture.

Fixture: funnel hub (everyone -> hub -> everyone) with weight 100.0 on
one hub out-edge and 0.1 on the rest; plus a benign uniform-weight
control where rejection is at its best.

Writes BENCH_ALIAS.json. Usage: python tools/bench_alias.py [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def _steal_pct(c0, c1) -> float:
    d = [b - a for a, b in zip(c0, c1)]
    return round(100.0 * d[7] / max(sum(d), 1), 2)


def _run(fn, repeats):
    walls, steals = [], []
    for _ in range(repeats):
        c0 = _cpu_stat()
        t0 = time.time()
        rows = fn()
        walls.append(round(time.time() - t0, 3))
        steals.append(_steal_pct(c0, _cpu_stat()))
    i = walls.index(min(walls))
    return {"wall_s": walls[i], "steal_pct": steals[i], "runs": walls, "corpus_rows": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--length", type=int, default=4)
    ap.add_argument("--attempts", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fog_spark.algorithms.walks import weighted_random_walks, weighted_random_walks_alias
    from fog_spark.session import get_spark

    spark = get_spark("bench-alias", cpus=16, shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n = args.n

    ids = spark.range(1, n).select("id")
    skewed = (
        ids.select(F.col("id").alias("src"), F.lit(0).alias("dst"), F.lit(1.0).alias("weight"))
        .unionByName(
            ids.select(
                F.lit(0).alias("src"), F.col("id").alias("dst"),
                # one dominant out-edge: w=100.0 for dst==1, 0.1 otherwise
                F.when(F.col("id") == 1, F.lit(100.0)).otherwise(F.lit(0.1)).alias("weight"),
            )
        )
        .localCheckpoint(eager=True)
    )
    uniform = skewed.withColumn("weight", F.lit(1.0)).localCheckpoint(eager=True)

    out = {"metric": "weighted_walk_sampler_alias_vs_rejection",
           "n_vertices": n, "length": args.length, "attempts": args.attempts,
           "w_max_over_min_skewed": 1000}
    for name, edges in [("skewed", skewed), ("uniform", uniform)]:
        rej = _run(lambda e=edges: weighted_random_walks(
            e, length=args.length, attempts=args.attempts, weight_scale=10).count(), args.repeats)
        ali = _run(lambda e=edges: weighted_random_walks_alias(
            e, length=args.length, weight_scale=10).count(), args.repeats)
        out[name] = {"rejection": rej, "alias": ali,
                     "alias_speedup": round(rej["wall_s"] / ali["wall_s"], 2)}
        print(name, out[name], flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "BENCH_ALIAS.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
