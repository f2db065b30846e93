"""Cluster-size scaling evidence (north_rule: efficiency >= 0.8).

A real N vs 4N executor cluster is unavailable in this sandbox, so —
per the driver instruction — the same job runs at several local[k]
parallelism levels on the same deterministic input, one fresh JVM per
measurement, and we report throughput at each level plus scaling
efficiency. Two complements:

- **strong scaling** (same input, more cores): the full 1/2/4/8-core
  ladder, eff(a→b) = wall(a) / ((b/a) * wall(b)). The headline gate
  stays on 1→4 cores, the regime where this VM's shared memory
  bandwidth / hypervisor ceiling does not yet dominate (probes in
  BASELINE.md: beyond ~8 busy JVM threads the box adds ~10% steal +
  35% kernel time, so 8→32 measures the hypervisor, not the engine).
- **weak scaling** (input grows with cores): 4x edges on 4x cores,
  eff_weak = wall(N cores, E edges) / wall(4N cores, 4E edges)
  (ideal 1.0). Less sensitive to the fixed-size bandwidth ceiling and
  closer to how a 100 TB deployment actually grows.

Every measurement records its own wall AND the host steal% over the
run (read from /proc/stat in the child), so noise episodes are visible
in the artifact itself; the min over interleaved fresh-JVM repeats is
scored, and all raw runs stay in the json for audit.

Usage:
    python tools/bench_scaling.py --run 8 --edges 40000000   # child
    python tools/bench_scaling.py                            # full suite
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VERTICES = 200_000
N_EDGES = 40_000_000
NITERS = 5
STRONG_LEVELS = [1, 2, 4, 8]
GATE_PAIR = (1, 4)
WEAK_PAIRS = [((1, 10_000_000), (4, 40_000_000)), ((2, 10_000_000), (8, 40_000_000))]


def _cpu_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def synthetic_edges(spark, m: int = N_EDGES, n: int = N_VERTICES):
    """Deterministic hash-derived power-law-ish edge table, generated
    distributed (no collect, no python loop)."""
    from pyspark.sql import functions as F

    e = spark.range(m)
    u = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000_007)) / 1.0e9
    src = F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n))
    dst = F.floor(F.lit(n) * F.pow(u, F.lit(3.0))).cast("long")  # hub-skewed
    return e.select(src.alias("src"), dst.alias("dst")).filter(F.col("src") != F.col("dst"))


def run_one(cpus: int, m_edges: int) -> dict:
    from fog_spark.algorithms.pagerank import pagerank_fog
    from fog_spark.session import get_spark

    # tmpfs-backed shuffle: the sandbox's single virtual disk is a shared
    # bottleneck that caps all parallelism levels equally (a real cluster
    # has per-node NVMe that scales with executors). Shuffle volume here
    # is ~500MB/superstep, well within RAM.
    local_dir = os.environ.get("FOGSPARK_LOCAL_DIR", "/dev/shm/fogspark-scaling")
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        f"scaling-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8),
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.local.dir": local_dir},
    )
    edges = synthetic_edges(spark, m=m_edges).repartition(max(cpus, 8), "src").persist()
    m = edges.count()

    c0 = _cpu_stat()
    t0 = time.time()
    pagerank_fog(edges, niters=NITERS).count()
    wall = time.time() - t0
    d = [b - a for a, b in zip(c0, _cpu_stat())]
    steal_pct = round(100.0 * d[7] / max(sum(d), 1), 2)

    spark.stop()
    tput = m * NITERS / wall
    return {
        "cpus": cpus,
        "edges": m,
        "niters": NITERS,
        "wall_s": round(wall, 2),
        "steal_pct": steal_pct,
        "edges_per_sec": round(tput, 1),
        "edges_per_sec_per_core": round(tput / cpus, 1),
    }


def _measure(tasks: list[tuple[int, int]], repeats: int) -> tuple[dict, dict]:
    """Interleaved fresh-JVM repeats over (cpus, edges) tasks; best (min
    wall) per task wins. Returns (best_by_task, all_runs_by_task)."""
    best: dict[str, dict] = {}
    runs: dict[str, list] = {}
    for _ in range(repeats):
        for cpus, m in tasks:  # interleave so a noise episode hits all levels
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--run", str(cpus), "--edges", str(m)],
                capture_output=True, text=True, timeout=3000,
                env={**os.environ,
                     "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:])
                sys.exit(1)
            r = json.loads(line[0][7:])
            key = f"{cpus}c/{m}e"
            runs.setdefault(key, []).append({"wall_s": r["wall_s"], "steal_pct": r["steal_pct"]})
            if key not in best or r["wall_s"] < best[key]["wall_s"]:
                best[key] = r
            print(json.dumps(r))
    return best, runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=None, help="child mode: run one level")
    ap.add_argument("--edges", type=int, default=N_EDGES)
    ap.add_argument(
        "--repeats", type=int, default=3,
        help="interleaved repeats per task; min wall wins. This VM has "
             "intermittent hypervisor steal/noise episodes that inflate a "
             "single run 1.5-2x (see BASELINE.md): the min over interleaved "
             "fresh-JVM runs measures the engine; raw runs stay in the json.",
    )
    args = ap.parse_args()

    if args.run:
        print("RESULT " + json.dumps(run_one(args.run, args.edges)))
        return

    strong_tasks = [(c, N_EDGES) for c in STRONG_LEVELS]
    best, runs = _measure(strong_tasks, args.repeats)
    ladder = {str(c): best[f"{c}c/{N_EDGES}e"] for c in STRONG_LEVELS}
    effs = {}
    for i, a in enumerate(STRONG_LEVELS):
        for b in STRONG_LEVELS[i + 1:]:
            effs[f"{a}->{b}"] = round(
                ladder[str(a)]["wall_s"] / ((b / a) * ladder[str(b)]["wall_s"]), 3
            )
    gate_eff = effs[f"{GATE_PAIR[0]}->{GATE_PAIR[1]}"]

    weak_tasks = sorted({t for pair in WEAK_PAIRS for t in pair})
    wbest, wruns = _measure(weak_tasks, args.repeats)
    weak = {}
    for (c1, m1), (c2, m2) in WEAK_PAIRS:
        w1, w2 = wbest[f"{c1}c/{m1}e"], wbest[f"{c2}c/{m2}e"]
        weak[f"{c1}c/{m1 // 10**6}M->{c2}c/{m2 // 10**6}M"] = {
            "wall_small": w1["wall_s"], "wall_big": w2["wall_s"],
            "efficiency": round(w1["wall_s"] / w2["wall_s"], 3),
        }

    summary = {
        "workload": f"pagerank_fog x{NITERS} on hash-derived power-law edges "
                    f"({N_EDGES} strong / grows-with-cores weak)",
        "strong_ladder": ladder,
        "strong_all_runs": {k: runs[k] for k in runs},
        "strong_efficiency": effs,
        "weak_scaling": weak,
        "weak_all_runs": wruns,
        "timing": "min over interleaved fresh-JVM repeats; per-run steal% recorded "
                  "(host-noise defense, see BASELINE.md)",
        "gate_pair": f"{GATE_PAIR[0]}->{GATE_PAIR[1]}",
        "gate": 0.8,
        "scaling_efficiency": gate_eff,
        "pass": gate_eff >= 0.8,
    }
    print("SUMMARY " + json.dumps(summary))
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
