"""Hub-fixture evidence that the random-walk step is O(|walks|).

The r3 plan joined the walk frontier to the adjacency on src only and
applied the neighbor pick as a post-join filter, so every walk standing
on a hub streamed the hub's ENTIRE out-neighborhood per step. The r4
plan computes the pick index walk-side and equi-joins on (src, idx) —
a point lookup.

Fixture that makes the difference categorical, not incremental: a
"funnel" graph where every vertex points at one hub and the hub points
at every vertex (|V| = n, |E| = 2n, hub outdeg = n). After step 1,
~half the walk frontier stands ON the hub, so the old plan's step cost
is |walks_at_hub| * outdeg(hub) ~ (n/2) * n rows — at n = 200,000 that
is 2e10 streamed-and-discarded rows PER STEP, unrunnable. The new plan
moves O(|walks|) rows per step and finishes in seconds. A same-sized
uniform-degree control shows the hub costs nothing extra.

Writes BENCH_WALKS.json. Usage: python tools/bench_walks.py [--n 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal_pct(c0, c1) -> float:
    d = [b - a for a, b in zip(c0, c1)]
    return round(100.0 * d[7] / max(sum(d), 1), 2)


def _cpu_stat():
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--length", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fog_spark.algorithms.walks import random_walks
    from fog_spark.session import get_spark

    spark = get_spark("bench-walks", cpus=16, shuffle_partitions=32,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    n = args.n

    # funnel: v -> hub (n edges) + hub -> v (n edges); hub outdeg = n
    ids = spark.range(1, n).select(F.col("id"))
    hub_edges = (
        ids.select(F.col("id").alias("src"), F.lit(0).alias("dst"))
        .unionByName(ids.select(F.lit(0).alias("src"), F.col("id").alias("dst")))
        .persist()
    )
    m_hub = hub_edges.count()

    # uniform control: same |V|, same |E|, outdeg 2 everywhere (a ring
    # plus a stride-7 chord — no hub anywhere)
    allv = spark.range(n)
    uni_edges = (
        allv.select(F.col("id").alias("src"), F.pmod(F.col("id") + 1, F.lit(n)).alias("dst"))
        .unionByName(
            allv.select(F.col("id").alias("src"), F.pmod(F.col("id") + 7, F.lit(n)).alias("dst"))
        )
        .persist()
    )
    m_uni = uni_edges.count()

    def run(edges) -> tuple[float, float, int]:
        best, steal_at_best, rows = None, None, 0
        for _ in range(args.repeats):
            c0 = _cpu_stat()
            t0 = time.time()
            rows = random_walks(edges, length=args.length, seed=42).count()
            wall = round(time.time() - t0, 3)
            st = _steal_pct(c0, _cpu_stat())
            if best is None or wall < best:
                best, steal_at_best = wall, st
        return best, steal_at_best, rows

    hub_wall, hub_steal, hub_rows = run(hub_edges)
    uni_wall, uni_steal, uni_rows = run(uni_edges)

    # second-order walks on the funnel: the exact sampler must gather
    # each walk's whole neighborhood (O(frontier-at-hub * hub_outdeg)
    # per step — quadratic in n on this fixture), the rejection sampler
    # (KnightKing) stays point lookups. Exact is timed at small n to
    # show the growth; rejection runs at the full 200k.
    from fog_spark.algorithms.walks import node2vec_walks, node2vec_walks_rejection

    def funnel(k):
        i = spark.range(1, k).select(F.col("id"))
        return (
            i.select(F.col("id").alias("src"), F.lit(0).alias("dst"))
            .unionByName(i.select(F.lit(0).alias("src"), F.col("id").alias("dst")))
            .persist()
        )

    n2v = {}
    for small_n in (2000, 8000):
        fe = funnel(small_n)
        fe.count()
        t0 = time.time()
        node2vec_walks(fe, length=args.length, p=2, q=3, seed=42).count()
        n2v[f"exact_n{small_n}_wall_s"] = round(time.time() - t0, 3)
        fe.unpersist()
    # attempts sized so the exact-fallback residue vanishes:
    # (1 - min_w/max_w)^attempts = (2/3)^32 ~ 2e-6 of hub walks
    t0 = time.time()
    rej_rows = node2vec_walks_rejection(
        hub_edges, length=args.length, p=2, q=3, seed=42, attempts=32
    ).count()
    n2v["rejection_n200000_wall_s"] = round(time.time() - t0, 3)
    n2v["rejection_n200000_rows"] = rej_rows
    n2v["rejection_attempts"] = 32

    out = {
        "metric": "random_walks_hub_vs_uniform",
        "n_vertices": n,
        "length": args.length,
        "hub": {"edges": m_hub, "hub_outdeg": n - 1, "wall_s": hub_wall,
                "steal_pct": hub_steal, "corpus_rows": hub_rows},
        "uniform": {"edges": m_uni, "max_outdeg": 2, "wall_s": uni_wall,
                    "steal_pct": uni_steal, "corpus_rows": uni_rows},
        "hub_over_uniform": round(hub_wall / uni_wall, 3),
        "node2vec": n2v,
        "old_plan_rows_per_step_at_hub": (n // 2) * (n - 1),
        "note": "old (src-only join + pick filter) plan would stream "
                "~|walks_at_hub| * outdeg(hub) rows per step on the funnel "
                "fixture; the (src, idx) point-lookup plan is O(|walks|) "
                "per step, so hub and uniform cost the same order.",
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_WALKS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
