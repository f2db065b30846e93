"""Headline benchmark: one JSON line for the round driver.

Runs the north-rule algorithm suite on the part co-occurrence link
graph derived from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
plus the pipeline headliners, on local[$SPARK_GRAFT_CPUS].

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling-efficiency evidence (local[8] vs local[32]) is produced by
tools/bench_scaling.py and recorded in BASELINE.md — one JVM per
parallelism level, so it cannot share this process.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from fog_spark.algorithms.cc import connected_components
from fog_spark.algorithms.lpa import label_propagation
from fog_spark.algorithms.pagerank import pagerank_standard
from fog_spark.algorithms.triangles import triangle_total
from fog_spark.datapipe.dedup import minhash_lsh_candidates
from fog_spark.queries import cooccur_edges, load
from fog_spark.session import get_spark


def _cpu_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:9]]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("fogspark-bench", cpus=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    timings: dict[str, float] = {}
    extra: dict = {"runs": {}, "steal_pct": {}}

    def timed(name, fn, repeats=2):
        """min-of-N wall time. This VM shows intermittent hypervisor
        noise episodes (measured: identical plans swinging 14s -> 61s
        at >10% steal, and whole bench invocations 54s vs 167s minutes
        apart); the min over repeats is the engine's number, the
        per-run list + steal%% make any spike auditable. If the first
        two runs disagree by >1.5x, one extra run disambiguates an
        episode from a real cost."""
        runs, out = [], None

        def one():
            nonlocal out
            c0 = _cpu_stat()
            t0 = time.time()
            out = fn()
            runs.append(round(time.time() - t0, 3))
            d = [b - a for a, b in zip(c0, _cpu_stat())]
            extra["steal_pct"].setdefault(name, []).append(
                round(100.0 * d[7] / max(sum(d), 1), 2)
            )

        for _ in range(repeats):
            one()
        if len(runs) >= 2 and max(runs) > 1.5 * min(runs):
            one()
        # steal-episode defense: if even the BEST run saw >3% steal, the
        # number measures the hypervisor, not the engine — buy up to two
        # more attempts hoping to land in a quiet window (all runs and
        # their steal%% stay recorded either way). Never for single-run
        # queries: those persist their result, so a re-run times the cache.
        retries = 0
        while repeats > 1 and retries < 2 and extra["steal_pct"][name][runs.index(min(runs))] > 3.0:
            one()
            retries += 1
        timings[name] = min(runs)
        extra["runs"][name] = runs
        return out

    # edge derivation (the convert-replacement) — timed as its own query;
    # single run: it persists, so a repeat would time the cache instead
    edges = timed("derive_edges", lambda: cooccur_edges(spark, sf_dir).persist(), repeats=1)
    m = edges.count()
    extra["n_edges"] = m

    def _pagerank():
        ranks, iters = pagerank_standard(edges, tol=1e-6, max_iters=60)
        ranks.count()
        extra["pagerank_iters"] = iters
        return iters

    iters = timed("pagerank_1e6", _pagerank)
    extra["pagerank_edges_per_sec"] = round(m * iters / timings["pagerank_1e6"], 1)
    extra["pagerank_edges_per_sec_per_core"] = round(m * iters / timings["pagerank_1e6"] / cpus, 1)

    # fixed-iteration FOG-mode run: the stable throughput number
    # (absolute-tol convergence depends on graph size; 10 supersteps don't)
    from fog_spark.algorithms.pagerank import pagerank_fog

    timed("pagerank_fog10", lambda: pagerank_fog(edges, niters=10).count())
    extra["fog10_edges_per_sec"] = round(m * 10 / timings["pagerank_fog10"], 1)
    extra["fog10_edges_per_sec_per_core"] = round(m * 10 / timings["pagerank_fog10"] / cpus, 1)

    timed("cc_hashmin", lambda: connected_components(edges).select(F.countDistinct("component")).collect())
    timed("lpa", lambda: label_propagation(edges, max_iters=10).count())
    timed("triangles", lambda: triangle_total(edges))
    timed(
        "minhash_lsh_dedup",
        lambda: minhash_lsh_candidates(load(spark, sf_dir, "documents"), k=16, bands=4).count(),
    )

    # north-rule-faithful end-to-end: Spark-generated repo table ->
    # regex import extraction -> dense ids -> FOG PageRank supersteps
    def _repo_pipeline():
        from fog_spark.algorithms.pagerank import pagerank_fog as _pf
        from fog_spark.fixtures_spark import make_repo_table_spark
        from fog_spark.graph.derive import derive_graph

        repos = make_repo_table_spark(spark, n_repos=100, files_per_repo=2000)
        g = derive_graph(repos)
        ge = g.edges.persist()
        extra["repo_pipeline_edges"] = ge.count()
        _pf(ge, g.vertices, niters=5).count()
        ge.unpersist()

    timed("repo_derive_pagerank", _repo_pipeline)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "fogspark_headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
