"""Phase-level probes for the headline bench queries (round 6).

Isolates where each bench query's wall time goes (guide §1: measure
first): per-phase timers around the same actions bench.py runs, noop
sinks where a query's own action would hide compute, and job labels so
any UI/eventlog inspection maps back to phases.

Usage: python tools/bench_probe.py <probe> [...]
  pagerank_fog   per-superstep walls for pagerank_fog(edges, niters=10)
  pagerank_std   pagerank_standard(edges, tol=1e-6) phase walls
  cc             connected_components phase walls
  lpa            label_propagation phase walls
  triangles      A/B: broadcast-closure path vs merge/shuffle_hash path
  derive         A/B: self-join cooccur_edges vs groupBy+explode variant
  repo           repo pipeline phase walls

Not part of the driver contract; bench.py stays the only headline
artifact. Numbers are cited in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fog_spark.queries import cooccur_edges, load
from fog_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


class T:
    def __init__(self):
        self.t0 = time.time()
        self.marks = []

    def mark(self, name):
        t = time.time()
        self.marks.append((name, round(t - self.t0, 3)))
        self.t0 = t

    def dump(self, label):
        total = sum(w for _, w in self.marks)
        print(f"[{label}] total={total:.3f}s")
        for name, w in self.marks:
            print(f"  {name:32s} {w:8.3f}s")


def _edges(spark):
    e = cooccur_edges(spark, SF_DIR).persist()
    n = e.count()
    print(f"edges: {n}")
    return e


def probe_pagerank_fog(spark):
    from fog_spark.algorithms.pagerank import pagerank_fog

    edges = _edges(spark)
    for rep in range(3):
        t = T()
        spark.sparkContext.setJobDescription(f"fog10 rep{rep}")
        ranks = pagerank_fog(edges, niters=10)
        ranks.count()
        t.mark("pagerank_fog(niters=10).count")
        t.dump(f"fog10 rep{rep}")


def probe_pagerank_fog_steps(spark):
    """Manual unroll of pagerank_fog's phases with timers."""
    from fog_spark.algorithms.pagerank import _degrees_with_indeg
    from fog_spark.engine.superstep import materialize, maybe_broadcast, prepare_gather_edges

    edges = _edges(spark)
    for rep in range(2):
        t = T()
        state = materialize(_degrees_with_indeg(edges, None).withColumn("rank", F.lit(1.0)))
        t.mark("init+materialize")
        n = state.count()
        t.mark("count")
        hubs = state.filter(F.col("indeg") > 10**6)
        salted = not hubs.isEmpty()
        t.mark(f"hub probe (salted={salted})")
        state = state.select("id", "outdeg", "rank")
        m = int(state.agg(F.sum("outdeg")).collect()[0][0] or 0)
        t.mark("m agg")
        prepared = prepare_gather_edges(edges, n, False, m_edges=m, expected_iters=10)
        t.mark("prepare_gather_edges")
        d = 0.85
        for step in range(1, 11):
            msg = (d * F.col("rank") / F.col("outdeg") + (1.0 - d)).alias("msg")
            st = maybe_broadcast(state, n)
            msgs = prepared.join(st, prepared["src"] == st["id"]).select(prepared["dst"], msg)
            agg = msgs.groupBy("dst").agg(F.sum("msg").alias("incoming"))
            state = (
                state.join(maybe_broadcast(agg, n), state["id"] == agg["dst"], "left")
                .select("id", "outdeg", (F.col("rank") + F.coalesce("incoming", F.lit(0.0))).alias("rank"))
            )
            state = materialize(state)
            t.mark(f"superstep {step}")
        state.count()
        t.mark("final count")
        if prepared is not edges:
            prepared.unpersist()
        t.dump(f"fog10-unrolled rep{rep}")


def probe_triangles(spark):
    from fog_spark.algorithms import triangles as tr

    edges = _edges(spark)
    for rep in range(2):
        for label, cap in (("broadcast", 4_000_000), ("exchange", 0)):
            tr.TRIANGLE_BROADCAST_MAX_EDGES = cap
            t = T()
            spark.sparkContext.setJobDescription(f"triangles {label} rep{rep}")
            n = tr.triangle_total(edges)
            t.mark(f"triangle_total={n}")
            t.dump(f"triangles {label} rep{rep}")


def probe_triangles_phases(spark):
    from fog_spark.algorithms import triangles as tr

    edges = _edges(spark)
    for rep in range(2):
        t = T()
        o, n_o = tr._oriented_cached(edges)
        t.mark(f"orient+cache+count ({n_o})")
        stream = tr._triangle_stream(o, n_o)
        n = stream.count()
        t.mark(f"wedge+closure count ({n})")
        o.unpersist()
        t.dump(f"triangles-phases rep{rep}")


def probe_derive(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    for rep in range(3):
        t = T()
        e1 = cooccur_edges(spark, SF_DIR)
        noop(e1)
        t.mark("self-join variant (noop)")

        grouped = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
        pairs = grouped.select(
            F.explode("ps").alias("src"), F.col("ps").alias("ps")
        ).select("src", F.explode("ps").alias("dst")).where(F.col("src") != F.col("dst"))
        e2 = pairs.select(
            "src", "dst", (((F.col("src") * 31 + F.col("dst")) % 90 + 10) / 10.0).alias("weight")
        ).distinct()
        noop(e2)
        t.mark("collect_list variant (noop)")
        t.dump(f"derive rep{rep}")


def probe_repo(spark):
    from fog_spark.algorithms.pagerank import pagerank_fog
    from fog_spark.fixtures_spark import make_repo_table_spark
    from fog_spark.graph.derive import _extract_refs_builtin, assign_dense_ids, derive_graph

    for rep in range(2):
        t = T()
        repos = make_repo_table_spark(spark, n_repos=100, files_per_repo=2000)
        noop(repos)
        t.mark("fixture gen (noop)")
        refs = _extract_refs_builtin(repos)
        noop(refs)
        t.mark("extract refs (noop)")
        files = assign_dense_ids(repos)
        noop(files)
        t.mark("dense ids (noop)")
        g = derive_graph(repos)
        ge = g.edges.persist()
        n = ge.count()
        t.mark(f"edges persist+count ({n})")
        pagerank_fog(ge, g.vertices, niters=5).count()
        t.mark("pagerank_fog 5 iters")
        ge.unpersist()
        t.dump(f"repo rep{rep}")


def probe_cc(spark):
    from fog_spark.algorithms.cc import connected_components

    edges = _edges(spark)
    for rep in range(3):
        t = T()
        connected_components(edges).select(F.countDistinct("component")).collect()
        t.mark("cc total")
        t.dump(f"cc rep{rep}")


def probe_lpa(spark):
    from fog_spark.algorithms.lpa import label_propagation

    edges = _edges(spark)
    for rep in range(3):
        t = T()
        label_propagation(edges, max_iters=10).count()
        t.mark("lpa total")
        t.dump(f"lpa rep{rep}")


def probe_pagerank_std(spark):
    from fog_spark.algorithms.pagerank import pagerank_standard

    edges = _edges(spark)
    for rep in range(3):
        t = T()
        ranks, iters = pagerank_standard(edges, tol=1e-6, max_iters=60)
        ranks.count()
        t.mark(f"pagerank_standard ({iters} iters)")
        t.dump(f"pr-std rep{rep}")


def probe_minhash(spark):
    from fog_spark.datapipe.dedup import minhash_lsh_candidates

    docs = load(spark, SF_DIR, "documents")
    for rep in range(3):
        t = T()
        minhash_lsh_candidates(docs, k=16, bands=4).count()
        t.mark("minhash_lsh")
        t.dump(f"minhash rep{rep}")


PROBES = {
    "pagerank_fog": probe_pagerank_fog,
    "pagerank_fog_steps": probe_pagerank_fog_steps,
    "pagerank_std": probe_pagerank_std,
    "cc": probe_cc,
    "lpa": probe_lpa,
    "triangles": probe_triangles,
    "triangles_phases": probe_triangles_phases,
    "derive": probe_derive,
    "repo": probe_repo,
    "minhash": probe_minhash,
}


def main():
    which = sys.argv[1:] or list(PROBES)
    spark = get_spark("fogspark-probe", cpus=CPUS, shuffle_partitions=CPUS,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
