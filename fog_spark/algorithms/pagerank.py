"""PageRank — two modes, two kernels.

Modes
-----
- **FOG mode** (the correctness oracle): the reference's exact —
  non-standard — recurrence, traced in SURVEY §2.8 from
  application/pagerank.hpp:62-77,102-106 + fogsrc/cpu_thread.cpp:509-534:

      rank_0(v) = 1.0
      rank_k(v) = rank_{k-1}(v) + Σ_{u→v} [ d·rank_{k-1}(u)/outdeg(u) + (1−d) ]

  The attribute accumulates (gather is ``+=`` and init runs once), the
  (1−d) term is per IN-EDGE, self-loops participate (GLOBAL scatter has
  no self-loop filter), and vertices with no in-edges keep their rank.
  Fixed iteration count (default 10, headers/options_utils.h:40-41).

- **Standard mode** (the bench/convergence target): normalized PageRank
  with uniform dangling-mass redistribution, iterated until
  max_v |rank_k − rank_{k−1}| < tol (north_rule: 1e-6).

Kernels
-------
- ``kernel="df"``: pure DataFrame ops — scatter join + partial-hash-agg
  shuffle, whole-stage-codegen'd, zero Python in the loop.
- ``kernel="csr"``: the north_star's CSR-packed path — edges and state
  are co-partitioned by hash(src); adjacency is packed into NumPy CSR
  arrays ONCE (engine/csr.pack_csr), and each superstep a cogrouped
  Arrow pandas UDF computes all messages vectorized and PRE-AGGREGATES
  them by dst before the shuffle (np.bincount = map-side combine). No
  per-row Python anywhere.

Measured tradeoff (sandbox, 8 cores): df 46s vs csr 452s for 5
supersteps over 40M edges — the packed arrays cross the JVM<->Python
Arrow boundary every superstep (~640MB/superstep here), while the df
kernel never leaves whole-stage codegen. Use csr only when the per-edge
kernel cannot be expressed in Spark SQL (custom numerics, model
scoring); for SQL-expressible folds the df kernel is strictly better.
"""

from __future__ import annotations

import time
import numpy as np
from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.skew import HUB_DEGREE_THRESHOLD, HUB_FLAG, pick_hub_keys, skewed_gather, tag_hubs, top_degree_keys
from fog_spark.engine.superstep import (
    degrees_and_vertices,
    materialize,
    materialize_observed,
    maybe_broadcast,
    merge_join,
    prepare_gather_edges,
    vertices_of,
)

DAMPING = 0.85  # application/pagerank.hpp:22


def _hub_tagged(edges: DataFrame, hub_threshold: int | None) -> tuple[DataFrame, bool, "DataFrame | None"]:
    """Tag hub in-degree keys once before the loop (skew mitigation).

    The (tiny) hub set is persisted and returned for cleanup — the
    per-superstep tag join rebuilds its broadcast from that cache
    instead of re-aggregating degrees over the whole edge table, and
    no second full-size copy of the edge table is cached."""
    if hub_threshold is None:
        return edges, False, None
    hubs = top_degree_keys(edges, "dst", hub_threshold).persist()
    if hubs.isEmpty():  # take(1) probe, not a full count job
        hubs.unpersist()
        return edges, False, None
    return tag_hubs(edges, hubs), True, hubs


def _degrees(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    return (
        vertices.join(deg, vertices["id"] == deg["src"], "left")
        .select("id", F.coalesce("outdeg", F.lit(0)).alias("outdeg"))
    )


def _degrees_with_indeg(edges: DataFrame, vertices: DataFrame | None) -> DataFrame:
    """(id, outdeg, indeg) loop-preamble frame — ONE union-aggregate
    shuffle (superstep.degrees_and_vertices) instead of the three passes
    the preamble used to pay (vertices distinct + out-degree groupBy +
    the top_degree_keys hub-probe scan). With an explicit ``vertices``
    frame the vertex set is joined on (semantics: callers may restrict
    or extend the vertex set); hub keys outside that set are then not
    detected — a performance-only caveat (salting never changes gather
    results), irrelevant when vertices ⊇ edge endpoints, the documented
    contract of every in-tree caller."""
    dv = degrees_and_vertices(edges)
    if vertices is None:
        return dv
    dva = dv.select(F.col("id").alias("_vid"), "outdeg", "indeg")
    return vertices.join(dva, vertices["id"] == F.col("_vid"), "left").select(
        vertices["id"],
        F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
        F.coalesce("indeg", F.lit(0)).alias("indeg"),
    )


# ---------------------------------------------------------------------------
# FOG mode
# ---------------------------------------------------------------------------


def pagerank_fog(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    niters: int = 10,
    d: float = DAMPING,
    ctx=None,
    kernel: str = "df",
    n_kernel_parts: int | None = None,
    hub_threshold: int | None = HUB_DEGREE_THRESHOLD,
    n_salts: int = 16,
) -> DataFrame:
    """FOG-mode accumulating PageRank. Returns (id, rank)."""
    spark = edges.sparkSession
    state = _degrees_with_indeg(edges, vertices).withColumn("rank", F.lit(1.0))

    start_step = 0
    resumed = False
    if ctx is not None:
        rp = ctx.resume_point_at_most(niters)
        if rp is not None:
            start_step, state = rp
            resumed = True

    if start_step == 0:
        # resumed state is already parquet-backed — re-writing it would
        # round-trip (and briefly delete) the only committed snapshot
        state = materialize(state, ctx, 0)
    n = state.count()  # known once; drives broadcast decisions every superstep

    salted, hubs = False, None
    if kernel == "csr":
        from fog_spark.engine.csr import pack_csr

        nparts = n_kernel_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
        packed = pack_csr(edges, nparts).persist()
        packed.count()  # pack ONCE; reused by every superstep
    elif hub_threshold is not None:
        if resumed:
            # resumed snapshots past step 0 carry no indeg — probe edges
            edges, salted, hubs = _hub_tagged(edges, hub_threshold)
        else:
            # hub keys read off the cached state (indeg) — no separate
            # full-edge-table probe aggregation job
            salted, hubs = pick_hub_keys(
                state_keys=state.filter(F.col("indeg") > hub_threshold).select(F.col("id").alias("dst"))
            )
            if salted:
                edges = tag_hubs(edges, hubs)
    if "indeg" in state.columns:
        state = state.select("id", "outdeg", "rank")
    if kernel != "csr":
        # gather-aligned edge cache (superstep.prepare_gather_edges):
        # zero shuffle exchanges per superstep when the state broadcasts.
        # |E| = sum(outdeg) — a tiny agg over the materialized state —
        # feeds the amortization guard for this fixed-niters run.
        m = int(state.agg(F.sum("outdeg")).collect()[0][0] or 0)
        prepared = prepare_gather_edges(
            edges, n, salted, m_edges=m, expected_iters=niters - start_step
        )
        owned_cache = prepared is not edges
        edges = prepared

    for step in range(start_step + 1, niters + 1):
        t0 = time.time()
        if kernel == "csr":
            from fog_spark.engine.csr import csr_scatter_sum

            def fog_msg(sb, d=d):
                deg = np.maximum(sb["outdeg"].to_numpy(), 1)  # outdeg-0 rows never scatter
                return d * sb["rank"].to_numpy() / deg + (1.0 - d)

            partials = csr_scatter_sum(packed, state, nparts, fog_msg)
            agg = partials.groupBy("dst").agg(F.sum("partial").alias("incoming"))
        else:
            msg = (d * F.col("rank") / F.col("outdeg") + (1.0 - d)).alias("msg")
            st = maybe_broadcast(state, n)
            msg_cols = [edges["dst"], msg] + ([edges[HUB_FLAG]] if salted else [])
            msgs = edges.join(st, edges["src"] == st["id"]).select(*msg_cols)
            if salted:
                agg = skewed_gather(msgs, "dst", [("sum", "msg", "incoming")], n_salts)
            else:
                agg = msgs.groupBy("dst").agg(F.sum("msg").alias("incoming"))
        state = (
            merge_join(state, agg, state["id"] == agg["dst"], n)
            .select("id", "outdeg", (F.col("rank") + F.coalesce("incoming", F.lit(0.0))).alias("rank"))
        )
        state = materialize(state, ctx, step)
        if ctx is not None:
            ctx.commit(step, active=-1, delta=None, wall_s=time.time() - t0, lineage=ctx.lineage_of(state))

    if kernel == "csr":
        packed.unpersist()
    elif owned_cache:
        edges.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return state.select("id", "rank")


# ---------------------------------------------------------------------------
# Standard mode (normalized, convergent)
# ---------------------------------------------------------------------------


def pagerank_standard(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    d: float = DAMPING,
    tol: float = 1e-6,
    max_iters: int = 200,
    ctx=None,
    hub_threshold: int | None = HUB_DEGREE_THRESHOLD,
    n_salts: int = 16,
    init_ranks: DataFrame | None = None,
) -> tuple[DataFrame, int]:
    """Normalized PageRank to tol; returns ((id, rank), iterations_run).

    The convergence delta and the next iteration's dangling mass are
    OBSERVED on the materialize job itself — one Spark job per
    superstep, no separate aggregation scan.

    ``init_ranks`` ((id, rank)) warm-starts the power iteration — e.g.
    the previous fixed point after a streaming delta batch grew the
    graph (``streaming.read_edge_log``). The iteration is an affine
    contraction with a unique fixed point, so ANY start converges to
    the same answer; a near-answer start just crosses ``tol`` in fewer
    supersteps. Vertices absent from ``init_ranks`` (newly arrived)
    start at 1/n; a ``ctx`` resume snapshot takes precedence.
    """
    start_it = 0
    state = base = None
    if ctx is not None:
        rp = ctx.resume_point_at_most(max_iters)
        if rp is not None:
            start_it, state = rp
            # convergence must be judged by the metric record OF the
            # resumed step: last_committed() may describe a NEWER step
            # whose snapshot was lost (resume_point walked past it)
            rec = next((m for m in reversed(ctx.metrics()) if m["superstep"] == start_it), {})
            if rec.get("delta") is not None and rec["delta"] < tol:
                return state.select("id", "rank"), start_it
    if start_it == 0:
        # one materialized (id, outdeg, indeg) preamble frame: vertex
        # set, scatter degrees, and hub keys in a single shuffle, and
        # the init plan executes ONCE (the old count-then-checkpoint
        # flow re-executed the degree aggregation for each)
        base = materialize(_degrees_with_indeg(edges, vertices))
        n = base.count()
        if n == 0:  # an empty graph is converged (and 1/n is undefined)
            return base.select("id", F.lit(0.0).alias("rank")), 0
        state = base.select("id", "outdeg", F.lit(1.0 / n).alias("rank"), F.lit(0.0).alias("prev"))
        if init_ranks is not None:
            warm = init_ranks.select(F.col("id").alias("wid"), F.col("rank").alias("wrank"))
            state = base.join(maybe_broadcast(warm, n), base["id"] == F.col("wid"), "left").select(
                "id", "outdeg", F.coalesce("wrank", F.lit(1.0 / n)).alias("rank"), F.lit(0.0).alias("prev")
            )
            # Normalize to sum 1: mass error lies along the principal
            # eigenvector and decays only at rate d (the SLOWEST mode) —
            # an unnormalized warm start from a grown graph measurably
            # converges slower than uniform (103 vs 30 supersteps at 1e-10
            # on a 31-vertex drive). Shape error decays at d·λ2, so the
            # normalized warm start is the fast path the docstring promises.
            tot = state.agg(F.sum("rank")).collect()[0][0] or 1.0
            state = state.withColumn("rank", F.col("rank") / tot)
        if ctx is not None:
            state = materialize(state, ctx, 0)
        elif init_ranks is not None:
            # the warm join is not a thin projection over the cached
            # base — checkpoint so superstep 1 doesn't execute it twice
            state = state.localCheckpoint(eager=True)
        # otherwise the thin projection over the cached base IS the
        # stable step-0 leaf — a second localCheckpoint would only copy it
    else:
        n = state.count()

    salted, hubs = False, None
    if hub_threshold is not None:
        if base is not None:
            salted, hubs = pick_hub_keys(
                state_keys=base.filter(F.col("indeg") > hub_threshold).select(F.col("id").alias("dst"))
            )
            if salted:
                edges = tag_hubs(edges, hubs)
        else:  # resumed: no cached indeg frame — probe the edge table
            edges, salted, hubs = _hub_tagged(edges, hub_threshold)
    state = state.select("id", "outdeg", "rank", "prev")
    # gather-aligned edge cache — see pagerank_fog (convergent run:
    # iteration budget unknown, assume enough supersteps to amortize)
    prepared = prepare_gather_edges(edges, n, salted)
    owned_cache = prepared is not edges
    edges = prepared

    # scalar pass: dangling mass of the current rank vector
    dangling = state.filter(F.col("outdeg") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0

    it = start_it
    for it in range(start_it + 1, max_iters + 1):
        t0 = time.time()
        st = maybe_broadcast(state, n)
        msg_cols = [edges["dst"], (F.col("rank") / F.col("outdeg")).alias("msg")] + (
            [edges[HUB_FLAG]] if salted else []
        )
        msgs = edges.join(st, edges["src"] == st["id"]).select(*msg_cols)
        if salted:
            agg = skewed_gather(msgs, "dst", [("sum", "msg", "contrib")], n_salts)
        else:
            agg = msgs.groupBy("dst").agg(F.sum("msg").alias("contrib"))
        state = (
            merge_join(state, agg, state["id"] == agg["dst"], n)
            .select(
                "id",
                "outdeg",
                F.col("rank").alias("prev"),
                ((1.0 - d) / n + d * (F.coalesce("contrib", F.lit(0.0)) + dangling / n)).alias("rank"),
            )
        )
        state, om = materialize_observed(
            state,
            [
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("delta"),
                F.sum(F.when(F.col("outdeg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias("dangling"),
            ],
            ctx,
            it,
        )
        # om values are None on an empty vertex set — an empty graph is
        # converged (matches bfs/cc/sssp's observed-metric null handling)
        delta, dangling = float(om["delta"] or 0.0), float(om["dangling"] or 0.0)
        if ctx is not None:
            ctx.commit(it, active=n, delta=delta, wall_s=time.time() - t0, lineage=ctx.lineage_of(state))
        if delta < tol:
            break
    if owned_cache:
        edges.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return state.select("id", "rank"), it


# ---------------------------------------------------------------------------
# Weighted mode (edge-weight-proportional transitions, convergent)
# ---------------------------------------------------------------------------


def pagerank_weighted(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    weight_col: str = "weight",
    d: float = DAMPING,
    tol: float = 1e-6,
    max_iters: int = 200,
    ctx=None,
) -> tuple[DataFrame, int]:
    """Normalized PageRank with edge-weight-proportional transitions:
    a surfer at u follows edge (u, v) with probability
    weight(u,v) / Σ_x weight(u,x). Real link graphs are weighted
    (co-occurrence counts, import multiplicity); the uniform engine
    ignores that signal. Returns ((id, rank), iterations_run).

    The transition probability ``p = w / wsum(src)`` is attached to the
    edge table ONCE before the loop (one keyed join), so every
    superstep is the same scatter-join + sum-gather as the uniform
    engine — msg = rank * p instead of rank / outdeg. Dangling =
    vertices with no (positive-weight) out-edges, redistributed
    uniformly; delta and next-round dangling ride the materialize job
    as observed metrics (one job per superstep). ``tol=0.0`` +
    ``max_iters=k`` is the fixed-depth oracle form.
    """
    vertices = vertices if vertices is not None else vertices_of(edges)
    e = edges.select("src", "dst", F.col(weight_col).alias("w")).filter(F.col("w") > 0)
    wsum = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    pe = (
        e.join(wsum, "src")
        .select("src", "dst", (F.col("w") / F.col("wsum")).alias("p"))
        .localCheckpoint(eager=False)  # one concrete RDD for all supersteps
    )
    state = (
        vertices.join(wsum, vertices["id"] == wsum["src"], "left")
        .select("id", F.col("wsum").isNotNull().alias("has_out"))
        .withColumn("rank", F.lit(0.0))
        .withColumn("prev", F.lit(0.0))
    )
    n = state.count()
    if n == 0:
        return state.select("id", "rank"), 0
    state = state.withColumn("rank", F.lit(1.0 / n))

    start_it = 0
    if ctx is not None:
        rp = ctx.resume_point_at_most(max_iters)
        if rp is not None:
            start_it, state = rp
            rec = next((m for m in reversed(ctx.metrics()) if m["superstep"] == start_it), {})
            if rec.get("delta") is not None and rec["delta"] < tol:
                return state.select("id", "rank"), start_it
    if start_it == 0:
        state = materialize(state, ctx, 0) if ctx else state.localCheckpoint(eager=True)

    dangling = state.filter(~F.col("has_out")).agg(F.sum("rank")).collect()[0][0] or 0.0

    it = start_it
    for it in range(start_it + 1, max_iters + 1):
        t0 = time.time()
        st = maybe_broadcast(state, n)
        msgs = pe.join(st, pe["src"] == st["id"]).select(
            pe["dst"], (F.col("rank") * F.col("p")).alias("msg")
        )
        agg = msgs.groupBy("dst").agg(F.sum("msg").alias("contrib"))
        state = (
            merge_join(state, agg, state["id"] == agg["dst"], n)
            .select(
                "id",
                "has_out",
                F.col("rank").alias("prev"),
                ((1.0 - d) / n + d * (F.coalesce("contrib", F.lit(0.0)) + dangling / n)).alias("rank"),
            )
        )
        state, om = materialize_observed(
            state,
            [
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("delta"),
                F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(F.lit(0.0))).alias("dangling"),
            ],
            ctx,
            it,
        )
        delta, dangling = float(om["delta"] or 0.0), float(om["dangling"] or 0.0)
        if ctx is not None:
            ctx.commit(it, active=n, delta=delta, wall_s=time.time() - t0, lineage=ctx.lineage_of(state))
        if delta < tol:
            break
    return state.select("id", "rank"), it


# ---------------------------------------------------------------------------
# Personalized mode (seeded teleport, convergent)
# ---------------------------------------------------------------------------


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    vertices: DataFrame | None = None,
    d: float = DAMPING,
    tol: float = 1e-6,
    max_iters: int = 200,
    ctx=None,
    hub_threshold: int | None = HUB_DEGREE_THRESHOLD,
    n_salts: int = 16,
) -> tuple[DataFrame, int]:
    """Personalized PageRank: teleport mass goes to ``seeds`` (a
    DataFrame with an ``id`` column) instead of uniformly everywhere —
    the similarity/recommendation primitive an embedding-pipeline user
    reaches for next to the random-walk corpus. Returns
    ((id, rank), iterations_run).

        tele(v)  = 1/|S| if v in S else 0
        rank_0   = tele
        rank_k+1 = (1-d + d*dangling_k) * tele + d * Σ_{u→v} rank_k(u)/outdeg(u)

    Dangling mass is redistributed to the TELEPORT vector (not
    uniformly), the standard PPR formulation, so Σ rank stays 1 and
    ranks are exactly 0 outside the seeds' reachable set. Same
    superstep engine as pagerank_standard: observed delta + dangling on
    the materialize job, size-aware broadcasts, gather-aligned edge
    cache, salting seam. ``tol=0.0`` never converges early — with
    ``max_iters=k`` that is the fixed-depth form external fixed-k
    oracles replay.
    """
    # one materialized (id, outdeg, indeg) preamble frame (see
    # pagerank_standard): vertex set, scatter degrees, and hub keys in
    # a single shuffle, executed once
    base = materialize(_degrees_with_indeg(edges, vertices))
    n = base.count()
    if n == 0:
        return base.select("id", F.lit(0.0).alias("rank")), 0
    # intersect the seeds with the vertex set BEFORE sizing 1/|S|:
    # an unknown seed id would otherwise keep a share of teleport mass
    # that the state join then drops, deflating every rank and breaking
    # the sum-to-1 invariant this docstring promises
    seed_set = (
        seeds.select(F.col("id").alias("sid")).distinct()
        .join(base.select(F.col("id").alias("sid")), "sid", "left_semi")
    )
    n_seeds = seed_set.count()
    if n_seeds == 0:
        raise ValueError(
            "pagerank_personalized needs a non-empty seed set intersecting the graph's vertices"
        )
    state = (
        base.join(seed_set, base["id"] == seed_set["sid"], "left")
        .select(
            "id",
            "outdeg",
            F.when(F.col("sid").isNotNull(), F.lit(1.0 / n_seeds))
            .otherwise(F.lit(0.0))
            .alias("tele"),
        )
        .withColumn("rank", F.col("tele"))
        .withColumn("prev", F.lit(0.0))
    )

    start_it = 0
    resumed = False
    if ctx is not None:
        rp = ctx.resume_point_at_most(max_iters)
        if rp is not None:
            start_it, state = rp
            resumed = True
            rec = next((m for m in reversed(ctx.metrics()) if m["superstep"] == start_it), {})
            if rec.get("delta") is not None and rec["delta"] < tol:
                return state.select("id", "rank"), start_it
    if start_it == 0:
        # the seed join is not a thin projection over the cached base —
        # checkpoint it so superstep 1 doesn't execute it twice
        state = materialize(state, ctx, 0) if ctx else state.localCheckpoint(eager=True)

    salted, hubs = False, None
    if hub_threshold is not None:
        if resumed:
            edges, salted, hubs = _hub_tagged(edges, hub_threshold)
        else:
            salted, hubs = pick_hub_keys(
                state_keys=base.filter(F.col("indeg") > hub_threshold).select(F.col("id").alias("dst"))
            )
            if salted:
                edges = tag_hubs(edges, hubs)
    prepared = prepare_gather_edges(edges, n, salted)
    owned_cache = prepared is not edges
    edges = prepared

    dangling = state.filter(F.col("outdeg") == 0).agg(F.sum("rank")).collect()[0][0] or 0.0

    it = start_it
    for it in range(start_it + 1, max_iters + 1):
        t0 = time.time()
        st = maybe_broadcast(state, n)
        msg_cols = [edges["dst"], (F.col("rank") / F.col("outdeg")).alias("msg")] + (
            [edges[HUB_FLAG]] if salted else []
        )
        msgs = edges.join(st, edges["src"] == st["id"]).select(*msg_cols)
        if salted:
            agg = skewed_gather(msgs, "dst", [("sum", "msg", "contrib")], n_salts)
        else:
            agg = msgs.groupBy("dst").agg(F.sum("msg").alias("contrib"))
        state = (
            merge_join(state, agg, state["id"] == agg["dst"], n)
            .select(
                "id",
                "outdeg",
                "tele",
                F.col("rank").alias("prev"),
                (
                    (1.0 - d + d * dangling) * F.col("tele")
                    + d * F.coalesce("contrib", F.lit(0.0))
                ).alias("rank"),
            )
        )
        state, om = materialize_observed(
            state,
            [
                F.max(F.abs(F.col("rank") - F.col("prev"))).alias("delta"),
                F.sum(F.when(F.col("outdeg") == 0, F.col("rank")).otherwise(F.lit(0.0))).alias("dangling"),
            ],
            ctx,
            it,
        )
        delta, dangling = float(om["delta"] or 0.0), float(om["dangling"] or 0.0)
        if ctx is not None:
            ctx.commit(it, active=n, delta=delta, wall_s=time.time() - t0, lineage=ctx.lineage_of(state))
        if delta < tol:
            break
    if owned_cache:
        edges.unpersist()
    if hubs is not None:
        hubs.unpersist()
    return state.select("id", "rank"), it
