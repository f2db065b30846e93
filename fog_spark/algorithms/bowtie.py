"""Bowtie decomposition of a directed graph (Broder et al. 2000,
"Graph structure in the Web", WWW9).

The classic web-graph macro-structure: the largest SCC is the CORE;
IN reaches the core, OUT is reached from it, TUBEs run IN->OUT around
the core, TENDRILs hang off IN (unable to reach the core) or feed OUT
(unreachable from the core), and DISC is everything else.

The reference engine ships the ingredients (SCC via fwd/bwd label
rounds, application/scc.hpp:22-207; BFS frontier supersteps,
application/bfs.hpp:38-100) but not the composition; this module is
the composition, Spark-first:

1. ``strongly_connected_components`` -> per-vertex component labels;
   the CORE is the largest component (ties: smallest label), a single
   1-row driver aggregate.
2. Four boolean-flag reachability fixed points (visited-OR gather —
   BFS minus the levels): forward/backward from CORE, forward from
   IN, backward from OUT. A path IN -> CORE -> v puts v in OUT by
   construction, so reachability over the FULL graph classifies the
   remainder exactly as "via paths avoiding the core" — no subgraph
   restriction needed.
3. One five-flag left-join cascade assigns regions.

Every step is a frontier superstep (one Spark job each, observed
active counts) over a shared persisted edge cache; nothing here is
quadratic and no driver transfer exceeds one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.algorithms.scc import strongly_connected_components
from fog_spark.engine.superstep import (
    active_metric,
    materialize,
    materialize_observed,
    vertices_of,
    with_frontier_hint,
)

REGIONS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC")


def reachable_set(
    edges: DataFrame,
    seeds: DataFrame,
    vertices: DataFrame,
    max_iters: int = 10_000,
) -> DataFrame:
    """ids reachable from the seed set along directed edges, seeds
    included — a visited-flag frontier fixed point (TARGET engine
    pattern, one observed job per superstep).

    ``edges`` must already be lineage-cut/persisted by the caller:
    this runs up to diameter supersteps and re-reads the edge frame in
    every one of them.
    """
    seed_ids = seeds.select("id").distinct().withColumn("s", F.lit(True))
    state = vertices.join(seed_ids, "id", "left").select(
        "id",
        F.coalesce("s", F.lit(False)).alias("vis"),
        F.coalesce("s", F.lit(False)).alias("changed"),
    )
    state, om = materialize_observed(state, [active_metric()])
    active = int(om["active"] or 0)
    for _ in range(max_iters):
        if active == 0:
            break
        frontier = with_frontier_hint(state.filter("changed").select("id"), active)
        msgs = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .select(edges["dst"].alias("mid"))
            .distinct()
        )
        state = state.join(msgs, state["id"] == msgs["mid"], "left").select(
            "id",
            (F.col("vis") | F.col("mid").isNotNull()).alias("vis"),
            (~F.col("vis") & F.col("mid").isNotNull()).alias("changed"),
        )
        state, om = materialize_observed(state, [active_metric()])
        active = int(om["active"] or 0)
    return state.filter("vis").select("id")


def _flag(ids: DataFrame, name: str) -> DataFrame:
    return ids.select("id").withColumn(name, F.lit(True))


def bowtie_decomposition(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 10_000,
) -> DataFrame:
    """Returns (id, region) with region in REGIONS. Exact."""
    vertices = vertices if vertices is not None else vertices_of(edges)
    e = materialize(edges.filter(F.col("src") != F.col("dst")).select("src", "dst"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    vertices = materialize(vertices)

    scc = strongly_connected_components(e, vertices)
    core_row = (
        scc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    core_lbl = core_row[0]["component"]
    core = materialize(scc.filter(F.col("component") == F.lit(core_lbl)).select("id"))

    fwd = reachable_set(e, core, vertices, max_iters)  # CORE ∪ OUT
    bwd = reachable_set(rev, core, vertices, max_iters)  # CORE ∪ IN
    inn = materialize(bwd.join(core, "id", "left_anti"))
    outt = materialize(fwd.join(core, "id", "left_anti"))
    from_in = reachable_set(e, inn, vertices, max_iters)
    to_out = reachable_set(rev, outt, vertices, max_iters)

    flags = (
        vertices.join(_flag(core, "c"), "id", "left")
        .join(_flag(fwd, "f"), "id", "left")
        .join(_flag(bwd, "b"), "id", "left")
        .join(_flag(from_in, "fi"), "id", "left")
        .join(_flag(to_out, "t"), "id", "left")
    )
    region = (
        F.when(F.col("c"), F.lit("CORE"))
        .when(F.col("b"), F.lit("IN"))
        .when(F.col("f"), F.lit("OUT"))
        .when(F.col("fi") & F.col("t"), F.lit("TUBE"))
        .when(F.col("fi") | F.col("t"), F.lit("TENDRIL"))
        .otherwise(F.lit("DISC"))
    )
    return flags.select("id", region.alias("region"))
