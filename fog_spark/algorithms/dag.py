"""Condensation DAG + longest-path topological layering (build levels).

For a directed dependency graph (code imports, package requires — the
repo link graph this engine derives), the canonical scheduling question
is "what can build in parallel, and in what order": collapse cyclic
clusters (SCCs, algorithms/scc.py — reference application/scc.hpp
semantics) into super-vertices, then layer the acyclic condensation by
longest path —

    level(c) = 0                      if c has no predecessor
    level(c) = 1 + max(level(pred))   otherwise

Level k is the k-th parallel build wave; max(level) is the critical
path. Not an app in FOG (fogsrc/main.cpp:51-135 lists its programs);
it composes the engine's SCC with a MAX-relaxation superstep loop (the
structural twin of BFS's MIN gather, A3 in SURVEY §2.5).

Scale shape: condensation is two keyed joins + one distinct, all keyed
by vertex/component id. Each level round is one gather join + a
groupBy-max + a left-outer merge over |C| component rows; convergence
(no level grew) rides the materialize job as an observed metric — one
Spark job per round. Round count = critical-path length of the
condensation, not |V|. The loop raises if rounds exceed |C| (a cycle
in `components`, i.e. a non-SCC labeling was passed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.superstep import (
    active_metric,
    materialize,
    materialize_observed,
    maybe_broadcast,
)


def condensation(edges: DataFrame, components: DataFrame) -> DataFrame:
    """Distinct super-edges (src, dst) between DIFFERENT components.

    ``edges``: directed (src, dst); ``components``: (id, component)
    covering every endpoint. Two hash joins + one distinct, keyed on
    vertex then (component, component).
    """
    cs = components.select(F.col("id").alias("src"), F.col("component").alias("cs"))
    cd = components.select(F.col("id").alias("dst"), F.col("component").alias("cd"))
    return (
        edges.select("src", "dst")
        .join(cs, "src")
        .join(cd, "dst")
        .where(F.col("cs") != F.col("cd"))
        .select(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .distinct()
    )


def topo_levels(
    edges: DataFrame,
    components: DataFrame | None = None,
    ctx=None,
) -> DataFrame:
    """(id, component, level): longest-path layer of each vertex's SCC
    in the condensation DAG.

    ``components`` defaults to the engine's convergent SCC labeling;
    pass a precomputed (id, component) frame to reuse one. Runs the
    MAX-relaxation to its fixed point (level growth is monotone and
    bounded by the critical path, so termination is guaranteed on a
    true condensation; a cyclic labeling is detected and raised).
    """
    if components is None:
        from fog_spark.algorithms.scc import strongly_connected_components

        components = strongly_connected_components(edges).select("id", "component")
    comp = materialize(components)
    cedges = materialize(condensation(edges, comp)).persist()

    state = comp.select(F.col("component").alias("c")).distinct().select(
        "c", F.lit(0).cast("long").alias("level")
    )
    n_comp = state.count()  # one scan; also sizes the broadcast hint
    state = materialize(state)

    rounds = 0
    while True:
        rounds += 1
        if rounds > n_comp + 1:
            raise ValueError(
                "topo_levels did not converge within |C| rounds — "
                "`components` is not an SCC labeling (condensation has a cycle)"
            )
        upd = (
            cedges.join(
                maybe_broadcast(state.select(F.col("c").alias("src"), "level"), n_comp),
                "src",
            )
            .groupBy(F.col("dst").alias("c"))
            .agg((F.max("level") + 1).alias("m"))
        )
        nxt = (
            state.join(upd, "c", "left")
            .select(
                "c",
                F.greatest("level", F.coalesce("m", F.col("level"))).alias("level"),
                (F.coalesce("m", F.lit(0)) > F.col("level")).alias("changed"),
            )
        )
        nxt, metrics = materialize_observed(
            nxt.select("c", "level", "changed"), [active_metric()], ctx, rounds
        )
        state = nxt.select("c", "level")
        if metrics["active"] == 0:
            break

    out = comp.join(
        state.select(F.col("c").alias("component"), "level"), "component"
    ).select("id", "component", "level")
    cedges.unpersist()
    return out
