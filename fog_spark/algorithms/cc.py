"""Connected components by hash-min label propagation (WCC).

Reference semantics (SURVEY §2.8, application/cc.hpp:36-133): labels
start as own id; rounds alternate a forward pass over out-edges and a
backward pass over in-edges with a MIN gather; improved vertices
re-activate; fixed point = min vertex id of the weakly-connected
component. One pass per round over the SYMMETRIZED edge table converges
to the identical labels (and is how a distributed engine should do it —
no second reverse-CSR copy, reference convert/process_in_edge.cpp made
one on disk).

TARGET-engine frontier scheduling (fogsrc/fog_engine.cpp:159-209):
only changed vertices scatter; terminate when the frontier empties.
The frontier join is broadcast-hinted when it fits.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.superstep import (
    materialize,
    maybe_broadcast,
    symmetrize,
    vertices_of,
    with_frontier_hint,
)


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 200,
    ctx=None,
) -> DataFrame:
    """Returns (id, component) — component = min id of the WCC. Exact."""
    vertices = vertices if vertices is not None else vertices_of(edges)
    sym = symmetrize(edges)  # self-loops dropped: TARGET rule cpu_thread.cpp:236-240

    # state carries a `changed` flag; the frontier is a projection of it.
    state = vertices.select("id", F.col("id").alias("comp"), F.lit(True).alias("changed"))
    start_step = 0
    if ctx is not None:
        rp = ctx.resume_point()
        if rp is not None:
            start_step, state = rp  # changed flag persisted -> frontier restored
    if start_step == 0:
        state = materialize(state, ctx, 0)
    active = state.filter("changed").count() if start_step else state.count()

    for step in range(start_step + 1, max_iters + 1):
        if active == 0:
            break
        t0 = time.time()
        frontier = with_frontier_hint(state.filter("changed").select("id", "comp"), active)
        msgs = sym.join(frontier, sym["src"] == frontier["id"]).select(sym["dst"], "comp")
        agg = msgs.groupBy("dst").agg(F.min("comp").alias("new_comp"))
        state = (
            # fan-out guard: the agg can have far more rows than the
            # frontier (hub out-neighborhoods), so scale the estimate
            state.join(maybe_broadcast(agg, active * 64), state["id"] == agg["dst"], "left")
            .select(
                "id",
                F.least("comp", F.coalesce("new_comp", F.col("comp"))).alias("comp"),
                (F.coalesce("new_comp", F.col("comp")) < F.col("comp")).alias("changed"),
            )
        )
        state = materialize(state, ctx, step)
        active = state.filter("changed").count()
        if ctx is not None:
            ctx.commit(step, active=active, delta=None, wall_s=time.time() - t0, lineage=ctx.lineage_of(state))

    return state.select("id", F.col("comp").alias("component"))
