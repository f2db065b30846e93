"""Strongly connected components — trim + forward/backward label rounds.

The reference's SCC (application/scc.hpp, SURVEY §2.8) alternates a
forward min-label propagation with a backward confirmation pass, inside
the engine's outer global loop, after trimming degree-0 vertices into
singleton SCCs at init (scc.hpp:48-55). This module is the same
choreography as DataFrame supersteps:

outer round (on the still-unassigned subgraph):
  1. TRIM: vertices with no in- or out-edges within the subgraph are
     singleton SCCs (iterate until none — a strict superset of FOG's
     one-shot init trim, same fixed point).
  2. FORWARD: hash-min labels along out-edges to fixed point;
     fwd(v) = min id that reaches v.
  3. BACKWARD: vertices whose own id equals their forward label are
     roots; confirmation propagates along REVERSED edges, but only
     across endpoints sharing the same forward label (scc.hpp:157-167's
     "absorb iff update.root == prev_root" match-detect).
     Confirmed vertices form SCC(root); assign scc = fwd label.
  4. Remove assigned vertices; repeat.

Labels are the min vertex id of each SCC — exact-match against the
Tarjan oracle. Each outer round peels at least one SCC, and all inner
loops are frontier supersteps bounded by graph diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.superstep import materialize, vertices_of, with_frontier_hint


def _hash_min_fixed_point(edges: DataFrame, vertices: DataFrame, max_iters: int = 500) -> DataFrame:
    """fwd(v) = min vertex id reaching v along directed edges (incl. itself)."""
    state = vertices.select("id", F.col("id").alias("lbl"), F.lit(True).alias("changed"))
    state = materialize(state)
    active = state.count()
    for _ in range(max_iters):
        if active == 0:
            break
        frontier = with_frontier_hint(state.filter("changed").select("id", "lbl"), active)
        agg = (
            edges.join(frontier, edges["src"] == frontier["id"])
            .groupBy("dst")
            .agg(F.min("lbl").alias("cand"))
        )
        state = state.join(agg, state["id"] == agg["dst"], "left").select(
            "id",
            F.least("lbl", F.coalesce("cand", F.col("lbl"))).alias("lbl"),
            (F.coalesce("cand", F.col("lbl")) < F.col("lbl")).alias("changed"),
        )
        state = materialize(state)
        active = state.filter("changed").count()
    return state.select("id", "lbl")


def strongly_connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_outer: int = 100,
) -> DataFrame:
    """Returns (id, component) with component = min id of the SCC. Exact."""
    spark = edges.sparkSession
    vertices = vertices if vertices is not None else vertices_of(edges)
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst")

    remaining = materialize(vertices.select("id"))
    assigned_parts: list[DataFrame] = []

    for _ in range(max_outer):
        n_rem = remaining.count()
        if n_rem == 0:
            break
        sub = (
            e.join(remaining.select(F.col("id").alias("src")), "src", "left_semi")
            .join(remaining.select(F.col("id").alias("dst")), "dst", "left_semi")
        )
        sub = materialize(sub.select("src", "dst"))

        # 1. iterative trim: no in-edge or no out-edge in the subgraph
        while True:
            srcs = sub.select(F.col("src").alias("id")).distinct()
            dsts = sub.select(F.col("dst").alias("id")).distinct()
            both = srcs.join(dsts, "id", "inner")
            trimmed = remaining.join(both, "id", "left_anti").select(
                "id", F.col("id").alias("component")
            )
            trimmed = materialize(trimmed)
            if trimmed.count() == 0:
                break
            assigned_parts.append(trimmed)
            remaining = materialize(remaining.join(trimmed, "id", "left_anti"))
            sub = materialize(
                sub.join(remaining.select(F.col("id").alias("src")), "src", "left_semi")
                .join(remaining.select(F.col("id").alias("dst")), "dst", "left_semi")
            )
        if remaining.count() == 0:
            break

        # 2. forward hash-min to fixed point on the trimmed subgraph
        fwd = _hash_min_fixed_point(sub, remaining)

        # 3. backward confirmation within equal-label islands
        rev = sub.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        lbl_src = fwd.select(F.col("id").alias("src"), F.col("lbl").alias("ls"))
        lbl_dst = fwd.select(F.col("id").alias("dst"), F.col("lbl").alias("ld"))
        rev_same = materialize(
            rev.join(lbl_src, "src").join(lbl_dst, "dst").filter("ls = ld").select("src", "dst")
        )
        conf = fwd.select("id", "lbl", (F.col("id") == F.col("lbl")).alias("confirmed"))
        conf = materialize(conf)
        frontier_n = conf.filter("confirmed").count()
        newly = conf.filter("confirmed")
        while frontier_n > 0:
            fr = with_frontier_hint(newly.select(F.col("id").alias("src")), frontier_n)
            reached = rev_same.join(fr, "src", "left_semi").select(F.col("dst").alias("id")).distinct()
            nxt = conf.join(reached, "id", "left_semi").filter(~F.col("confirmed"))
            conf = conf.join(
                nxt.select("id", F.lit(True).alias("c2")), "id", "left"
            ).select("id", "lbl", (F.col("confirmed") | F.coalesce("c2", F.lit(False))).alias("confirmed"))
            conf = materialize(conf)
            newly = materialize(nxt.select("id", "lbl", F.lit(True).alias("confirmed")))
            frontier_n = newly.count()

        done = conf.filter("confirmed").select("id", F.col("lbl").alias("component"))
        done = materialize(done)
        assigned_parts.append(done)
        remaining = materialize(remaining.join(done, "id", "left_anti"))

    if remaining.count() > 0:
        raise RuntimeError(
            f"SCC did not converge within max_outer={max_outer} rounds; "
            "raise max_outer (a partial result would silently drop vertices)"
        )
    if not assigned_parts:  # empty graph
        return vertices.select("id", F.col("id").alias("component"))
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionByName(p)
    return out
