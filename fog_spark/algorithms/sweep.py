"""Local graph clustering: PPR sweep cut (Andersen-Chung-Lang 2006).

The canonical "find the community around this page" primitive: rank
vertices by personalized-PageRank score normalized by degree, then
sweep prefixes of that order and score each prefix set S by its
conductance phi(S) = cut(S) / min(vol(S), vol(V \\ S)); the minimum of
the curve is the local cluster.

Scale shape: the sweep is restricted to the TOP-K scored vertices
(K ~ tens), so the curve itself is driver-scale — the only full-graph
work is the PPR (the shared superstep engine) and degree/edge joins
against the broadcastable top-K frame. The incremental-cut identity
makes the curve one prefix sum: adding vertex v changes the cut by
deg(v) - 2 * |edges from v into the prefix|, and the per-vertex
"edges into earlier-ranked members" count is a single broadcast join
over the undirected edge list. Nothing here sorts or windows |V| rows
globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sweep_cut(
    ranks: DataFrame,
    edges: DataFrame,
    topk: int = 64,
) -> DataFrame:
    """(k, id, phi_r): the conductance sweep curve over the top-``topk``
    vertices of ``ranks`` (id, rank), ordered by round(rank/deg, 9)
    descending with id tie-break, on the SYMMETRIZED simple graph of
    ``edges``. phi is rounded to 6 decimals.

    When the prefix reaches the full graph volume (vol == 2m, e.g.
    topk >= coverage on a small graph), conductance is undefined —
    min(vol, 2m - vol) = 0 — and ``phi_r`` is NULL for those rows by
    design (the DuckDB oracle computes the identical NULL)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    two_m = und.count() * 2

    scored = ranks.join(deg, "id").select(
        "id", "deg", F.round(F.col("rank") / F.col("deg"), 9).alias("score")
    )
    top = F.broadcast(
        scored.orderBy(F.desc("score"), F.asc("id"))
        .limit(topk)
        .withColumn(
            "k", F.row_number().over(Window.orderBy(F.desc("score"), F.asc("id")))
        )
        .select("id", "deg", "k")
    )
    # edges with BOTH endpoints in the top-K: each contributes one
    # "into the prefix" unit to its later-ranked endpoint
    ta = top.select(F.col("id").alias("a"), F.col("k").alias("ka"))
    tb = top.select(F.col("id").alias("b"), F.col("k").alias("kb"))
    internal = und.join(ta, "a").join(tb, "b").select(
        F.greatest("ka", "kb").alias("k")
    )
    e_in = internal.groupBy("k").agg(F.count(F.lit(1)).alias("e_in"))

    curve = top.join(e_in, "k", "left").select(
        "k",
        "id",
        "deg",
        F.coalesce("e_in", F.lit(0)).alias("e_in"),
    )
    w = Window.orderBy("k")  # top-K rows only: a driver-scale window
    vol = F.sum("deg").over(w)
    cut = F.sum(F.col("deg") - 2 * F.col("e_in")).over(w)
    return curve.select(
        "k",
        "id",
        F.round(cut / F.least(vol, F.lit(two_m) - vol), 6).alias("phi_r"),
    )
