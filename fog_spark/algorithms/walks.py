"""Deterministic random-walk corpus generation (training-pipeline op).

Graph-embedding pipelines (DeepWalk/node2vec-style) consume a corpus of
random walks. At 100 TB the walk generation itself must be a
distributed set operation, and for testability the "randomness" here is
a hash: step t of walk w moves to neighbor index

    md5(walk_id || '-' || t || '-' || seed)[:8 hex] mod outdeg(cur)

over an adjacency indexed by ``row_number() per src ordered by dst``.
Both ingredients are plain SQL, so an external oracle can replay every
walk exactly — while the statistical properties match a uniform
neighbor pick (md5 is uniform over the index range).

Plan shape: the adjacency (src, idx, dst, outdeg) is built once (one
window shuffle); each step is ONE equi-join of the current frontier
(|walks| rows) against it on (cur, idx) — no gather, no explode of
whole neighborhoods. Walks stop early at sink vertices (no out-edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _hash_idx(walk_id, step: int, seed: int):
    # first 8 md5 hex chars as an integer: < 2^32, positive on both
    # Spark (conv base 16) and DuckDB (digit-fold) — see the oracle SQL
    h = F.md5(F.concat_ws("-", walk_id, F.lit(step), F.lit(seed)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def indexed_adjacency(edges: DataFrame) -> DataFrame:
    """(src, idx, dst, outdeg): dedup'd out-adjacency with a dense
    0-based per-source index ordered by dst (the determinism contract)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return (
        e.withColumn("idx", F.row_number().over(w) - 1)
        .withColumn("outdeg", F.count(F.lit(1)).over(Window.partitionBy("src")))
    )


def random_walks(
    edges: DataFrame,
    length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 42,
    vertices: DataFrame | None = None,
) -> DataFrame:
    """(walk_id, step, vertex): ``walks_per_vertex`` hash-driven walks
    from every vertex, each up to ``length`` steps (ending early at
    sinks). walk_id = start_vertex * walks_per_vertex + replica."""
    adj = indexed_adjacency(edges)
    if vertices is None:
        from fog_spark.engine.superstep import vertices_of

        vertices = vertices_of(edges)
    starts = vertices.select(
        F.explode(
            F.array(*[F.lit(r) for r in range(walks_per_vertex)])
        ).alias("rep"),
        F.col("id").alias("vertex"),
    ).select(
        (F.col("vertex") * walks_per_vertex + F.col("rep")).alias("walk_id"),
        F.lit(0).alias("step"),
        "vertex",
    )
    parts = [starts]
    cur = starts
    for t in range(1, length + 1):
        pick = _hash_idx(F.col("walk_id"), t, seed)
        nxt = (
            cur.join(adj, cur["vertex"] == adj["src"])
            .where(F.pmod(pick, F.col("outdeg")) == F.col("idx"))
            .select("walk_id", F.lit(t).alias("step"), F.col("dst").alias("vertex"))
        )
        parts.append(nxt)
        cur = nxt
    while len(parts) > 1:  # halving unions keep the plan shallow
        parts = [
            parts[i].unionByName(parts[i + 1]) if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]
