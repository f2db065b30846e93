"""Exact triangle counting by degree-ordered orientation.

Absent in FOG (listed as unbuilt future work, TODO.list:17-18); required
by the north_rule. Classic distributed formulation (the one used by
every MPP engine): orient each undirected edge from the lower-(degree,
id) endpoint to the higher, so every triangle is counted exactly once as
a directed 2-path a→b, b→c closed by a→c, and — crucially for power-law
graphs — hub vertices get LOW out-degree in the oriented graph, which
bounds the wedge join's skew by sqrt(m) instead of max-degree.

Pure DataFrame equi-joins; no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.superstep import vertices_of


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected simple edges oriented by (degree, id)."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v")).unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    lt = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (F.col("a") < F.col("b"))
    )
    return (
        und.join(da, F.col("a") == F.col("da.v"))
        .join(db, F.col("b") == F.col("db.v"))
        .select(
            F.when(lt, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lt, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )


def triangle_counts(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Returns (id, tri_count) — per-vertex triangle membership. Exact.

    Total = sum(tri_count) / 3 (each triangle touches 3 vertices);
    see triangle_total for the scalar.
    """
    vertices = vertices if vertices is not None else vertices_of(edges)
    # sort-merge hints: the oriented table is ~m/2 rows; broadcasting it
    # is a driver-side hash build that degrades unpredictably and cannot
    # work at 10^12 edges. SMJ shuffles by the join key and scales out.
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y")).hint("merge")
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z")).hint("merge")
    # closure join: SHUFFLE_HASH, not merge — the wedge stream is O(sum
    # deg_oriented^2) rows and must not be sorted; hashing the (small)
    # edge side per partition probes the wedges in one streaming pass.
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z")).hint("shuffle_hash")
    tris = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    member = (
        tris.select(F.col("x").alias("id"))
        .unionByName(tris.select(F.col("y").alias("id")))
        .unionByName(tris.select(F.col("z").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("cnt"))
    )
    out = (
        vertices.join(member, "id", "left")
        .select(vertices["id"], F.coalesce("cnt", F.lit(0)).cast("long").alias("tri_count"))
    )
    # materialize so the oriented-edge cache can be released now instead
    # of leaking for the session lifetime
    out = out.localCheckpoint(eager=True)
    o.unpersist()
    return out


def triangle_total(edges: DataFrame) -> int:
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y")).hint("merge")
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z")).hint("merge")
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z")).hint("shuffle_hash")
    n = e1.join(e2, "y").join(e3, ["x", "z"]).count()
    o.unpersist()
    return int(n)


def four_clique_total(edges: DataFrame) -> DataFrame:
    """1-row (n_4cliques): exact 4-clique count of the undirected simple
    graph. Same degree-ordered orientation as triangle_counts — in the
    oriented DAG every 4-clique appears exactly once as a<b<c<d (rank
    order) with all six edges pointing up, so the count is the oriented
    triangle stream extended by one more out-neighbor of the top vertex
    and two EXISTS probes. The orientation keeps hub out-degrees ~sqrt(m),
    which bounds both the wedge and the extension fan-out on power-law
    graphs (the reason this shape survives web-scale inputs where a naive
    4-way enumeration does not)."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y")).hint("merge")
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z")).hint("merge")
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z")).hint("shuffle_hash")
    tris = e1.join(e2, "y").join(e3, ["x", "z"]).select("x", "y", "z")
    ext = tris.join(
        o.select(F.col("lo").alias("z"), F.col("hi").alias("w")).hint("shuffle_hash"), "z"
    )
    c1 = ext.join(o.select(F.col("lo").alias("y"), F.col("hi").alias("w")), ["y", "w"], "left_semi")
    c2 = c1.join(o.select(F.col("lo").alias("x"), F.col("hi").alias("w")), ["x", "w"], "left_semi")
    out = c2.agg(F.count(F.lit(1)).cast("long").alias("n_4cliques")).localCheckpoint(eager=True)
    o.unpersist()
    return out
