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
    o = _oriented(edges).persist()
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .join(
            e3,
            (F.col("e1.lo") == F.col("e3.lo")) & (F.col("e2.hi") == F.col("e3.hi")),
        )
        .select(F.col("e1.lo").alias("x"), F.col("e1.hi").alias("y"), F.col("e2.hi").alias("z"))
    )
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
    return out


def triangle_total(edges: DataFrame) -> int:
    o = _oriented(edges)
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    n = (
        e1.join(e2, F.col("e1.hi") == F.col("e2.lo"))
        .join(e3, (F.col("e1.lo") == F.col("e3.lo")) & (F.col("e2.hi") == F.col("e3.hi")))
        .count()
    )
    return int(n)
