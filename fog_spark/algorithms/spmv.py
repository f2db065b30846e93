"""SpMV — one scatter-gather iteration (GLOBAL engine).

Reference semantics (application/spmv.hpp:52-90, SURVEY §2.8):
x_0 = 1.0, y = Σ_{u→v} x(u)·w(u,v); exactly one iteration
(after_iteration stops the engine, spmv.hpp:96-100). Self-loops
participate (GLOBAL scatter). This is a single join + sum — no loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.engine.superstep import vertices_of


def spmv(edges: DataFrame, x: DataFrame | None = None, vertices: DataFrame | None = None) -> DataFrame:
    """Returns (id, spmv_value). ``x`` is (id, x) — defaults to all-ones."""
    vertices = vertices if vertices is not None else vertices_of(edges)
    if x is None:
        x = vertices.select("id", F.lit(1.0).alias("x"))
    msgs = edges.join(x, edges["src"] == x["id"]).select(
        edges["dst"], (F.col("x") * F.col("weight")).alias("m")
    )
    agg = msgs.groupBy("dst").agg(F.sum("m").alias("y"))
    return (
        vertices.join(agg, vertices["id"] == agg["dst"], "left")
        .select(vertices["id"], F.coalesce("y", F.lit(0.0)).alias("spmv_value"))
    )
