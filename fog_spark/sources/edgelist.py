"""SNAP-format graph text sources (the ``convert`` input formats).

- edgelist: ``src\\tdst`` per line, ``#`` comments
  (reference: convert/process_edgelist.cpp:347-362) — S1.
- adjlist: ``src n d1 d2 ... dn`` per line
  (reference: convert/process_adjlist.cpp:32-271) — S2.

FOG's converter also radix-sorts / k-way-merges the input into CSR
files (S3-S5); in Spark the shuffle IS the external sort, so those 1200
lines of C++ reduce to a repartition. Weights are deterministic
(FIXTURES.md §2) instead of FOG's rand-in-[0,10)
(convert/process_adjlist.cpp:25-30).

``write_graph_meta`` replaces the ``.desc`` INI (convert/convert.cpp:145-153)
with a one-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _with_weight(df: DataFrame) -> DataFrame:
    return df.select(
        "src", "dst", (((F.col("src") * 31 + F.col("dst")) % 90 + 10) / 10.0).alias("weight")
    )


def read_edgelist(spark: SparkSession, path: str) -> DataFrame:
    """SNAP tab/space-separated edge list -> (src, dst, weight)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim("value"), r"\s+")
    return _with_weight(
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(
            parts.getItem(0).cast("long").alias("src"),
            parts.getItem(1).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )


def read_adjlist(spark: SparkSession, path: str) -> DataFrame:
    """SNAP adjacency list (``src n d1 .. dn``) -> (src, dst, weight)."""
    lines = spark.read.text(path)
    parts = F.split(F.trim("value"), r"\s+")
    return _with_weight(
        lines.filter(~F.col("value").startswith("#"))
        .filter(F.trim("value") != "")
        .select(
            parts.getItem(0).cast("long").alias("src"),
            # element 1 is the degree count; destinations start at 2.
            # Slice length is computed from the row (size - 2), so a
            # vertex of ANY out-degree parses completely (a fixed literal
            # would silently truncate ultra-hubs).
            F.explode(F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0)))).alias("d"),
        )
        .select("src", F.col("d").cast("long").alias("dst"))
        .filter(F.col("dst").isNotNull())
    )


def write_graph_meta(edges: DataFrame) -> dict:
    """num_vertices/num_edges/max_out_edges — the ``.desc`` replacement."""
    deg = edges.groupBy("src").count()
    row = edges.agg(
        F.min(F.least("src", "dst")).alias("min_vertex_id"),
        F.max(F.greatest("src", "dst")).alias("max_vertex_id"),
        F.count(F.lit(1)).alias("num_of_edges"),
    ).collect()[0]
    max_out = deg.agg(F.max("count")).collect()[0][0]
    return {
        "min_vertex_id": row["min_vertex_id"],
        "max_vertex_id": row["max_vertex_id"],
        "num_of_edges": row["num_of_edges"],
        "max_out_edges": max_out,
    }
