"""Influence spread under the independent-cascade model with
DETERMINISTIC hash-sampled edge activations.

IC (Kempe-Kleinberg-Tardos 2003): each directed edge fires
independently with probability p; a seed's influence in one sample is
the size of its reachable set over the fired edges. Instead of RNG
state (irreproducible across engines and retried tasks), an edge
(s, d) is active in sample k iff

    fold52(md5("s-d-k"))  <  p * 2^32        (8 hex chars, < 2^32)

— the same cross-engine md5-fold trick that drives the walk engine and
the KMV sketch (replayable digit-by-digit in DuckDB), so every sample
is a pure function of the edge table. Per sample the spread is one
``multi_source_bfs`` over the filtered edge frame: sparse (id, root)
state, frontier supersteps, no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.algorithms.msbfs import multi_source_bfs

HASH_DEN = 2**32


def active_edges(edges: DataFrame, sample: int, p_num: int) -> DataFrame:
    """The deterministic sample-``sample`` subgraph: edges whose
    md5-fold draw lands below ``p_num`` (out of 2^32)."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.col("src"), F.col("dst"), F.lit(sample))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return edges.filter(F.col("src") != F.col("dst")).filter(hv < F.lit(p_num))


def influence_spread(
    edges: DataFrame,
    seeds: DataFrame,
    p_num: int,
    samples: int = 3,
) -> DataFrame:
    """(seed, sample, reach): per cascade sample, the number of
    vertices each seed reaches (itself included) over the hash-activated
    subgraph. ``seeds`` is a DataFrame with a ``root`` column; duplicate
    roots (e.g. CLI --seeds 3,3) are deduped so they neither seed
    duplicate BFS state nor emit duplicate output rows."""
    seeds = seeds.select("root").distinct()
    out = None
    for k in range(samples):
        sub = active_edges(edges, k, p_num)
        reached = multi_source_bfs(sub, seeds.select("root"))
        per_seed = (
            seeds.select(F.col("root").alias("seed"))
            .join(
                reached.groupBy(F.col("root").alias("seed")).agg(
                    F.count(F.lit(1)).alias("reach")
                ),
                "seed",
                "left",
            )
            .select(
                "seed",
                F.lit(k).alias("sample"),
                F.coalesce("reach", F.lit(1)).alias("reach"),
            )
        )
        out = per_seed if out is None else out.unionByName(per_seed)
    return out


def percolation_curve(
    edges: DataFrame,
    p_nums: list[int],
    sample: int = 0,
) -> DataFrame:
    """(p_num, n_edges, n_components, max_component): bond-percolation
    robustness readout — at each retention threshold (out of 2^32),
    keep the hash-activated edge subset (same deterministic md5-fold
    draws as the cascade sampler) and summarize its weak-component
    structure. Each level is one hash-min CC fixed point over the
    surviving subgraph; the curve's rows are driver-scale."""
    from fog_spark.algorithms.cc import connected_components

    spark = edges.sparkSession
    out = []
    for p_num in p_nums:
        sub = active_edges(edges, sample, p_num)
        n_edges = sub.count()
        if n_edges == 0:
            out.append((p_num, 0, 0, 0))
            continue
        comps = connected_components(sub)
        row = (
            comps.groupBy("component")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("nc"),
                F.max("n").alias("mx"),
            )
            .collect()[0]
        )
        out.append((p_num, n_edges, int(row["nc"]), int(row["mx"])))
    return spark.createDataFrame(
        out, "p_num long, n_edges long, n_components long, max_component long"
    )
