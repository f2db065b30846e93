"""Similarity search over an embedding column (array<float>).

Two paths:

- ``brute_force_topk``: exact cosine top-k via a join + window. The
  dot product stays JVM-side (zip_with + aggregate fold). Quadratic —
  the correctness baseline and the small-side path.
- ``lsh_ann_topk``: random-hyperplane LSH buckets; each query only
  scores candidates sharing a bucket — the 100 TB path. Hyperplanes are
  deterministic (seeded NumPy), broadcast as literal arrays, and the
  projection is computed by a vectorized pandas UDF over Arrow batches
  (NumPy matmul per batch, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T
from pyspark.sql.functions import pandas_udf


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def with_norm(embs: DataFrame, id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    return embs.select(
        F.col(id_col).alias("id"),
        F.col(emb_col).alias("emb"),
        F.sqrt(_dot(F.col(emb_col), F.col(emb_col))).alias("nrm"),
    )


def brute_force_topk(
    embs: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, nn_id, cos): exact top-k cosine neighbors."""
    base = with_norm(embs, id_col, emb_col)
    q = base if queries is None else with_norm(queries, id_col, emb_col)
    a = q.select(F.col("id").alias("query_id"), F.col("emb").alias("qe"), F.col("nrm").alias("qn"))
    b = base.select(F.col("id").alias("nn_id"), F.col("emb").alias("be"), F.col("nrm").alias("bn"))
    scored = (
        a.crossJoin(b)
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id", (_dot(F.col("qe"), F.col("be")) / (F.col("qn") * F.col("bn"))).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_ann_topk(
    embs: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """(query_id, rank, nn_id, cos): approximate top-k via sign-LSH.

    n_tables independent hash tables of n_planes bits each; candidates =
    vectors sharing a bucket in ANY table. Recall grows with tables;
    bucket-local joins keep work linear in Σ bucket².

    100 TB hygiene (each of these was a scale-killer):
    - hyperplanes are regenerated deterministically from (dim, seed)
      INSIDE the pandas UDF using the Arrow batch's own dimensionality —
      no driver-side first() row fetch, nothing broadcast;
    - buckets larger than ``max_bucket`` are dropped before the
      candidate join (mirrors dedup.minhash_lsh_candidates): one
      degenerate bucket (e.g. the all-zeros region) would otherwise be
      a quadratic self-join;
    - candidate pairs are deduped on (query_id, nn_id) IDS ONLY, and
      embeddings re-joined afterwards — a distinct over rows carrying
      two full float arrays shuffles the corpus once per candidate.
    """

    @pandas_udf(T.ArrayType(T.LongType()))
    def bucket_ids(embcol: pd.Series) -> pd.Series:
        mat = np.vstack(embcol.to_numpy())  # (batch, dim) — one matmul per Arrow batch
        planes = [_hyperplanes(mat.shape[1], n_planes, seed + t) for t in range(n_tables)]
        out = []
        sigs = [(mat @ p.T) > 0 for p in planes]  # list of (batch, n_planes) bools
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = [s.astype(np.int64) @ weights for s in sigs]
        for i in range(mat.shape[0]):
            out.append([int(t) << 32 | int(codes[t][i]) for t in range(n_tables)])
        return pd.Series(out)

    base = with_norm(embs, id_col, emb_col).withColumn("buckets", bucket_ids(F.col("emb")))
    exploded = base.select("id", F.explode("buckets").alias("bkt"))
    sizes = exploded.groupBy("bkt").agg(F.count(F.lit(1)).alias("n"))
    small = exploded.join(sizes.filter(F.col("n") <= max_bucket).select("bkt"), "bkt")
    a = small.select("bkt", F.col("id").alias("query_id"))
    b = small.select("bkt", F.col("id").alias("nn_id"))
    cand = (
        a.join(b, "bkt")
        .where(F.col("query_id") != F.col("nn_id"))
        .select("query_id", "nn_id")
        .distinct()
    )
    qe = base.select(F.col("id").alias("query_id"), F.col("emb").alias("qe"), F.col("nrm").alias("qn"))
    be = base.select(F.col("id").alias("nn_id"), F.col("emb").alias("be"), F.col("nrm").alias("bn"))
    scored = (
        cand.join(qe, "query_id")
        .join(be, "nn_id")
        .select(
            "query_id", "nn_id", (_dot(F.col("qe"), F.col("be")) / (F.col("qn") * F.col("bn"))).alias("cos")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
