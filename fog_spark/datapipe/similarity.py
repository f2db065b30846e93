"""Similarity search over an embedding column (array<float>).

Three paths:

- ``brute_force_topk``: exact cosine top-k via a join + window. The
  dot product stays JVM-side (zip_with + aggregate fold). Quadratic —
  the correctness baseline and the small-side path.
- ``lsh_ann_topk``: random-hyperplane LSH buckets; each query only
  scores candidates sharing a bucket — a 100 TB path. Hyperplanes are
  deterministic (seeded NumPy, regenerated executor-side per batch) and
  the projection is a vectorized pandas UDF over Arrow batches (NumPy
  matmul per batch, no per-row Python).
- ``ivf_topk``: inverted-file ANN — k-means-style coarse centroids
  (deterministic seeded init + a few Lloyd rounds, all DataFrame ops),
  each vector indexed under its nearest centroid, each query probed
  against its ``nprobe`` nearest centroid lists. The centroid table is
  tiny and broadcast; list scans are bucket-local joins. The other
  100 TB path, better recall/cost when the corpus clusters.

``embedding_near_dups`` is the dedup-flavored wrapper: pairs above a
cosine threshold, from either the exact product (small data) or
LSH-shortlisted candidates (scale).
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN
# ---------------------------------------------------------------------------


def _l2n(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _nearest_centroid_udf(centroids: np.ndarray):
    cn = _l2n(centroids)

    @pandas_udf(T.IntegerType())
    def assign(embcol: pd.Series) -> pd.Series:
        mat = _l2n(np.vstack(embcol.to_numpy()))
        return pd.Series(np.argmax(mat @ cn.T, axis=1).astype(np.int32))

    return assign


def train_ivf_centroids(
    embs: DataFrame,
    n_centroids: int = 16,
    rounds: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> np.ndarray:
    """Deterministic coarse quantizer: hash-seeded init + Lloyd rounds.

    The centroid table is the ONLY driver-side object (n_centroids ×
    dim floats — an IVF coarse quantizer is driver-scale by design).
    Per round, each partition reduces its vectors to per-centroid
    partial (sum, count) inside one Arrow batch pass (mapInPandas), so
    the driver combines |partitions| × n_centroids tiny rows — no
    O(n·dim) explode, no per-row Python.
    """
    base = embs.select(F.col(id_col).alias("id"), F.col(emb_col).alias("emb"))
    init = (
        base.withColumn("_h", F.md5(F.col("id").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .select("emb")
        .collect()
    )
    centroids = np.vstack([np.asarray(r["emb"], dtype=np.float64) for r in init])

    part_schema = T.StructType(
        [
            T.StructField("cid", T.IntegerType()),
            T.StructField("psum", T.ArrayType(T.DoubleType())),
            T.StructField("n", T.LongType()),
        ]
    )
    for _ in range(rounds):
        cn = _l2n(centroids)

        def partials(batches, cn=cn, k=len(centroids)):
            sums, counts = None, None
            for pdf in batches:
                mat = np.vstack(pdf["emb"].to_numpy()).astype(np.float64)
                cid = np.argmax(_l2n(mat) @ cn.T, axis=1)
                if sums is None:
                    sums = np.zeros((k, mat.shape[1]))
                    counts = np.zeros(k, dtype=np.int64)
                np.add.at(sums, cid, mat)
                np.add.at(counts, cid, 1)
            if sums is not None:
                yield pd.DataFrame(
                    {"cid": range(k), "psum": list(sums), "n": counts}
                )

        rows = base.select("emb").mapInPandas(partials, schema=part_schema).collect()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids), dtype=np.int64)
        for r in rows:
            sums[r["cid"]] += np.asarray(r["psum"])
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / counts[nz, None]  # empty lists keep old centroid
    return centroids


def ivf_topk(
    embs: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    rounds: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, nn_id, cos): approximate top-k via IVF.

    Index side: every vector lands in exactly ONE centroid list (its
    nearest), hash-partitioned by cid. Query side: each query probes
    its ``nprobe`` nearest lists. The candidate join is bucket-local on
    cid; recall grows with nprobe (nprobe == n_centroids is exact)."""
    centroids = train_ivf_centroids(embs, n_centroids, rounds, id_col, emb_col)
    cn = _l2n(centroids)
    base = with_norm(embs, id_col, emb_col)
    indexed = base.withColumn("cid", _nearest_centroid_udf(centroids)(F.col("emb")))

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_ids(embcol: pd.Series) -> pd.Series:
        mat = _l2n(np.vstack(embcol.to_numpy()))
        order = np.argsort(-(mat @ cn.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    probes = base.withColumn("cid", F.explode(probe_ids(F.col("emb"))))
    a = probes.select("cid", F.col("id").alias("query_id"), F.col("emb").alias("qe"), F.col("nrm").alias("qn"))
    b = indexed.select("cid", F.col("id").alias("nn_id"), F.col("emb").alias("be"), F.col("nrm").alias("bn"))
    scored = (
        a.join(b, "cid")
        .where(F.col("query_id") != F.col("nn_id"))
        .select(
            "query_id", "nn_id", (_dot(F.col("qe"), F.col("be")) / (F.col("qn") * F.col("bn"))).alias("cos")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("nn_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_near_dups(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(a_id, b_id, cos) with cosine >= threshold, a_id < b_id — the
    embedding-flavored near-dup detector.

    With ``candidates`` (e.g. LSH bucket pairs): verifies only those —
    the scale path. Without: exact all-pairs, small data only."""
    base = with_norm(embs, id_col, emb_col)
    a = base.select(F.col("id").alias("a_id"), F.col("emb").alias("ae"), F.col("nrm").alias("an"))
    b = base.select(F.col("id").alias("b_id"), F.col("emb").alias("be"), F.col("nrm").alias("bn"))
    if candidates is not None:
        pairs = candidates.select("a_id", "b_id").join(a, "a_id").join(b, "b_id")
    else:
        pairs = a.crossJoin(b).where(F.col("a_id") < F.col("b_id"))
    return pairs.select(
        "a_id", "b_id", (_dot(F.col("ae"), F.col("be")) / (F.col("an") * F.col("bn"))).alias("cos")
    ).where(F.col("cos") >= threshold)


def basket_cosine_topk(
    pairs: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 3,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-item co-occurrence cosine, top-k neighbors per item:

        cos(a, b) = n_ab / sqrt(n_a * n_b)

    with n_x = #baskets containing x and n_ab = #baskets containing
    both — the classic implicit-feedback item similarity (Deshpande &
    Karypis 2004). Returns (a, b, n_ab, cos_r, rk), rk = 1..k ordered
    by (cos_r desc, b) — cosine rounded to 6dp BEFORE ranking so the
    order is replayable across engines.

    Scale shape: pair generation is a within-basket self-join — work
    sum(|basket|^2), the triangle-counting shape, NOT all-pairs across
    the catalog. ``max_basket`` drops baskets above the cap first (a
    10^6-item basket would alone emit 10^12 pairs; such baskets carry
    ~zero similarity signal — same escape hatch as LSH's max_bucket).
    Counts n_x are computed BEFORE the cap so cosine denominators stay
    exact.
    """
    d = pairs.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    deg = d.groupBy(F.col("it").alias("a")).agg(F.count(F.lit(1)).alias("n_a"))
    if max_basket is not None:
        keep = (
            d.groupBy("bk").agg(F.count(F.lit(1)).alias("sz"))
            .where(F.col("sz") <= max_basket)
            .select("bk")
        )
        d = d.join(keep, "bk", "left_semi")
    lhs = d.select("bk", F.col("it").alias("a"))
    rhs = d.select("bk", F.col("it").alias("b"))
    co = (
        lhs.join(rhs, "bk")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    scored = (
        co.join(deg, "a")
        .join(deg.select(F.col("a").alias("b"), F.col("n_a").alias("n_b")), "b")
        .select(
            "a",
            "b",
            "n_ab",
            F.round(F.col("n_ab") / F.sqrt(F.col("n_a") * F.col("n_b")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("cos_r"), F.asc("b"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("a", "b", "n_ab", "cos_r", "rk")
    )
