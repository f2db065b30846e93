"""Deduplication operators for large-scale text corpora.

Four families, each shaped for 100 TB inputs:

- exact:   one hash-groupBy shuffle on a content digest;
- MinHash + LSH: shingle -> k minhashes -> band buckets -> bucket join
  (candidate pairs never leave their bucket, so the join is local to
  the bucket's hash partition — no quadratic blowup);
- SimHash: 64-bit near-dup fingerprint, Hamming-adjacent buckets;
- n-gram Jaccard: exact verification of candidate pairs (run AFTER
  LSH/SimHash shortlisting at scale, standalone only on small data).

All token/hash work happens in JVM built-ins (md5, xxhash64, explode);
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = "[a-z0-9]+"


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, token) pairs, lowercased alnum tokens."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)).alias("t"),
    )


def word_ngrams(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle) word n-grams via array slicing — JVM-side transform.

    Documents with fewer than n tokens yield no shingles (guarded:
    sequence(0, negative) would DESCEND and crash the slice)."""
    arr = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    docs = docs.select(F.col(id_col).alias("id"), arr.alias("ts"))
    ng = F.when(
        F.size("ts") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("ts") - n),
            lambda i: F.concat_ws(" ", F.slice("ts", i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("id", F.explode(ng).alias("t"))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(digest, n_copies, canonical_id): hash-groupBy exact dedup."""
    return docs.groupBy(F.sha2(F.col(text_col), 256).alias("digest")).agg(
        F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("canonical_id")
    )


def minhash_signatures(shingles: DataFrame, k: int = 16, hash_fn=None) -> DataFrame:
    """(id, mh_0..mh_{k-1}): min over seeded hashes of each shingle.

    ``hash_fn(i, col) -> Column`` is the permutation-family seam.
    Default: seeded xxhash64 — Spark-native (JVM, codegen); seeds give
    k independent permutation approximations. Pass an md5-based fn
    (min over hex strings) when signatures must be reproducible by an
    external engine — see queries.q_dedup_pipeline.
    """
    if hash_fn is None:
        hash_fn = lambda i, c: F.xxhash64(F.lit(i), c)  # noqa: E731
    d = shingles.distinct()
    aggs = [F.min(hash_fn(i, F.col("t"))).alias(f"mh_{i}") for i in range(k)]
    return d.groupBy("id").agg(*aggs)


def minhash_lsh_candidates(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 1000,
    hash_fn=None,
    band_fn=None,
) -> DataFrame:
    """Candidate near-dup pairs (a_id < b_id) via MinHash banding.

    bands × rows-per-band = k. Buckets larger than ``max_bucket`` are
    dropped (degenerate content — at 100 TB one mega-bucket would
    otherwise produce a quadratic join; the dropped count is the
    caller's skew telemetry). ``hash_fn``/``band_fn`` parameterize the
    shingle hash and the per-band bucket key (``band_fn(b, cols) ->
    Column``); defaults are the fast xxhash64 JVM path.
    """
    rows = k // bands
    sig = minhash_signatures(word_ngrams(docs, ngram, id_col, text_col), k, hash_fn=hash_fn)
    if band_fn is None:
        band_fn = lambda b, cols: F.xxhash64(F.lit(b), *cols)  # noqa: E731
    band_cols = [
        band_fn(b, [F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias("bucket")
        for b in range(bands)
    ]
    banded = sig.select(
        "id", F.explode(F.array(*[F.struct(F.lit(b).alias("band"), band_cols[b]) for b in range(bands)])).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("n"))
    small = banded.join(
        sizes.filter(F.col("n") <= max_bucket).select("band", "bucket"), ["band", "bucket"]
    )
    a = small.select("band", "bucket", F.col("id").alias("a_id"))
    b = small.select("band", "bucket", F.col("id").alias("b_id"))
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(a_id, b_id, jaccard) with n-gram Jaccard >= threshold.

    With ``candidates`` (from LSH): CANDIDATE-FIRST verification — the
    scale path. The intersection size is computed as
    ``candidates ⋈ a-shingles ⋈ (b_id, t)``: fan the candidate pairs
    out by the a-side's shingles, then equi-join the b-side shingle
    table on BOTH (b_id, t). Work is O(|candidates| × shingles/doc)
    regardless of shingle frequency. (The naive alternative — full
    token self-join then semi-join the pairs — lets one hot shingle
    shared by d documents stream O(d²) rows before the restriction can
    apply, because the semi's condition spans both sides of the token
    join and cannot be pushed below it.)

    Without ``candidates``: all-pairs via shingle join — small data only.
    """
    sh = word_ngrams(docs, ngram, id_col, text_col).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        cand = candidates.select("a_id", "b_id").distinct()
        fan = cand.join(
            sh.select(F.col("id").alias("a_id"), "t"), "a_id"
        )  # (a_id, b_id, t): one row per candidate-pair × a-shingle
        common = (
            fan.join(sh.select(F.col("id").alias("b_id"), "t"), ["b_id", "t"])
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        a = sh.select(F.col("id").alias("a_id"), "t")
        b = sh.select(F.col("id").alias("b_id"), "t")
        common = (
            a.join(b, "t")
            .where(F.col("a_id") < F.col("b_id"))
            .groupBy("a_id", "b_id")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("n").alias("nb"))
    return (
        common.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash): 64-bit SimHash over unigram tokens.

    Per bit b: sign of Σ_tokens (bit_b(xxhash64(token)) ? +1 : -1).
    Vectorized as 64 conditional sums in one aggregation — one shuffle,
    all JVM expressions.
    """
    tk = tokens(docs, id_col, text_col).withColumn("h", F.xxhash64("t"))

    def mask(b: int) -> int:
        # bit 63 is the sign bit of a Java long
        return (1 << b) if b < 63 else -(1 << 63)

    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(mask(b))) != 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias(f"b{b}")
        for b in range(64)
    ]
    per_bit = tk.groupBy(F.col("id")).agg(*aggs)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(mask(b))).otherwise(F.lit(0))
        sim = bit if sim is None else sim.bitwiseOR(bit)
    return per_bit.select("id", sim.cast("long").alias("simhash"))


def simhash_near_dups(docs: DataFrame, n_segments: int = 4, max_hamming: int = 3,
                      max_bucket: int = 100_000, **kw) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``n_segments`` disjoint bit
    segments, verify Hamming distance <= max_hamming within blocks.

    Pigeonhole guarantee: a pair with Hamming distance d < n_segments
    agrees EXACTLY on at least one segment, so with the default
    (4 segments of 16 bits, max_hamming 3) recall is 100% — unlike a
    single-prefix block, which misses any pair whose differing bits
    land in the prefix. Each signature lands in n_segments blocks; the
    per-block join stays bucket-local.
    """
    return simhash_pairs_from_sigs(simhash64(docs, **kw), n_segments, max_hamming, max_bucket)


def simhash_pairs_from_sigs(sig: DataFrame, n_segments: int = 4, max_hamming: int = 3,
                            max_bucket: int = 100_000) -> DataFrame:
    """Segment-blocked Hamming join over a precomputed (id, simhash)
    frame (see simhash_near_dups for the recall guarantee).

    Blocks larger than ``max_bucket`` are DROPPED before the self-join
    (same guard as minhash_lsh_candidates / lsh_ann_topk): a popular
    segment value — e.g. an all-zeros segment shared by many
    near-uniform docs — would otherwise make that block's self-join
    quadratic. Recall impact: a pair whose ONLY agreeing segments all
    sit in oversized blocks is missed, weakening the pigeonhole
    guarantee to "within surviving blocks"; pairs that huge-block
    regime produces are overwhelmingly far apart anyway (a segment
    shared by >max_bucket docs carries ~no near-dup signal)."""
    width = 64 // n_segments
    # segment s = bits [s*width, (s+1)*width); key carries the segment
    # index so equal bit patterns in different segments never collide
    seg_keys = F.array(
        *[
            F.struct(
                F.lit(s).alias("seg"),
                F.shiftrightunsigned("simhash", s * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bits"),
            )
            for s in range(n_segments)
        ]
    )
    blocked = sig.select("id", "simhash", F.explode(seg_keys).alias("blk"))
    sizes = blocked.groupBy("blk").agg(F.count(F.lit(1)).alias("n"))
    blocked = blocked.join(sizes.filter(F.col("n") <= max_bucket).select("blk"), "blk")
    a = blocked.select("blk", F.col("id").alias("a_id"), F.col("simhash").alias("ha"))
    b = blocked.select("blk", F.col("id").alias("b_id"), F.col("simhash").alias("hb"))
    return (
        a.join(b, "blk")
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can agree on several segments; ids+hamming only
    )


def near_dup_clusters(docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, cluster_id, is_canonical): duplicate CLUSTERS from verified
    near-dup pairs — the canonical-selection step of a dedup pipeline.

    Near-duplication is not transitive pair-by-pair, but dedup must act
    on whole groups (a-b and b-c dup => keep ONE of {a,b,c}), so the
    verified pair graph is closed into connected components
    (algorithms/cc.connected_components — the same frontier-scheduled
    hash-min engine the graph queries use). cluster_id = min doc id of
    the component; the canonical representative is that doc; documents
    with no near-dup partner form singleton clusters (cc keeps isolated
    vertices). Filtering `is_canonical` yields the deduplicated corpus;
    at scale the pairs input comes from the LSH shortlist
    (minhash_lsh_candidates -> ngram_jaccard_pairs(candidates=...)),
    so every stage is bucketed — no all-pairs anywhere."""
    from fog_spark.algorithms.cc import connected_components

    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    vertices = docs.select(F.col(id_col).alias("id"))
    comp = connected_components(edges, vertices=vertices)
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


def dedup_corpus(
    docs: DataFrame,
    k: int = 16,
    bands: int = 4,
    ngram: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full near-dup pipeline as one call: MinHash/LSH shortlist →
    candidate-first n-gram Jaccard verification → CC cluster closure →
    canonical selection. Returns (id_col, cluster_id, is_canonical,
    n_members) — filter ``is_canonical`` for the deduplicated corpus.

    Every stage is the scale path (banded buckets with a size cap,
    shortlist-restricted verification, frontier CC) with the fast
    xxhash64 hash family; ``q_dedup_pipeline`` is the same composition
    under the portable md5 family the DuckDB oracle replays.
    """
    cands = minhash_lsh_candidates(
        docs, k=k, bands=bands, ngram=ngram, id_col=id_col, text_col=text_col,
        max_bucket=max_bucket,
    )
    pairs = ngram_jaccard_pairs(
        docs, threshold=threshold, ngram=ngram, id_col=id_col, text_col=text_col,
        candidates=cands,
    )
    clusters = near_dup_clusters(docs, pairs.select("a_id", "b_id"), id_col=id_col)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return clusters.join(sizes, "cluster_id").select(
        id_col, "cluster_id", "is_canonical", "n_members"
    )


def span_dedup_stats(
    docs: DataFrame, k: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4-style span-level exact dedup signal: chop each document into
    NON-OVERLAPPING k-token windows (full windows only), hash each
    span's text, and count how many of a document's spans occur more
    than once ANYWHERE in the corpus.

    Returns (doc_id, n_spans, n_dup_spans, dup_frac): dup_frac is the
    document's share of corpus-duplicated spans (round 6; 0.0 for docs
    shorter than k tokens). The C4 pipeline (Raffel et al. 2020, §2.2)
    removes three-sentence spans occurring more than once; with no
    sentence structure in the corpus this uses fixed token windows —
    the same two-shuffle plan: one groupBy(span hash) count over the
    whole corpus, one keyed join back to (doc, span).
    """
    arr = F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_RE), 0)
    base = docs.select(F.col(id_col).alias("id"), arr.alias("ts"))
    spans_arr = F.when(
        F.size("ts") >= k,
        F.transform(
            F.sequence(F.lit(0), (F.size("ts") / k).cast("int") - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice("ts", i * k + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # positional explode: the SAME span text twice in one doc counts twice
    spans = base.select("id", F.posexplode(spans_arr).alias("pos", "h"))

    global_ct = spans.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    per_doc = (
        spans.join(global_ct, "h")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("n") > 1).cast("long")).alias("n_dup_spans"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .distinct()
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.when(
                    F.coalesce("n_spans", F.lit(0)) > 0,
                    F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_frac"),
        )
    )
