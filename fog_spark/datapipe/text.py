"""Text analysis operators: language ID, quality scoring, token stats,
fingerprinting. All JVM built-ins — no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fog_spark.datapipe.dedup import tokens

# tiny n-gram-free heuristic stoplists per language
STOPLISTS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ein"),
    "es": ("el", "la", "de", "que", "y", "los", "una"),
    "fr": ("le", "la", "les", "des", "et", "une", "est"),
}


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_unique, n_chars): whitespace+regex token counting."""
    tk = tokens(docs, id_col, text_col)
    return tk.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("t").alias("n_unique"),
        F.sum(F.length("t")).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_token_len, stop_ratio, alpha_ratio, quality).

    Length/punctuation/stopword heuristics in the Gopher/C4 style; the
    scalar `quality` is a blended score in [0,1].
    """
    tk = tokens(docs, id_col, text_col)
    per = tk.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg(F.length("t")).alias("avg_token_len"),
        (F.sum(F.when(F.col("t").isin(*STOPLISTS["en"]), 1).otherwise(0)) / F.count(F.lit(1))).alias("stop_ratio"),
    )
    raw = docs.select(
        F.col(id_col).alias("id"),
        (F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")) / F.greatest(F.length(text_col), F.lit(1))).alias("alpha_ratio"),
    )
    j = per.join(raw, "id")
    quality = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.3
        + F.least(F.col("stop_ratio") * 5.0, F.lit(1.0)) * 0.3
        + F.col("alpha_ratio") * 0.4
    )
    return j.select("id", "n_tokens", "avg_token_len", "stop_ratio", "alpha_ratio", quality.alias("quality"))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, pred_lang, score): argmax of per-language stopword density."""
    tk = tokens(docs, id_col, text_col)
    aggs = [
        (F.sum(F.when(F.col("t").isin(*words), 1).otherwise(0)) / F.count(F.lit(1))).alias(f"s_{lang}")
        for lang, words in STOPLISTS.items()
    ]
    scored = tk.groupBy("id").agg(*aggs)
    pairs = F.array(*[F.struct((-F.col(f"s_{l}")).alias("neg"), F.lit(l).alias("lang")) for l in STOPLISTS])
    best = F.array_min(pairs)
    return scored.select(
        "id",
        F.when(-best["neg"] > 0, best["lang"]).otherwise(F.lit("unk")).alias("pred_lang"),
        (-best["neg"]).alias("score"),
    )


# GPT-2-style pretokenizer approximation, lowercase alphabet: contraction
# suffixes, space-prefixed word / number runs, punctuation runs, whitespace.
# Kept to RE2-compatible constructs so external engines tokenize identically.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def bpe_token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_bpe_tokens, n_unique_bpe): BPE-ish pretokenizer counting —
    the token-budget estimator for training-data pipelines (whitespace
    splitting undercounts punctuation-heavy text; this matches the
    shape real BPE pretokenizers produce)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.regexp_extract_all(F.lower(text_col), F.lit(BPE_RE), 0)).alias("t"),
    ).where(~F.col("t").rlike(r"^\s+$"))  # whitespace runs separate tokens, they are not tokens
    return toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bpe_tokens"),
        F.countDistinct("t").alias("n_unique_bpe"),
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, p, fp): MOSS-style winnowing — the rolling-hash document
    fingerprint family. k-gram character shingles over the normalized
    text are hashed; every window of ``w`` consecutive gram hashes
    contributes its MIN as a fingerprint. Guarantees: any shared
    substring of length >= k + w - 1 between two documents yields a
    shared fingerprint.

    All JVM built-ins: position explode -> substring -> md5 -> window
    MIN. One shuffle (the window's partitioning by id).
    """
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    d = docs.select(F.col(id_col).alias("id"), norm.alias("s")).where(F.length("s") >= k + w - 1)
    grams = d.select(
        "id",
        (F.length("s") - k + 1).alias("n_grams"),
        F.explode(F.sequence(F.lit(1), F.length("s") - k + 1)).alias("p"),
        F.col("s"),
    ).select("id", "n_grams", "p", F.md5(F.expr(f"substring(s, p, {k})")).alias("h"))
    win = Window.partitionBy("id").orderBy("p").rowsBetween(0, w - 1)
    fps = (
        grams.withColumn("fp", F.min("h").over(win))
        .where(F.col("p") <= F.col("n_grams") - w + 1)  # only complete windows
        .select("id", "p", "fp")
    )
    return fps


def winnowing_sketch(docs: DataFrame, k: int = 8, w: int = 4, **kw) -> DataFrame:
    """(id, n_windows, n_fingerprints, min_fp): per-doc winnowing summary."""
    fps = winnowing_fingerprints(docs, k, w, **kw)
    return fps.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fp64, fp_hex): rolling-hash-style fingerprint of normalized text.

    xxhash64 over the whitespace-normalized lowercase text plus a
    128-bit hex (md5) companion for collision checks.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return docs.select(
        F.col(id_col).alias("id"),
        F.xxhash64(norm).alias("fp64"),
        F.md5(norm).alias("fp_hex"),
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, term, tf, df, tfidf, rank): top-k characteristic terms per
    document by smoothed tf-idf (idf = ln((N+1)/(df+1)) + 1).

    Ranking is by ACTUAL tf·idf, rounded to 6 decimals for cross-engine
    stability (a last-ulp ln() divergence between engines cannot flip a
    6-decimal rounding except within 5e-7 of a boundary — never hit by
    ln ratios of small integers), with the deterministic integer tuple
    (tf desc, df asc, term asc) as tie-break. So a tf=1 rare term
    (idf ~ ln N) correctly out-ranks a tf=2 ubiquitous term (idf ~ 1).
    Two shuffles total: per-(doc,term) counts, then df per term; the
    window runs on the counts exchange.
    """
    from pyspark.sql import Window

    tk = tokens(docs, id_col, text_col)
    tf = tk.groupBy("id", "t").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.countDistinct(id_col)).collect()[0][0]
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    w = Window.partitionBy("id").orderBy(
        F.desc("tfidf_r"), F.desc("tf"), F.asc("df"), F.asc("t")
    )
    return (
        tf.join(df, "t")
        .withColumn("tfidf", F.col("tf") * idf)
        .withColumn("tfidf_r", F.round("tfidf", 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", F.col("t").alias("term"), "tf", "df", "tfidf", "rank")
    )


def repetition_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_token_max: float = 0.2,
    top_bigram_max: float = 0.18,
    dup_trigram_max: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1.2),
    word-level: (id, n_tokens, top_token_frac, top_bigram_frac,
    dup_trigram_frac, flagged).

    - top_token_frac:   occurrences of the most frequent token / n_tokens
    - top_bigram_frac:  occurrences of the most frequent word 2-gram /
                        total 2-gram occurrences (0 when < 2 tokens)
    - dup_trigram_frac: fraction of word 3-gram occurrences that are
                        repeats of an earlier one, i.e.
                        (total - distinct) / total (0 when < 3 tokens)

    flagged = any fraction above its threshold — the repetition arm of
    the Gopher quality gate (quality_scores covers the length/stopword
    arm). Three keyed aggregations joined on doc id, each with map-side
    partial aggregation; only max/count scalars leave the executors.
    """
    tk = tokens(docs, id_col, text_col)
    tok = (
        tk.groupBy("id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_tokens"), F.max("c").alias("top_tok"))
    )

    ts = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
    base = docs.select(F.col(id_col).alias("id"), ts.alias("ts"))

    def _grams(n: int):
        return F.when(
            F.size("ts") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("ts") - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("ts", i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    big = (
        base.select("id", F.explode(_grams(2)).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.sum("c").alias("n_big"), F.max("c").alias("top_big"))
    )
    tri = (
        base.select("id", F.explode(_grams(3)).alias("g"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tri"), F.countDistinct("g").alias("u_tri"))
    )

    top_token_frac = F.round(F.col("top_tok") / F.col("n_tokens"), 6)
    top_bigram_frac = F.round(
        F.coalesce(F.col("top_big") / F.col("n_big"), F.lit(0.0)), 6
    )
    dup_trigram_frac = F.round(
        F.coalesce((F.col("n_tri") - F.col("u_tri")) / F.col("n_tri"), F.lit(0.0)), 6
    )
    return (
        tok.join(big, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            "n_tokens",
            top_token_frac.alias("top_token_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            dup_trigram_frac.alias("dup_trigram_frac"),
        )
        .withColumn(
            "flagged",
            (F.col("top_token_frac") > top_token_max)
            | (F.col("top_bigram_frac") > top_bigram_max)
            | (F.col("dup_trigram_frac") > dup_trigram_max),
        )
    )
