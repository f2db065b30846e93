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
