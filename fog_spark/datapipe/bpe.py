"""Distributed BPE merge-rule training (Sennrich et al. 2016), the
tokenizer-induction step of an LLM data pipeline, Spark-first.

The classic scaling reduction: BPE statistics depend only on the
DISTINCT-WORD frequency table, not the raw corpus — one groupBy turns
100 TB of text into a few million (word, freq) rows, and every round
after that is corpus-size-independent. Per merge round:

1. adjacent-pair counts: one lead() window over the symbol table,
   weighted by word frequency, one (lhs, rhs) aggregate;
2. the winning pair: a 1-row driver collect (count desc, then
   lexicographic — fully deterministic);
3. greedy leftmost non-overlapping application, WITHOUT a per-row
   Python tokenizer loop: a candidate position merges iff its offset
   inside its run of consecutive candidate positions is even (runs
   longer than 1 only occur for x==x pairs, e.g. "aaaa"), which is
   pure gaps-and-islands window algebra — expressible identically in
   Spark and the SQL oracle, so every round replays exactly.

Symbols are the concatenated character strings themselves (no marker;
merges are word-internal over the shared [a-z0-9]+ token convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fog_spark.datapipe.dedup import tokens
from fog_spark.engine.superstep import materialize


def word_symbols(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(w, freq, pos, sym): each distinct corpus word split into
    single-character symbols, carrying its corpus frequency."""
    wt = tokens(docs, id_col, text_col).groupBy(F.col("t").alias("w")).agg(
        F.count(F.lit(1)).alias("freq")
    )
    return wt.select(
        "w",
        "freq",
        (F.explode(F.sequence(F.lit(1), F.length("w")))).alias("i"),
    ).select(
        "w",
        "freq",
        (F.col("i") - 1).alias("pos"),
        F.expr("substring(w, i, 1)").alias("sym"),
    )


def top_pair(symbols: DataFrame) -> tuple[str, str, int] | None:
    """The most frequent adjacent symbol pair (corpus-weighted), ties
    broken lexicographically. None when no word has two symbols left."""
    wnd = Window.partitionBy("w").orderBy("pos")
    pairs = symbols.select(
        F.col("sym").alias("lhs"),
        F.lead("sym").over(wnd).alias("rhs"),
        "freq",
    ).filter(F.col("rhs").isNotNull())
    row = (
        pairs.groupBy("lhs", "rhs")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
        .limit(1)
        .collect()
    )
    if not row:
        return None
    return row[0]["lhs"], row[0]["rhs"], int(row[0]["cnt"])


def apply_merge(symbols: DataFrame, lhs: str, rhs: str) -> DataFrame:
    """Greedy leftmost non-overlapping replacement of (lhs, rhs) by the
    concatenated symbol, per word — windows only, no per-row Python."""
    wnd = Window.partitionBy("w").orderBy("pos")
    cand = symbols.withColumn(
        "cand",
        (F.col("sym") == lhs) & (F.lead("sym").over(wnd) == rhs),
    )
    # islands of CONSECUTIVE candidate positions; odd row_number
    # (1-based) within an island = even offset = greedy-merge site
    merges = (
        cand.filter("cand")
        .withColumn("isl", F.col("pos") - F.row_number().over(wnd))
        .withColumn(
            "mrg",
            F.row_number().over(Window.partitionBy("w", "isl").orderBy("pos")) % 2 == 1,
        )
        .filter("mrg")
        .select("w", "pos", "mrg")
    )
    marked = cand.join(merges, ["w", "pos"], "left").select(
        "w",
        "freq",
        "pos",
        "sym",
        F.coalesce("mrg", F.lit(False)).alias("mrg"),
    )
    kept = marked.withColumn(
        "drop", F.coalesce(F.lag("mrg").over(wnd), F.lit(False))
    ).filter(~F.col("drop"))
    return kept.select(
        "w",
        "freq",
        (F.row_number().over(wnd) - 1).alias("pos"),
        F.when(F.col("mrg"), F.lit(lhs + rhs)).otherwise(F.col("sym")).alias("sym"),
    )


def bpe_train(
    docs: DataFrame,
    rounds: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(merge_round, lhs, rhs, pair_count): the learned merge table.
    One symbol-table shuffle cascade + one 1-row collect per round."""
    spark = docs.sparkSession
    symbols = materialize(word_symbols(docs, id_col, text_col))
    learned: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        best = top_pair(symbols)
        if best is None:
            break
        lhs, rhs, cnt = best
        learned.append((r, lhs, rhs, cnt))
        symbols = materialize(apply_merge(symbols, lhs, rhs))
    return spark.createDataFrame(
        learned, "merge_round int, lhs string, rhs string, pair_count long"
    )


def bpe_encode_stats(
    docs: DataFrame,
    rounds: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_chars, n_bpe, compression_r): segment every
    document with the merge rules learned by ``rounds`` training rounds
    and report the token-level compression (bpe symbols / characters,
    6-decimal). The encode step never touches raw text again: per-doc
    stats are the corpus token stream joined against the distinct-word
    symbol counts — the same reduction that made training scale."""
    symbols = materialize(word_symbols(docs, id_col, text_col))
    for _ in range(rounds):
        best = top_pair(symbols)
        if best is None:
            break
        symbols = materialize(apply_merge(symbols, best[0], best[1]))
    wcnt = symbols.groupBy("w").agg(F.count(F.lit(1)).alias("nsym"))
    tok = tokens(docs, id_col, text_col)
    return (
        tok.join(wcnt, tok["t"] == wcnt["w"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.length("t")).alias("n_chars"),
            F.sum("nsym").alias("n_bpe"),
        )
        .select(
            "id",
            "n_tokens",
            "n_chars",
            "n_bpe",
            F.round(F.col("n_bpe") / F.col("n_chars"), 6).alias("compression_r"),
        )
    )
