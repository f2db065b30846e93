"""A/B evidence for the candidate-first Jaccard verify plan (round-5
verdict task #2).

Corpus: every document shares one hot 3-gram shingle (the adversarial
case for the old plan). The OLD shape — full token self-join, candidate
semi-join applied after the aggregation — streams O(d²) rows through
the hot token before the restriction can apply. The NEW shape
(``ngram_jaccard_pairs(candidates=...)``) fans the candidate pairs out
by a-side shingles then equi-joins (b_id, t): work is
O(|candidates| × shingles/doc) regardless of token frequency.

Writes BENCH_JACCARD.json {docs, candidates, old_sec, new_sec, speedup}.
"""

import json
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from fog_spark.datapipe.dedup import ngram_jaccard_pairs, word_ngrams  # noqa: E402
from fog_spark.session import get_spark  # noqa: E402


def old_shape(docs, threshold, candidates):
    """The pre-round-5 plan, reproduced for the A/B: full shingle
    self-join + post-aggregation semi-join."""
    sh = word_ngrams(docs, 3, "doc_id", "text").distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("id").alias("a_id"), "t")
    b = sh.select(F.col("id").alias("b_id"), "t")
    common = (
        a.join(b, "t")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(candidates, ["a_id", "b_id"], "left_semi")
    )
    sa = sizes.select(F.col("id").alias("a_id"), F.col("n").alias("na"))
    sb = sizes.select(F.col("id").alias("b_id"), F.col("n").alias("nb"))
    return (
        common.join(sa, "a_id").join(sb, "b_id")
        .withColumn("jaccard", F.col("c") / (F.col("na") + F.col("nb") - F.col("c")))
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark()
    hot = "alpha beta gamma"
    rows = [(i, f"{hot} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f") for i in range(n_docs)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    ).repartition(32).persist()
    docs.count()
    cands = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(0, n_docs - 1, 7)],
                     columns=["a_id", "b_id"])
    ).persist()
    n_cand = cands.count()

    t0 = time.time()
    n_new = ngram_jaccard_pairs(docs, threshold=0.0, candidates=cands).count()
    new_sec = time.time() - t0

    t0 = time.time()
    n_old = old_shape(docs, 0.0, cands).count()
    old_sec = time.time() - t0

    assert n_new == n_old == n_cand, (n_new, n_old, n_cand)
    out = {
        "docs": n_docs,
        "candidates": n_cand,
        "hot_token_rows_old_join": n_docs * (n_docs - 1) // 2,
        "old_sec": round(old_sec, 2),
        "new_sec": round(new_sec, 2),
        "speedup": round(old_sec / new_sec, 2),
    }
    print(json.dumps(out))
    with open("/root/repo/BENCH_JACCARD.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
