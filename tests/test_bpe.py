"""Distributed BPE trainer vs a reference python implementation."""

import re
from collections import Counter

from fog_spark.datapipe.bpe import apply_merge, bpe_train, word_symbols


def _py_bpe(texts, rounds):
    freq = Counter(t for x in texts for t in re.findall(r"[a-z0-9]+", x.lower()))
    seqs = {w: [c for c in w] for w in freq}
    merges = []
    for r in range(1, rounds + 1):
        cnt = Counter()
        for w, f in freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (lhs, rhs), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, lhs, rhs, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == lhs and s[i + 1] == rhs:
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


TEXTS = [
    "the theme of the weather is the thing",
    "there then they them the the the",
    "other ethers gather weather together",
    "banana bandana banner aaaa aaa",
]


def test_bpe_merge_table_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(df, rounds=8).orderBy("merge_round").collect()
    ]
    expected, _ = _py_bpe(TEXTS, 8)
    assert got == expected


def test_apply_merge_overlap_runs(spark):
    """Greedy leftmost on same-symbol runs: aaaa -> aa aa, aaa -> aa a."""
    df = spark.createDataFrame([(0, "aaaa aaa baa")], ["doc_id", "text"])
    syms = apply_merge(word_symbols(df), "a", "a")
    seqs = {}
    for r in syms.orderBy("w", "pos").collect():
        seqs.setdefault(r["w"], []).append(r["sym"])
    assert seqs == {"aaaa": ["aa", "aa"], "aaa": ["aa", "a"], "baa": ["b", "aa"]}


def test_apply_merge_no_rematch_within_round(spark):
    """A symbol formed this round must not chain-merge in the same round."""
    df = spark.createDataFrame([(0, "ababab")], ["doc_id", "text"])
    syms = apply_merge(word_symbols(df), "a", "b")
    got = [r["sym"] for r in syms.orderBy("pos").collect()]
    assert got == ["ab", "ab", "ab"]


def test_bpe_encode_stats_matches_reference(spark):
    from fog_spark.datapipe.bpe import bpe_encode_stats

    df = spark.createDataFrame(list(enumerate(TEXTS)), ["doc_id", "text"])
    _, seqs = _py_bpe(TEXTS, 5)
    expected = {}
    for i, x in enumerate(TEXTS):
        ws = re.findall(r"[a-z0-9]+", x.lower())
        n_bpe = sum(len(seqs[w]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        expected[i] = (len(ws), n_chars, n_bpe, round(n_bpe / n_chars, 6))
    got = {
        r["id"]: (r["n_tokens"], r["n_chars"], r["n_bpe"], r["compression_r"])
        for r in bpe_encode_stats(df, rounds=5).collect()
    }
    assert got == expected
    # merges genuinely compress: every doc needs fewer symbols than chars
    assert all(v[2] < v[1] for v in got.values())
