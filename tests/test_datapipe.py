"""Dedup / similarity / text / multimodal operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fog_spark.datapipe.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
    word_ngrams,
)
from fog_spark.datapipe.similarity import brute_force_topk, lsh_ann_topk
from fog_spark.datapipe.text import doc_fingerprints, language_id, quality_scores, token_stats


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("fast", "quickly")),  # near dup of 0
        (3, "completely different content about spark shuffles and partitions here"),
        (4, "der hund und die katze sind nicht ein paar der die das und"),
        (5, "el perro y la gata de la casa que los una el la de que y"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs):
    out = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert sum(out.values()) == 6


def test_word_ngrams(spark, docs):
    one = docs.filter("doc_id = 3")
    grams = [r["t"] for r in word_ngrams(one, n=3).collect()]
    assert "completely different content" in grams
    assert len(grams) == 9 - 3 + 1  # 9 tokens, n=3


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = {(r["a_id"], r["b_id"]) for r in minhash_lsh_candidates(docs, k=16, bands=8).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert all(a < b for a, b in pairs)  # canonical pair ordering
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated docs don't


def test_ngram_jaccard_verification(spark, docs):
    cands = minhash_lsh_candidates(docs, k=16, bands=8)
    verified = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands).collect()
    }
    assert verified[(0, 1)] == 1.0
    all_pairs = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert all_pairs[(0, 1)] == 1.0
    assert 0.5 <= all_pairs[(0, 2)] < 1.0  # near dup


def test_ngram_jaccard_candidate_path_on_hot_token(spark):
    """A shingle shared by EVERY doc (the hot-token case): the
    candidate-first path must still produce exactly the full path's
    values on the candidate pairs. (The plan-shape guarantee — no
    unrestricted shingle self-join — is pinned in test_plans.py.)"""
    hot = "alpha beta gamma"  # one 3-gram present in every doc
    rows = [(i, f"{hot} unique{i} token{i} filler{i % 4} extra{i}") for i in range(30)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    cands = spark.createDataFrame(
        pd.DataFrame([(0, 1), (2, 3), (5, 17)], columns=["a_id", "b_id"])
    )
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0, candidates=cands).collect()
    }
    full = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    want = {p: full[p] for p in [(0, 1), (2, 3), (5, 17)] if p in full}
    assert got == want and len(got) == 3  # every doc shares the hot shingle


def test_simhash_near_dups(spark, docs):
    sims = {r["id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert sims[0] == sims[1]  # identical text -> identical simhash
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in simhash_near_dups(docs, max_hamming=8).collect()}
    assert pairs.get((0, 1)) == 0


def test_simhash_segment_blocking_catches_prefix_flips(spark):
    """Regression: single-prefix blocking missed pairs whose differing
    bits landed in the prefix. Segment blocking (pigeonhole over 4
    disjoint 16-bit segments) must catch any pair with hamming <= 3,
    INCLUDING one differing only in the top 16 bits."""
    from fog_spark.datapipe.dedup import simhash_pairs_from_sigs

    def i64(x: int) -> int:  # wrap to signed 64-bit (bit 63 = Java long sign bit)
        return x - (1 << 64) if x >= (1 << 63) else x

    base = 0x0123456789ABCDEF
    top_flip = base ^ (0b111 << 61)  # 3 flips, all inside the top segment
    low_flip = base ^ 0b11  # 2 flips in the bottom segment
    far = base ^ ((1 << 60) | (1 << 40) | (1 << 20) | 1)  # 4 flips, one per segment
    sig = spark.createDataFrame(
        [(0, i64(base)), (1, i64(top_flip)), (2, i64(low_flip)), (3, i64(far))],
        "id LONG, simhash LONG",
    )
    pairs = {(r["a_id"], r["b_id"]): r["hamming"] for r in simhash_pairs_from_sigs(sig).collect()}
    assert pairs[(0, 1)] == 3  # the pair a prefix block would have missed
    assert pairs[(0, 2)] == 2
    assert (0, 3) not in pairs  # hamming 4 > max_hamming AND no shared segment


def _make_embeddings(spark, n=60, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((4, dim)) * 3
    vecs = centers[np.arange(n) % 4] + rng.standard_normal((n, dim)) * 0.05
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [v.astype(np.float32).tolist() for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_brute_force_topk_matches_numpy(spark):
    embs, vecs = _make_embeddings(spark)
    out = brute_force_topk(embs, k=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], []).append((r["rank"], r["nn_id"]))
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = norm @ norm.T
    np.fill_diagonal(cos, -np.inf)
    for q in range(len(vecs)):
        expect = list(np.argsort(-cos[q])[:3])
        assert [nn for _, nn in sorted(got[q])] == expect


def test_lsh_ann_recall(spark):
    embs, vecs = _make_embeddings(spark)
    exact = {
        r["query_id"]: r["nn_id"]
        for r in brute_force_topk(embs, k=1).collect()
    }
    approx = {
        r["query_id"]: r["nn_id"]
        for r in lsh_ann_topk(embs, k=1, n_planes=8, n_tables=6).collect()
    }
    hits = sum(1 for q, nn in exact.items() if approx.get(q) == nn)
    assert hits / len(exact) >= 0.9  # clustered data: high recall expected


def test_ivf_topk_recall(spark):
    from fog_spark.datapipe.similarity import ivf_topk

    embs, vecs = _make_embeddings(spark)
    exact = {r["query_id"]: r["nn_id"] for r in brute_force_topk(embs, k=1).collect()}
    approx = {
        r["query_id"]: r["nn_id"]
        for r in ivf_topk(embs, k=1, n_centroids=8, nprobe=2, rounds=3).collect()
    }
    hits = sum(1 for q, nn in exact.items() if approx.get(q) == nn)
    assert hits / len(exact) >= 0.9  # clustered data: centroids capture clusters


def test_ivf_full_probe_is_exact(spark):
    """nprobe == n_centroids degenerates to the exact search."""
    from fog_spark.datapipe.similarity import ivf_topk

    embs, _ = _make_embeddings(spark, n=40)
    exact = {(r["query_id"], r["rank"]): r["nn_id"] for r in brute_force_topk(embs, k=3).collect()}
    full = {
        (r["query_id"], r["rank"]): r["nn_id"]
        for r in ivf_topk(embs, k=3, n_centroids=4, nprobe=4, rounds=2).collect()
    }
    assert full == exact


def test_embedding_near_dups(spark):
    from fog_spark.datapipe.similarity import embedding_near_dups

    base = np.eye(8, dtype=np.float32)
    rows = [
        (0, base[0].tolist()),
        (1, (base[0] + 0.01 * base[1]).tolist()),  # near-dup of 0
        (2, base[2].tolist()),  # orthogonal
    ]
    embs = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    pairs = {(r["a_id"], r["b_id"]) for r in embedding_near_dups(embs, threshold=0.95).collect()}
    assert pairs == {(0, 1)}
    # candidates path verifies only the shortlist
    cands = spark.createDataFrame(pd.DataFrame({"a_id": [0], "b_id": [2]}))
    assert embedding_near_dups(embs, threshold=0.95, candidates=cands).count() == 0


def test_lsh_ann_degenerate_bucket_is_capped(spark):
    """Regression: an input where every vector lands in the same bucket
    (identical embeddings) must not produce a quadratic self-join — the
    max_bucket cap drops the degenerate bucket and the query completes
    with zero candidates."""
    pdf = pd.DataFrame(
        {"vec_id": range(200), "embedding": [[1.0, 2.0, 3.0, 4.0]] * 200}
    )
    embs = spark.createDataFrame(pdf)
    out = lsh_ann_topk(embs, k=1, n_planes=8, n_tables=2, max_bucket=50)
    assert out.count() == 0


def test_text_ops(spark, docs):
    ts = {r["id"]: r for r in token_stats(docs).collect()}
    assert ts[0]["n_tokens"] == 13
    qs = {r["id"]: r for r in quality_scores(docs).collect()}
    assert 0 <= qs[3]["quality"] <= 1
    assert qs[0]["stop_ratio"] > 0
    langs = {r["id"]: r["pred_lang"] for r in language_id(docs).collect()}
    assert langs[0] == "en" and langs[4] == "de" and langs[5] == "es"
    fps = {r["id"]: r["fp_hex"] for r in doc_fingerprints(docs).collect()}
    assert fps[0] == fps[1] and fps[0] != fps[3]


def test_winnowing_guarantee_and_bpe_tokens(spark):
    from fog_spark.datapipe.text import bpe_token_stats, winnowing_sketch, winnowing_fingerprints

    shared = "the common stretch of text that both documents carry verbatim"
    rows = [
        (0, "prefix one . " + shared + " . suffix alpha"),
        (1, "prefix two .. " + shared + " .. suffix beta"),
        (2, "nothing alike here at all in this one whatsoever"),
        (3, "tiny"),  # below k+w-1: no fingerprints, must not crash
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    fps = winnowing_fingerprints(docs, k=8, w=4)
    by_doc = {
        i: {r["fp"] for r in fps.where(F.col("id") == i).collect()} for i in range(3)
    }
    # winnowing guarantee: a shared substring of length >= k+w-1 shares a fingerprint
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    assert fps.where(F.col("id") == 3).count() == 0
    sk = {r["id"]: r for r in winnowing_sketch(docs, k=8, w=4).collect()}
    assert sk[0]["n_fingerprints"] <= sk[0]["n_windows"]
    assert 3 not in sk

    bpe = {r["id"]: r for r in bpe_token_stats(docs).collect()}
    # "tiny" -> one word token; punctuation runs count as tokens elsewhere
    assert bpe[3]["n_bpe_tokens"] == 1
    assert bpe[0]["n_bpe_tokens"] > len(rows[0][1].split()) - 5  # sanity: same order of magnitude


def test_multimodal_plumbing(spark):
    from fog_spark.datapipe.multimodal import MEDIA_SCHEMA, audio_features, frame_sample, image_features

    rows = [
        (0, "image", b"imgpayload0", {"width": 16, "height": 16, "sample_rate": None, "n_frames": None}),
        (1, "image", b"imgpayload1", {"width": 16, "height": 16, "sample_rate": None, "n_frames": None}),
        (2, "audio", b"wavpayload", {"width": None, "height": None, "sample_rate": 8000, "n_frames": None}),
        (3, "video", b"vidpayload", {"width": None, "height": None, "sample_rate": None, "n_frames": 25}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = image_features(media).collect()
    assert len(feats) == 2 and len(feats[0]["feature"]) == 64
    # determinism: same payload -> same features
    again = image_features(media).collect()
    assert feats[0]["mean_luma"] == again[0]["mean_luma"]
    aud = audio_features(media).collect()
    assert len(aud) == 1 and aud[0]["wave_std"] > 0
    frames = [r["frame_idx"] for r in frame_sample(media, every_n=10).collect()]
    assert frames == [0, 10, 20]


def test_short_documents_do_not_crash_ngram_ops(spark):
    """Regression: sequence(0, negative) descends in Spark and crashed
    every n-gram op on docs with < n tokens."""
    short = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "one", "two words"]})
    )
    assert word_ngrams(short, n=3).count() == 0
    assert minhash_lsh_candidates(short, k=8, bands=4).count() == 0
    assert ngram_jaccard_pairs(short, threshold=0.1).count() == 0


def test_small_image_and_empty_video(spark):
    """Regression: reshape crashed on images smaller than the resize grid;
    frame_sample emitted a ghost frame for 0/NULL-frame videos."""
    from fog_spark.datapipe.multimodal import MEDIA_SCHEMA, frame_sample, image_features

    rows = [
        (0, "image", b"tiny", {"width": 4, "height": 3, "sample_rate": None, "n_frames": None}),
        (1, "video", b"v0", {"width": None, "height": None, "sample_rate": None, "n_frames": 0}),
        (2, "video", b"v1", {"width": None, "height": None, "sample_rate": None, "n_frames": None}),
    ]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feats = image_features(media).collect()
    assert len(feats) == 1 and len(feats[0]["feature"]) == 64
    assert frame_sample(media).count() == 0


def test_decoder_seam_swap_in(spark):
    """The decoder is an injectable seam: a custom decoder (standing in
    for Pillow on a cluster that has it) flows through the same
    mapInPandas kernel; without media libs the default resolves to the
    closed-form stub."""
    import numpy as np

    from fog_spark.datapipe.multimodal import (
        MEDIA_SCHEMA,
        FakeDecoder,
        PillowDecoder,
        default_decoder,
        image_features,
    )

    if not PillowDecoder.available():
        assert default_decoder() is FakeDecoder  # honest fallback

    class ConstantDecoder:  # all-128 gray image, any shape
        @staticmethod
        def decode(payload, h, w):
            return np.full((h, w, 3), 128, dtype=np.uint8)

    rows = [(0, "image", b"x", {"width": 8, "height": 8, "sample_rate": None, "n_frames": None})]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = image_features(media, decoder=ConstantDecoder).collect()[0]
    assert got["mean_luma"] == 128.0  # (299+587+114)*128/1000 exactly
    stub = image_features(media).collect()[0]
    assert stub["mean_luma"] != 128.0  # default path used the md5 stub


def test_near_dup_clusters_transitive(spark):
    """Dedup must act on closed groups: a~b and b~c (even when a!~c)
    land in ONE cluster with one canonical; loners stay singletons."""
    import pandas as pd

    from fog_spark.datapipe.dedup import near_dup_clusters

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": ["a", "b", "c", "d"]})
    )
    pairs = spark.createDataFrame(pd.DataFrame({"a_id": [0, 1], "b_id": [1, 2]}))
    got = {r["doc_id"]: (r["cluster_id"], r["is_canonical"])
           for r in near_dup_clusters(docs, pairs).collect()}
    assert got == {0: (0, True), 1: (0, False), 2: (0, False), 3: (3, True)}


def test_asof_join_semantics(spark):
    """Inclusive backward match per key, NULL when nothing precedes,
    tolerance nulls stale matches (pandas merge_asof semantics)."""
    import pandas as pd

    from fog_spark.datapipe.temporal import asof_join

    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:10",
                              "2024-01-01 00:00:02", "2024-01-01 00:00:10"]),
        "lv": [50.0, 100.0, 20.0, 9.0],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:03",
                              "2024-01-01 00:00:09"]),
        "rv": [7.0, 3.0, 4.0],
    }))
    got = {(r["k"], r["lv"]): r["rv_r"] for r in asof_join(left, right, on="k").collect()}
    # 00:05 matches the equal-ts right row (inclusive); 00:02 has no prior
    assert got == {(1, 50.0): 7.0, (1, 100.0): 7.0, (1, 20.0): None, (2, 9.0): 4.0}

    tol = {(r["k"], r["lv"]): r["rv_r"]
           for r in asof_join(left, right, on="k", tolerance_s=2).collect()}
    # the 00:10 purchase's latest click is 00:05 — 5s stale, nulled at tol=2
    assert tol == {(1, 50.0): 7.0, (1, 100.0): None, (1, 20.0): None, (2, 9.0): 4.0}


def test_tfidf_top_terms(spark):
    """Rare terms outrank common ones at equal tf; smoothed idf values."""
    import math

    import pandas as pd

    from fog_spark.datapipe.text import tfidf_top_terms

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["common rare common", "common other", "common third"],
    }))
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append((r["rank"], r["term"], r["tf"], r["df"], r["tfidf"]))
    top0 = sorted(by_doc[0])
    # doc 0: common has tf=2 -> rank 1 despite df=3; rare (df=1) is rank 2
    assert [t[1] for t in top0] == ["common", "rare"]
    rare = top0[1]
    assert rare[2] == 1 and rare[3] == 1
    assert abs(rare[4] - (math.log(4 / 2) + 1)) < 1e-12  # ln((3+1)/(1+1)) + 1
    # doc 1 at equal tf: rarer term first
    assert [t[1] for t in sorted(by_doc[1])] == ["other", "common"]


def test_tfidf_rare_term_outranks_higher_tf(spark):
    """Ranking is by actual tf*idf: a tf=1 rare term (idf ~ ln N) must
    out-rank a tf=2 ubiquitous term (idf = 1) — the case an integer
    (tf desc) ranking gets wrong. With N=5 docs, 'rare' scores
    ln(6/2)+1 ~ 2.099 > 2.0 = 2 * (ln(6/6)+1) for 'common'."""
    import math

    import pandas as pd

    from fog_spark.datapipe.text import tfidf_top_terms

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["common rare common"] + ["common filler%d" % i for i in range(1, 5)],
    }))
    rows = [r for r in tfidf_top_terms(docs, k=2).collect() if r["id"] == 0]
    ranked = [r["term"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranked == ["rare", "common"]
    scores = {r["term"]: r["tfidf"] for r in rows}
    assert abs(scores["rare"] - (math.log(6 / 2) + 1)) < 1e-12
    assert abs(scores["common"] - 2.0) < 1e-12


def test_dedup_pipeline_end_to_end(spark):
    """Full chain on crafted docs: LSH shortlist -> Jaccard verify ->
    CC clusters -> canonical corpus. Docs 0/1/2 are near-identical (one
    trailing token differs), 3/4 identical to each other, 5 unique."""
    import pandas as pd

    from fog_spark.datapipe.dedup import (
        minhash_lsh_candidates, near_dup_clusters, ngram_jaccard_pairs)
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [base + "alpha", base + "beta", base + "gamma",
                 "completely different short text here", "completely different short text here",
                 "nothing like anything else at all in this corpus truly"],
    }))
    cands = minhash_lsh_candidates(docs, k=4, bands=2, ngram=3, max_bucket=100)
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, ngram=3, candidates=cands)
    out = near_dup_clusters(docs, pairs.select("a_id", "b_id"))
    by_doc = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in out.collect()}
    assert by_doc[0] == (0, True) and by_doc[1] == (0, False) and by_doc[2] == (0, False)
    assert by_doc[3] == (3, True) and by_doc[4] == (3, False)
    assert by_doc[5] == (5, True)
    # canonical corpus = exactly one survivor per cluster
    kept = sorted(d for d, (_, canon) in by_doc.items() if canon)
    assert kept == [0, 3, 5]


def test_kmv_distinct_exact_below_k_and_accurate_above(spark):
    """Bottom-k sketch: exact when a group's distinct count <= k;
    within the KMV error envelope (rse ~ 1/sqrt(k-2)) above it; and
    insensitive to duplicate rows (it sketches the distinct SET)."""
    from fog_spark.datapipe.sketches import kmv_distinct

    rows = []
    # group 0: 40 distinct values (< k=64) duplicated 3x -> exact 40
    for v in range(40):
        rows += [(0, f"v{v}")] * 3
    # group 1: 5000 distinct values -> estimated
    rows += [(1, f"w{v}") for v in range(5000)]
    df = spark.createDataFrame(rows, "g long, v string")
    out = {r["g"]: (r["n_seen"], r["estimate"]) for r in kmv_distinct(df, "g", "v", k=64).collect()}
    assert out[0] == (40, 40.0)
    n_seen, est = out[1]
    assert n_seen == 64
    assert abs(est - 5000) / 5000 < 0.5  # ~4 standard errors at k=64


def test_kmv_sketches_merge_exactly(spark):
    """Mergeability, executable: per-part bottom-k sketches rolled up
    with kmv_union_estimate give EXACTLY the estimate kmv_distinct
    computes over the combined data — the identity a partial-agg tree
    at 100 TB relies on."""
    from pyspark.sql import functions as F

    from fog_spark.datapipe.sketches import kmv_distinct, kmv_sketch, kmv_union_estimate

    rows = [(v % 7, f"val{v}") for v in range(3000)]  # 7 parts, overlapping values? no: distinct per v
    rows += [(p, f"shared{s}") for p in range(7) for s in range(200)]  # heavy overlap across parts
    df = spark.createDataFrame(rows, "part long, v string")
    k = 32
    merged = kmv_union_estimate(kmv_sketch(df, "part", "v", k=k), k=k).collect()
    direct = kmv_distinct(
        df.withColumn("g", F.lit(0)), "g", "v", k=k
    ).collect()
    assert len(merged) == 1 and len(direct) == 1
    assert merged[0]["estimate"] == direct[0]["estimate"]  # exactly equal, not close
    assert merged[0]["n_seen"] == direct[0]["n_seen"] == k
    # and the estimate is in the KMV error envelope of the true count
    true = df.select("v").distinct().count()
    assert abs(merged[0]["estimate"] - true) / true < 0.6


def test_embedding_hubness_numpy(spark):
    """Reverse-3NN counts vs a numpy cosine replay on a small table."""
    import numpy as np

    from fog_spark.queries import q_embedding_hubness

    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    vecs[7] *= 0.0
    vecs[7] += vecs[:5].mean(axis=0)  # make 7 a deliberate hub
    import pandas as pd

    pdf = pd.DataFrame({"vec_id": range(20), "embedding": [v.tolist() for v in vecs]})
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="hub")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))

    got = {r["vec_id"]: r["rknn3"] for r in q_embedding_hubness(spark, tmp).collect()}

    v = vecs.astype("float64")
    nrm = np.sqrt((v * v).sum(axis=1))
    cos = (v @ v.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cos, -np.inf)
    counts = {i: 0 for i in range(20)}
    for a in range(20):
        order = sorted(range(20), key=lambda b: (-cos[a, b], b))[:3]
        for b in order:
            counts[b] += 1
    assert got == counts
    assert sum(got.values()) == 60  # 20 queries x 3 neighbors
