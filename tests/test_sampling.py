"""Deterministic stratified sampling invariants."""

import hashlib

import pandas as pd

from fog_spark.datapipe.sampling import BUCKETS, stratified_sample, stratified_take


def py_bucket(key, salt=7):
    h = hashlib.md5(f"smp{salt}:{key}".encode()).hexdigest()
    return int(h[:13], 16) % BUCKETS


def _docs(spark, n=2000):
    langs = ["en", "de", "fr", "zh"]
    pdf = pd.DataFrame({
        "doc_id": range(n),
        "lang": [langs[i % 4] for i in range(n)],
    })
    return spark.createDataFrame(pdf)


def test_rate_sample_matches_hash_replay(spark):
    rates = {"en": 0.5, "de": 0.1}
    got = {r["doc_id"] for r in
           stratified_sample(_docs(spark), rates, default_rate=0.25, salt=7).collect()}
    langs = ["en", "de", "fr", "zh"]
    exp = set()
    for i in range(2000):
        rate = rates.get(langs[i % 4], 0.25)
        if py_bucket(i) < int(rate * BUCKETS):
            exp.add(i)
    assert got == exp
    # rates land near nominal (500 en-docs at 0.5 -> ~250)
    en = sum(1 for i in got if i % 4 == 0)
    assert 200 < en < 300


def test_rate_sample_is_stable_across_runs(spark):
    df = _docs(spark, 500)
    a = {r["doc_id"] for r in stratified_sample(df, {"en": 0.3}, salt=9).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, {"en": 0.3}, salt=9).collect()}
    assert a == b
    c = {r["doc_id"] for r in stratified_sample(df, {"en": 0.3}, salt=10).collect()}
    assert a != c  # different salt, different draw


def test_take_exact_k_per_stratum(spark):
    rows = stratified_take(_docs(spark), 7, salt=7).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    assert all(len(v) == 7 for v in by_lang.values())
    # chosen = the 7 smallest hash buckets within each stratum
    langs = ["en", "de", "fr", "zh"]
    for li, lang in enumerate(langs):
        ids = [i for i in range(2000) if i % 4 == li]
        want = set(sorted(ids, key=lambda i: (py_bucket(i), i))[:7])
        assert by_lang[lang] == want


def test_take_caps_at_stratum_size(spark):
    rows = stratified_take(_docs(spark, 10), 100, salt=7).collect()
    assert len(rows) == 10


def test_mix_weights_uniform_target(spark):
    from fog_spark.datapipe.sampling import mix_weights

    # skewed corpus: en 1200, de 400, fr 300, zh 100
    pdf = pd.DataFrame({
        "doc_id": range(2000),
        "lang": ["en"] * 1200 + ["de"] * 400 + ["fr"] * 300 + ["zh"] * 100,
    })
    rows = {r["stratum"]: r for r in
            mix_weights(spark.createDataFrame(pdf)).collect()}
    # uniform target = 500 each; zh (smallest) capped at 1.0
    assert rows["zh"]["rate_r"] == 1.0
    assert abs(rows["en"]["rate_r"] - 500 / 1200) < 1e-6
    assert rows["de"]["rate_r"] == 1.0  # 500/400 > 1 -> capped
    assert abs(rows["en"]["expected_r"] - 500.0) < 1e-3


def test_mix_weights_explicit_target(spark):
    from fog_spark.datapipe.sampling import mix_weights

    pdf = pd.DataFrame({
        "doc_id": range(1000),
        "lang": ["en"] * 800 + ["de"] * 200,
    })
    rows = {r["stratum"]: r for r in
            mix_weights(spark.createDataFrame(pdf),
                        target={"en": 0.5, "de": 0.5}).collect()}
    assert abs(rows["en"]["rate_r"] - 500 / 800) < 1e-6
    assert rows["de"]["rate_r"] == 1.0
    # unlisted strata get share 0 -> rate 0
    pdf2 = pd.DataFrame({"doc_id": range(100),
                         "lang": ["en"] * 50 + ["xx"] * 50})
    rows2 = {r["stratum"]: r for r in
             mix_weights(spark.createDataFrame(pdf2),
                         target={"en": 1.0}).collect()}
    assert rows2["xx"]["rate_r"] == 0.0
