"""PII scrubbing: counts, sequential masking order, digest stability."""

import hashlib

import pandas as pd

from fog_spark.datapipe.pii import pii_scrub


def _run(spark, texts, include_text=True):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    rows = pii_scrub(df, include_text=include_text).collect()
    return {r["id"]: r for r in rows}


def test_counts_and_masking(spark):
    out = _run(
        spark,
        [
            "write to alice@example.com or bob.smith+x@sub.domain.org today",
            "server at 10.1.2.3 and 192.168.0.255, call +1 (202) 555-0100",
            "no pii here at all",
            None,
        ],
    )
    r0 = out[0]
    assert (r0["n_emails"], r0["n_ipv4"], r0["n_phones"]) == (2, 0, 0)
    assert "<EMAIL>" in r0["masked"] and "@" not in r0["masked"]
    r1 = out[1]
    assert (r1["n_emails"], r1["n_ipv4"], r1["n_phones"]) == (0, 2, 1)
    assert r1["masked"] == "server at <IP> and <IP>, call <PHONE>"
    r2 = out[2]
    assert (r2["n_emails"], r2["n_ipv4"], r2["n_phones"]) == (0, 0, 0)
    assert r2["masked"] == "no pii here at all"
    r3 = out[3]
    assert r3["masked"] == "" and r3["masked_len"] == 0


def test_sequential_order_no_double_count(spark):
    # digits inside an email must NOT later count as phone/IP: the
    # email pass rewrites them to <EMAIL> before the later passes run.
    out = _run(spark, ["ping +123456789@ex.org now"])
    r = out[0]
    assert r["n_emails"] == 1
    # the '+' survives ('+' is not in the email local-part match start
    # here: pattern is greedy from the first [A-Za-z0-9._%+-]) — either
    # way nothing phone-shaped remains after masking.
    assert r["n_phones"] == 0 and r["n_ipv4"] == 0


def test_digest_matches_python(spark):
    out = _run(spark, ["mail x@y.io from 8.8.8.8"], include_text=True)
    r = out[0]
    expect = "mail <EMAIL> from <IP>"
    assert r["masked"] == expect
    assert r["masked_sha"] == hashlib.sha256(expect.encode()).hexdigest()
    assert r["masked_len"] == len(expect)
