"""Sequence packing vs a brute-force single-threaded packer."""

import re

import pytest

from fog_spark.datapipe.packing import document_offsets, pack_documents

DOCS = [
    (0, "alpha beta gamma delta"),
    (1, ""),  # zero tokens: occupies no window space
    (2, "one two three four five six seven eight nine ten"),
    (3, "x " * 23),
    (4, "lone"),
    (5, "!!! ???"),  # punctuation only -> zero tokens
    (6, "end of the corpus stream with a tail crossing windows"),
]


def brute_pack(rows, window):
    toks = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in rows}
    manifest, pos = [], 0
    for i in sorted(toks):
        n = len(toks[i])
        if n == 0:
            continue
        start, end = pos, pos + n
        b = start // window
        while b * window < end:
            s = max(start, b * window)
            e = min(end, (b + 1) * window)
            manifest.append((b, i, s - start, s - b * window, e - s))
            b += 1
        pos = end
    return sorted(manifest)


@pytest.mark.parametrize("window", [8, 13, 512])
def test_pack_matches_brute_force(spark, window):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = sorted(
        (r["bin"], r["doc_id"], r["doc_off"], r["bin_off"], r["len"])
        for r in pack_documents(df, window=window).collect()
    )
    assert got == brute_pack(DOCS, window)


def test_pack_invariants(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = pack_documents(df, window=8).collect()
    by_bin: dict[int, list] = {}
    for r in rows:
        by_bin.setdefault(r["bin"], []).append(r)
    last = max(by_bin)
    for b, segs in by_bin.items():
        segs.sort(key=lambda r: r["bin_off"])
        covered = 0
        for s in segs:
            assert s["bin_off"] == covered  # contiguous, no gaps/overlap
            covered += s["len"]
        if b != last:
            assert covered == 8  # every non-final window is exactly full
    # each document's segments reassemble the whole document
    per_doc: dict[int, int] = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["len"]
    toks = {i: len(re.findall(r"[a-z0-9]+", t.lower())) for i, t in DOCS}
    assert per_doc == {i: n for i, n in toks.items() if n > 0}


def test_offsets_independent_of_partitioning(spark):
    """The distributed prefix sum must agree with the 1-partition run."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    many = {(r["id"], r["n_tok"], r["start"]) for r in document_offsets(df).collect()}
    one = {
        (r["id"], r["n_tok"], r["start"])
        for r in document_offsets(df.coalesce(1)).collect()
    }
    assert many == one
    starts = {r[0]: r[2] for r in many}
    assert starts[0] == 0 and starts[2] == 4  # doc 1 is empty, no gap


def test_document_offsets_tolerates_null_text(spark):
    """ADVICE r5: a NULL text row must count as 0 tokens, not crash the
    driver-side prefix sum with int(None)."""
    from fog_spark.datapipe.packing import document_offsets

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, None), (2, "gamma")], ["doc_id", "text"]
    )
    rows = {r["id"]: (r["n_tok"], r["start"]) for r in document_offsets(docs).collect()}
    assert rows[0] == (2, 0)
    assert rows[1] == (0, 2)
    assert rows[2] == (1, 2)
