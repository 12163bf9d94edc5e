"""Sliding-window document chunking tests. Corpus-level parity is
oracle-checked by q_chunks in tests/test_entry_oracle.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def _chunks(spark, rows, **kw):
    from htmlparser2_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, **kw).collect()
    return sorted(
        (r["id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in out
    )


def test_windows_and_overlap(spark):
    text = " ".join(str(i) for i in range(10))  # tokens 0..9
    got = _chunks(spark, [(1, text)], chunk_tokens=4, overlap=1)
    # stride 3, last start capped at n - overlap - 1 = 8 so the
    # tail window is never fully contained in its predecessor:
    # starts 0,3,6 — full coverage, no start 9.
    assert got == [
        (1, 0, 4, "0 1 2 3"),
        (1, 1, 4, "3 4 5 6"),
        (1, 2, 4, "6 7 8 9"),
    ]


def test_short_empty_null_docs(spark):
    got = _chunks(
        spark, [(1, "a b"), (2, ""), (3, None)], chunk_tokens=5, overlap=2
    )
    assert got == [(1, 0, 2, "a b")]


def test_whitespace_runs_collapse(spark):
    got = _chunks(spark, [(1, "a  b \t\n c")], chunk_tokens=2, overlap=0)
    # \s+ split, same convention as textstats.n_tokens
    assert got == [(1, 0, 2, "a b"), (1, 1, 1, "c")]


def test_invalid_overlap_rejected(spark):
    from htmlparser2_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=-1)
