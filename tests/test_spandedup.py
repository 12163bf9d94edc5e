"""Repeated-span (substring) dedup tests. Corpus-level parity is
oracle-checked by q_repeated_spans in tests/test_entry_oracle.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark

SHARED = "one two three four five six seven eight"  # 8 tokens


def _docs(spark):
    rows = [
        (1, f"intro {SHARED} outro"),         # keeper (lowest id)
        (2, f"alpha beta {SHARED} gamma"),    # marked at pos 3
        (3, "totally unrelated text with no repeats here at all"),
        (4, SHARED),                           # marked at pos 1
        (5, "tiny doc"),                       # < window -> no spans
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_marks_non_keeper_occurrences(spark):
    from htmlparser2_spark.operators.spandedup import repeated_spans

    marks = repeated_spans(_docs(spark), window=8, min_docs=2)
    got = {(r["id"], r["pos"]): r["n_docs"] for r in marks.collect()}
    assert got == {(2, 3): 3, (4, 1): 3}  # doc 1 keeps; 3/5 clean


def test_strip_spans_surgery(spark):
    from htmlparser2_spark.operators.spandedup import (
        repeated_spans,
        strip_spans,
    )

    docs = _docs(spark)
    marks = repeated_spans(docs, window=8, min_docs=2)
    out = {r["id"]: r["clean_text"] for r in
           strip_spans(docs, marks).collect()}
    assert out[1] == f"intro {SHARED} outro"   # keeper untouched
    assert out[2] == "alpha beta gamma"
    assert out[4] == ""
    assert out[3].startswith("totally unrelated")
    assert out[5] == "tiny doc"


def test_strip_spans_pathological_mark_count(spark):
    """A boilerplate-heavy page with thousands of marks must stay
    linear: the old per-token exists() over the mark set went
    O(tokens x marks) inside one row (VERDICT r2 item 5); the
    covered-set array_except shape is O(tokens + marked area)."""
    import time

    from htmlparser2_spark.operators.spandedup import strip_spans

    n_toks, w = 100_000, 8
    text = " ".join(f"t{i}" for i in range(n_toks))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # 2000 disjoint marks covering positions 1..16000.
    marks = spark.createDataFrame(
        [(1, p, 3, w) for p in range(1, 2000 * w + 1, w)],
        "id long, pos int, n_docs long, window int",
    )
    t0 = time.monotonic()
    out = strip_spans(docs, marks).collect()
    elapsed = time.monotonic() - t0
    toks = out[0]["clean_text"].split(" ")
    assert len(toks) == n_toks - 2000 * w
    assert toks[0] == f"t{2000 * w}"  # 0-based token after covered 1..16000
    # Generous bound: the quadratic shape took minutes on this input.
    assert elapsed < 60, f"strip_spans took {elapsed:.1f}s"


def test_min_docs_threshold_and_within_doc_repeats(spark):
    from htmlparser2_spark.operators.spandedup import repeated_spans

    w = "a b c d"
    docs = spark.createDataFrame(
        [(1, f"{w} x {w}"), (2, "unrelated words entirely different")],
        "doc_id long, text string",
    )
    # The span repeats twice WITHIN doc 1 only: count_distinct(docs)=1,
    # below min_docs=2 -> no marks (within-doc repetition belongs to
    # the quality signals, not cross-doc dedup).
    assert repeated_spans(docs, window=4, min_docs=2).count() == 0
