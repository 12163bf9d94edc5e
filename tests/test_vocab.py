"""Vocabulary statistics tests. Corpus-level parity is oracle-checked
by q_vocab_topk in tests/test_entry_oracle.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


def test_vocab_counts_tf_df(spark):
    from htmlparser2_spark.operators.vocab import vocab_counts

    docs = spark.createDataFrame(
        [
            (1, "the cat and the hat"),
            (2, "The   cat"),          # lowercased, runs dropped
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["token"]: (r["tf"], r["df"]) for r in vocab_counts(docs).collect()
    }
    assert got == {
        "the": (3, 2),   # tf counts every occurrence, df distinct docs
        "cat": (2, 2),
        "and": (1, 1),
        "hat": (1, 1),
    }


def test_vocab_topk_rank_and_ties(spark):
    from htmlparser2_spark.operators.vocab import vocab_topk

    docs = spark.createDataFrame(
        [(1, "b b a a c")], "doc_id long, text string"
    )
    rows = [
        (r["rank"], r["token"], r["tf"], r["df"])
        for r in vocab_topk(docs, k=2).collect()
    ]
    # tf tie between a and b breaks on the token string ascending;
    # c (tf 1) falls outside k=2.
    assert rows == [(1, "a", 2, 1), (2, "b", 2, 1)]

    with pytest.raises(ValueError):
        vocab_topk(docs, k=0)


def test_vocab_topk_never_global_sorts(spark):
    """The docstring's scale claim, pinned: the k-cut compiles to
    TakeOrderedAndProject (per-partition heaps), never a full-corpus
    Sort + global exchange."""
    from htmlparser2_spark.operators.vocab import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = (
        vocab_topk(docs, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
