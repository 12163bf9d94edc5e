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


def test_doc_keywords(spark):
    from htmlparser2_spark.operators.vocab import doc_keywords

    # "common" appears in 3/4 docs -> df 3 >= ceil(0.5*4)=2 -> removed.
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra apple"),
            (2, "common apple banana banana banana"),
            (3, "common solo"),
            (4, "quiet words only"),
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["id"], r["rank"], r["token"], r["c"])
        for r in doc_keywords(docs, n=2, max_df_ratio=0.5).collect()
    )
    # apple also hits df 2 -> removed; count-tie in doc 4 breaks on
    # the token string ascending.
    assert rows == [
        (1, 1, "zebra", 2),
        (2, 1, "banana", 3),
        (3, 1, "solo", 1),
        (4, 1, "only", 1),
        (4, 2, "quiet", 1),
    ]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        doc_keywords(docs, n=0)
    with _pytest.raises(ValueError):
        doc_keywords(docs, max_df_ratio=0.0)
    # Degenerate threshold: ceil(0.1 * 4) = 1 would screen EVERY
    # token (df >= 1 always) — silent-empty is rejected loudly.
    with _pytest.raises(ValueError, match="too small"):
        doc_keywords(docs, max_df_ratio=0.1)


def test_doc_keywords_broadcast_anti_join(spark):
    """Scale claim pinned on a NON-degenerate dataset (screen removes
    'common', keeps the rest): the common-token removal is a
    broadcast LEFT ANTI join — the big per-doc side is never
    re-shuffled for the screen — and broadcast_common=False hands the
    choice back to the optimizer."""
    from htmlparser2_spark.operators.vocab import doc_keywords

    docs = spark.createDataFrame(
        [
            (1, "common alpha"),
            (2, "common beta"),
            (3, "common gamma"),
            (4, "delta"),
        ],
        "doc_id long, text string",
    )
    kw = doc_keywords(docs, n=1, max_df_ratio=0.5)
    plan = kw._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    got = sorted((r["id"], r["token"]) for r in kw.collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")]

    unhinted = doc_keywords(
        docs, n=1, max_df_ratio=0.5, broadcast_common=False
    )
    assert sorted(
        (r["id"], r["token"]) for r in unhinted.collect()
    ) == got


def test_doc_keywords_empty_corpus_is_noop(spark):
    """n_docs == 0 is a legitimate no-op (upstream filter emptied the
    corpus) — empty result with the right schema, NOT the
    degenerate-threshold raise."""
    from htmlparser2_spark.operators.vocab import doc_keywords

    docs = spark.createDataFrame([], "doc_id long, text string")
    out = doc_keywords(docs, n=2)
    assert out.columns == ["id", "rank", "token", "c"]
    assert out.count() == 0


def test_doc_keywords_persist_collapses_double_scan(spark):
    """persist=True caches the per-doc counts: the common-token
    aggregate and the anti-join side both read InMemoryTableScan, and
    results match the default plan exactly."""
    import contextlib
    import io

    from htmlparser2_spark.operators.vocab import doc_keywords

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = doc_keywords(docs, n=3)
    cached = doc_keywords(docs, n=3, persist=True)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cached.explain("formatted")
        p = buf.getvalue()
        assert p.count("InMemoryTableScan") >= 2, p
        got = sorted(tuple(r) for r in cached.collect())
        want = sorted(tuple(r) for r in plain.collect())
        assert got == want
    finally:
        spark.catalog.clearCache()
