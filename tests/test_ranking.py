"""BM25 ranked retrieval (operators/ranking.py): hand-checked math,
OOV behavior, salt invariance, and the broadcast/plan shape."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from htmlparser2_spark.operators.ranking import bm25_topk

pytestmark = pytest.mark.spark


def _mk(spark, rows, qrows):
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    qs = spark.createDataFrame(qrows, "query_id string, query_text string")
    return docs, qs


def _bm25_py(corpus, qterms, k1=1.2, b=0.75):
    """Reference scorer over (id, tokens) pairs."""
    n = len(corpus)
    avgdl = sum(len(t) for _, t in corpus) / n
    out = {}
    for qt in set(qterms):
        df = sum(1 for _, toks in corpus if qt in toks)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, toks in corpus:
            tf = toks.count(qt)
            if tf:
                out[i] = out.get(i, 0.0) + idf * (
                    tf * (1.0 + k1) / (tf + k1 * (1.0 - b + b * len(toks) / avgdl))
                )
    return {i: round(s, 4) for i, s in out.items()}


def test_bm25_hand_math(spark):
    rows = [
        (1, "red fox red"),
        (2, "red dog"),
        (3, "blue cat"),
    ]
    docs, qs = _mk(spark, rows, [("q", "red fox")])
    got = {
        (r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_topk(docs, qs, k=3).collect()
    }
    corpus = [(i, t.split()) for i, t in rows]
    want = _bm25_py(corpus, ["red", "fox"])
    assert set(got) == set(want)
    # doc 1 has both terms (fox is rare -> high idf) and must rank 1st
    assert got[1][0] == 1
    for i, (_rank, score) in got.items():
        assert score == pytest.approx(want[i], abs=1e-4)


def test_bm25_oov_term_contributes_nothing(spark):
    rows = [(1, "red fox"), (2, "red dog")]
    docs, qs = _mk(
        spark, rows, [("a", "red"), ("b", "red zzznope")]
    )
    res = bm25_topk(docs, qs, k=5).collect()
    a = {r["doc_id"]: r["score"] for r in res if r["query_id"] == "a"}
    b = {r["doc_id"]: r["score"] for r in res if r["query_id"] == "b"}
    assert a == b  # the OOV term adds no score and no rows


def test_bm25_query_term_multiplicity_ignored(spark):
    rows = [(1, "red fox"), (2, "red dog")]
    docs, qs = _mk(spark, rows, [("a", "red"), ("b", "red red RED")])
    res = bm25_topk(docs, qs, k=5).collect()
    a = {r["doc_id"]: r["score"] for r in res if r["query_id"] == "a"}
    b = {r["doc_id"]: r["score"] for r in res if r["query_id"] == "b"}
    assert a == b


def test_bm25_salt_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qs = spark.createDataFrame(
        [("q1", "fast table scan"), ("q2", "window")],
        "query_id string, query_text string",
    )
    outs = [
        sorted(
            map(tuple, bm25_topk(docs, qs, k=7, salt_buckets=sb).collect())
        )
        for sb in (1, 4, 32)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_bm25_validation(spark):
    docs, qs = _mk(spark, [(1, "x")], [("q", "x")])
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, k=0)
    with pytest.raises(ValueError):
        bm25_topk(docs, qs, k=1, salt_buckets=0)


def test_bm25_plan_shape(spark):
    """Query terms and the df table join broadcast (the corpus side is
    never reshuffled for them), and both the salted pre-window and the
    exact window appear."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qs = spark.createDataFrame(
        [("q1", "fast table scan")], "query_id string, query_text string"
    )
    df = bm25_topk(docs, qs, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert p.count("BroadcastHashJoin") >= 2, p
    # Detail-section headers: "(n) Window\n" (") Window" alone would
    # also match WindowGroupLimit). Salted pre-top-k + exact = 2, and
    # Spark 4's rank-limit pushdown must keep both group-limited.
    assert p.count(") Window\n") == 2, p
    assert "WindowGroupLimit" in p, p


def test_bm25_persist_collapses_double_scan(spark):
    """persist=True caches the per-document counts: both consumers
    (match join + df aggregate) must read InMemoryTableScan, and the
    persisted and default plans must score identically."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qs = spark.createDataFrame(
        [("q1", "fast table scan")], "query_id string, query_text string"
    )
    plain = bm25_topk(docs, qs, k=5)
    cached = bm25_topk(docs, qs, k=5, persist=True)
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            cached.explain("formatted")
        p = buf.getvalue()
        assert p.count("InMemoryTableScan") >= 2, p
        got = [tuple(r) for r in cached.collect()]
        want = [tuple(r) for r in plain.collect()]
        assert got == want
    finally:
        spark.catalog.clearCache()
