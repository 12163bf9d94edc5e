"""Feature-hashing embedding tests: exact parity with an independent
Python md5 re-implementation, zero-vector edge, and integration with
the similarity stack. Cross-engine parity is oracle-checked by
q_hash_embed in tests/test_entry_oracle.py."""

from __future__ import annotations

import hashlib
import math

import pytest

pytestmark = pytest.mark.spark


def _py_embed(text, dim):
    toks = [t for t in text.lower().split(" ") if t]
    vec = [0.0] * dim
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % (2 * dim)
        vec[h % dim] += -1.0 if h >= dim else 1.0
    norm = math.sqrt(sum(v * v for v in vec))
    return vec if norm == 0 else [v / norm for v in vec]


def test_matches_python_reference_exactly(spark):
    from pyspark.sql import functions as F

    from htmlparser2_spark.functions.embeddings import hashed_embedding

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "Mixed CASE Tokens repeat repeat repeat",
        "",
        "solo",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["e"]
        for r in df.select(
            hashed_embedding(F.col("text"), dim=16).alias("e")
        ).collect()
    ]
    for text, vec in zip(texts, got):
        assert vec == _py_embed(text, 16), text


def test_zero_vector_and_unit_norm(spark):
    from pyspark.sql import functions as F

    from htmlparser2_spark.functions.embeddings import hashed_embedding

    df = spark.createDataFrame([("",), ("some words here",)], "text string")
    e0, e1 = [
        r["e"]
        for r in df.select(
            hashed_embedding(F.col("text"), dim=8).alias("e")
        ).collect()
    ]
    assert e0 == [0.0] * 8
    assert math.sqrt(sum(v * v for v in e1)) == pytest.approx(1.0)


def test_feeds_similarity_stack(spark):
    """Hashed embeddings drive brute-force ANN: a near-duplicate text
    ranks closer to its source than an unrelated one."""
    from htmlparser2_spark.functions.embeddings import embed_docs
    from htmlparser2_spark.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different subject matter entirely unrelated"),
        ],
        "doc_id long, text string",
    )
    emb = embed_docs(docs, dim=32)
    top = brute_force_topk(
        emb.filter("doc_id = 1"),
        emb.filter("doc_id != 1"),
        k=2,
        id_col="doc_id",
    ).collect()
    ranked = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranked == [2, 3]


def test_null_text_zero_vector(spark):
    """NULL text must produce the zero vector (not NULL), exactly like
    the empty string — the documented invariant downstream cosine
    relies on, and what the DuckDB oracle's COALESCE computes."""
    from pyspark.sql import functions as F

    from htmlparser2_spark.functions.embeddings import hashed_embedding

    df = spark.createDataFrame([(None,), ("",)], "text string")
    vecs = [
        r["e"]
        for r in df.select(
            hashed_embedding(F.col("text"), dim=8).alias("e")
        ).collect()
    ]
    assert vecs == [[0.0] * 8, [0.0] * 8]
