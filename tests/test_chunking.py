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


def _packed(spark, rows, **kw):
    from htmlparser2_spark.operators.chunking import pack_paragraph_chunks

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_paragraph_chunks(df, **kw).collect()
    return sorted(
        (r["id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in out
    )


def test_pack_respects_paragraph_boundaries(spark):
    # Paragraphs of 2/3/2/4 tokens, budget 5: prefix sums 0,2,5,7 ->
    # chunks floor(0/5)=0, floor(2/5)=0, floor(5/5)=1, floor(7/5)=1.
    text = "a b\n\nc d e\n\n\nf g\n\nh i j k"
    got = _packed(spark, [(1, text)], chunk_tokens=5)
    assert got == [
        (1, 0, 5, "a b\n\nc d e"),
        (1, 1, 6, "f g\n\nh i j k"),
    ]


def test_pack_oversized_paragraph_owns_chunk(spark):
    # 8-token paragraph with budget 3: owns chunk 0 whole (never
    # split); the next paragraph starts at prefix 8 -> chunk 2.
    text = "1 2 3 4 5 6 7 8\n\nx y"
    got = _packed(spark, [(1, text)], chunk_tokens=3)
    assert got == [(1, 0, 8, "1 2 3 4 5 6 7 8"), (1, 2, 2, "x y")]


def test_pack_blank_and_empty_docs(spark):
    got = _packed(
        spark,
        [(1, "only one para"), (2, ""), (3, None), (4, " \n\n \t\n\n ")],
        chunk_tokens=10,
    )
    assert got == [(1, 0, 3, "only one para")]


def test_pack_single_exchange_plan(spark):
    """The docstring's scale claim, pinned: HashPartitioning(id) from
    the prefix-sum window satisfies the (id, chunk_idx) groupBy
    clustering, so the whole pack is ONE exchange."""
    from htmlparser2_spark.operators.chunking import pack_paragraph_chunks

    df = spark.createDataFrame(
        [(1, "a b\n\nc d")], "doc_id long, text string"
    )
    plan = (
        pack_paragraph_chunks(df, chunk_tokens=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pack_rejects_bad_budget(spark):
    from htmlparser2_spark.operators.chunking import pack_paragraph_chunks

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_paragraph_chunks(df, chunk_tokens=0)


def test_pack_crlf_blank_lines(spark):
    """The default separator must treat CRLF blank lines as paragraph
    breaks — '\\n{2,}' alone never matches '\\r\\n\\r\\n' and would
    silently pack Windows-line-ending text into one whole-document
    chunk per doc."""
    got = _packed(
        spark, [(1, "a b c\r\n\r\nd e f\r\n\r\ng h")], chunk_tokens=4
    )
    # Token counts 3,3,2 -> prefixes 0,3,6 -> buckets 0,0,1.
    assert [(i, c, n) for i, c, n, _ in got] == [(1, 0, 6), (1, 1, 2)]
    assert got[0][3] == "a b c\n\nd e f"
    assert got[1][3] == "g h"


def test_pack_differential_vs_python_reference(spark):
    """Seeded differential: 200 random documents (mixed LF/CRLF blank
    lines, tabs, NBSP — NBSP is NOT whitespace to Java's ASCII \\s,
    and the reference impl spells the same class out) packed by a
    pure-Python reimplementation of the prefix-sum bucketing rule,
    compared exactly against the Spark operator in one pass."""
    import random
    import re

    from htmlparser2_spark.operators.chunking import pack_paragraph_chunks

    rng = random.Random(20260818)
    words = ["alpha", "beta", "g\xe9", "x", "longerword", "1.5", "\xa0pad"]
    seps = ["\n\n", "\r\n\r\n", "\n\n\n", "\r\n\r\n\r\n"]

    def make_doc():
        paras = []
        for _ in range(rng.randint(0, 6)):
            n = rng.randint(0, 8)
            joiner = rng.choice([" ", "  ", " \t ", "\n"])
            paras.append(joiner.join(rng.choice(words) for _ in range(n)))
        return rng.choice(seps).join(paras) if paras else rng.choice(["", " ", None])

    docs = [(i, make_doc()) for i in range(200)]
    budget = 7

    def ref_pack(text):
        if text is None:
            return {}
        paras = [
            p
            for p in re.split(r"(?:\r?\n){2,}", text)
            if re.search(r"[^ \t\n\r\f\x0b]", p)
        ]
        chunks = {}
        pre = 0
        for p in paras:
            c = len([t for t in re.split(r"[ \t\n\r\f\x0b]+", p) if t])
            cid = pre // budget
            toks, ps = chunks.setdefault(cid, [0, []])
            chunks[cid][0] = toks + c
            ps.append(p)
            pre += c
        return {
            cid: (n, "\n\n".join(ps)) for cid, (n, ps) in chunks.items()
        }

    want = {
        (i, cid): v
        for i, t in docs
        for cid, v in ref_pack(t).items()
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in pack_paragraph_chunks(df, chunk_tokens=budget).collect()
    }
    assert got == want
