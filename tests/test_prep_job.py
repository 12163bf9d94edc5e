"""Corpus-prep composition tests (normalize -> span strip -> chunk ->
shard). Oracle parity for the composition is q_prep in
tests/test_entry_oracle.py."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark

BOILER = "this exact boiler plate sentence repeats across documents verbatim"


def test_prep_funnel_and_stages(spark):
    from htmlparser2_spark.plans.prep_job import run_prep

    docs = spark.createDataFrame(
        [
            (1, f"“unique” words for document one {BOILER} tail bits"),
            (2, f"other distinct content here {BOILER} trailing text"),
            (3, BOILER),  # only boilerplate: empties after strip
            (4, "ctrl\x01 chars  and   runs"),
        ],
        "doc_id long, text string",
    )
    chunks, funnel = run_prep(
        docs,
        chunk_tokens=6,
        overlap=1,
        span_window=9,
        shard_tokens=10,
        n_groups=2,
    )
    counts = {r["stage"]: r["n_rows"] for r in funnel.collect()}
    assert counts["ingest_docs"] == 4
    assert counts["normalized_docs"] == 4
    # doc 3 is pure boilerplate (keeper is doc 1) -> stripped empty
    assert counts["span_stripped_docs"] == 3
    assert counts["chunks"] >= 3
    assert "sharded_chunks" not in counts  # withColumn-only, no stage

    rows = chunks.collect()
    texts = {(r["id"], r["chunk_idx"]): r["chunk_text"] for r in rows}
    # normalization applied (quotes folded, ctrl stripped, runs collapsed)
    assert texts[(4, 0)] == "ctrl chars and runs"
    assert any('"unique"' in t for t in texts.values())
    # boilerplate survives only in keeper doc 1's chunks
    joined = {i: " ".join(t for (d, _), t in sorted(texts.items()) if d == i)
              for i in (1, 2)}
    assert "boiler plate sentence" in joined[1]
    assert "boiler plate sentence" not in joined[2]
    # every chunk carries a shard assignment
    assert all(r["shard"] >= 0 and r["grp"] in (0, 1) for r in rows)


def test_prep_repair_mojibake_before_normalize(spark):
    """repair_mojibake=True must fix double-encoded text BEFORE the
    codepoint scrub — normalize strips the C1 controls the mojibake
    encoding is made of, so the reversed order would corrupt."""
    from htmlparser2_spark.plans.prep_job import run_prep

    orig = "em dash — here and caf\xe9 text words enough for chunks"
    moji = orig.encode("utf-8").decode("latin-1")
    docs = spark.createDataFrame(
        [(1, moji), (2, orig)], "doc_id long, text string"
    )
    chunks, _ = run_prep(
        docs, chunk_tokens=20, overlap=0, repair_mojibake=True
    )
    texts = {r["id"]: r["chunk_text"] for r in chunks.collect()}
    # Both repair+normalize to the same canonical text (em dash folds
    # to '-', caf\xe9 survives as a real codepoint).
    want = orig.replace("—", "-")
    assert texts[1] == want and texts[2] == want

    # Default (no repair): the mojibake C1 controls are stripped by
    # normalize and the text stays corrupted — the flag matters.
    chunks_off, _ = run_prep(docs, chunk_tokens=20, overlap=0)
    off = {r["id"]: r["chunk_text"] for r in chunks_off.collect()}
    assert "caf\xe9" not in off[1] and "\xc3" in off[1]


def test_prep_paragraph_chunker(spark):
    """chunker='paragraphs' swaps in boundary-respecting packing:
    chunk boundaries land only on blank lines (which normalize_text
    preserves), the shard stage runs unchanged over the renamed
    chunk_idx, and a non-default overlap is rejected loudly."""
    from htmlparser2_spark.plans.prep_job import run_prep

    para = "some words fill this paragraph body"  # 6 tokens
    docs = spark.createDataFrame(
        [(1, "\n\n".join([para] * 5)), (2, "tiny doc")],
        "doc_id long, text string",
    )
    chunks, funnel = run_prep(
        docs, chunk_tokens=10, chunker="paragraphs",
        shard_tokens=30, n_groups=2,
    )
    rows = sorted(
        (r["id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunks.collect()
    )
    # Prefix sums 0,6,12,18,24 over budget 10 -> chunks 0,0,1,1,2:
    # every boundary a paragraph boundary, packs never overlap.
    assert [(i, c, n) for i, c, n, _ in rows] == [
        (1, 0, 12), (1, 1, 12), (1, 2, 6), (2, 0, 2),
    ]
    assert rows[0][3] == f"{para}\n\n{para}"
    counts = {r["stage"]: r["n_rows"] for r in funnel.collect()}
    assert counts["chunks"] == 4
    # shard columns present (token_budget_shards ran over chunk_idx)
    assert all(len(r) == 6 for r in chunks.collect())

    with pytest.raises(ValueError, match="overlap"):
        run_prep(docs, chunk_tokens=10, overlap=0, chunker="paragraphs")
    with pytest.raises(ValueError, match="chunker"):
        run_prep(docs, chunk_tokens=10, chunker="sentences")
    # span surgery re-joins tokens with single spaces, erasing the
    # blank-line boundaries the packer needs — rejected up-front.
    with pytest.raises(ValueError, match="span_window"):
        run_prep(docs, chunk_tokens=10, chunker="paragraphs",
                 span_window=9)
