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
