"""Pretraining corpus preparation plan (the pipeline tail).

Where :func:`~htmlparser2_spark.plans.curate_job.run_curation` decides
WHICH documents survive, this plan turns the survivors into the
artifact a trainer actually reads:

1. **normalize** — codepoint scrub (:func:`functions.normalize.
   normalize_text`); map-only, runs first so dedup/chunk token
   boundaries see canonical text. ``repair_mojibake=True`` prepends
   the ftfy-style double-encoding fix (:func:`functions.normalize.
   fix_mojibake`) in the same projection — repair must precede the
   scrub because normalize strips the C1 controls mojibake is made
   of, destroying the evidence.
2. **span_strip** (optional, ``span_window``) — cross-document
   repeated spans marked and elided
   (:mod:`operators.spandedup`); documents emptied by the surgery
   drop out.
3. **chunk** — sliding windows of ``chunk_tokens`` with ``overlap``
   (:mod:`operators.chunking`); one training row per window.
   ``chunker="paragraphs"`` swaps in boundary-respecting paragraph
   packing (:func:`operators.chunking.pack_paragraph_chunks`) for
   corpora whose structure must survive — ``overlap`` does not apply
   there (paragraph packs never overlap) and must stay unset
   (``overlap=None``; the window path resolves None to 64). Paragraph
   boundaries (blank lines) survive normalize_text
   by design: the scrub collapses horizontal runs and spaces around
   newlines but never newline runs themselves. They do NOT survive
   span surgery — strip_spans re-joins surviving tokens with single
   spaces — so ``span_window`` with the paragraph chunker is rejected
   loudly rather than silently producing whole-document chunks.
4. **shard** — token-budget shard assignment over the chunks
   (:func:`operators.sampling.token_budget_shards`), grouped-packing
   with no global sort.

Returns ``(chunks, funnel)``: chunk rows are (id, chunk_idx,
n_chunk_tokens, chunk_text, grp, shard); the funnel counts rows per
stage (documents through span_strip, chunks afterwards — the unit
changes at the chunk stage and the stage names say so; sharding is
withColumn-only and gets no redundant stage count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import fix_mojibake, normalize_text
from ..operators.chunking import chunk_documents, pack_paragraph_chunks
from ..operators.sampling import token_budget_shards
from ..operators.spandedup import repeated_spans, strip_spans
from .funnel import build_funnel, lazy_checkpointer

__all__ = ["run_prep"]


def run_prep(
    docs: DataFrame,
    *,
    chunk_tokens: int = 512,
    overlap: int | None = None,
    chunker: str = "window",
    span_window: int | None = None,
    span_min_docs: int = 2,
    repair_mojibake: bool = False,
    shard_tokens: int = 1_000_000,
    n_groups: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_hash=None,
    checkpoint_stages: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """See module docstring. ``span_window=None`` skips span surgery.
    ``shard_hash`` (Column -> Column) overrides the shard-group hash
    of the chunk key — pass ``operators.sampling.portable_hash`` when
    the layout must be reproducible outside Spark."""
    if chunker not in ("window", "paragraphs"):
        raise ValueError(f"unknown chunker: {chunker!r}")
    if chunker == "window":
        # None is the true "unset" sentinel (an explicit 64 and the
        # old default were indistinguishable, and the paragraphs gate
        # would silently drift if the default were ever retuned).
        overlap = 64 if overlap is None else overlap
    else:  # paragraphs
        if overlap is not None:
            raise ValueError(
                "overlap does not apply to chunker='paragraphs' "
                "(paragraph packs never overlap); leave it unset"
            )
        if span_window is not None:
            raise ValueError(
                "span_window is incompatible with chunker='paragraphs': "
                "strip_spans re-joins tokens with single spaces, erasing "
                "the blank-line paragraph boundaries the packer needs"
            )
    maybe_ckpt = lazy_checkpointer(checkpoint_stages)
    stages: list[tuple[str, DataFrame]] = [("ingest_docs", docs)]

    t = F.col(text_col)
    if repair_mojibake:
        t = fix_mojibake(t)
    cur = maybe_ckpt(
        docs.select(
            F.col(id_col),
            normalize_text(t).alias(text_col),
        )
    )
    stages.append(("normalized_docs", cur))

    if span_window is not None:
        marks = repeated_spans(
            cur,
            window=span_window,
            min_docs=span_min_docs,
            text_col=text_col,
            id_col=id_col,
        )
        stripped = strip_spans(
            cur, marks, text_col=text_col, id_col=id_col
        ).withColumnsRenamed({"id": id_col, "clean_text": text_col})
        cur = maybe_ckpt(stripped.filter(F.col(text_col) != ""))
        stages.append(("span_stripped_docs", cur))

    if chunker == "window":
        chunked = chunk_documents(
            cur,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            text_col=text_col,
            id_col=id_col,
        )
    else:  # chunker == "paragraphs", validated up-front
        chunked = pack_paragraph_chunks(
            cur,
            chunk_tokens=chunk_tokens,
            text_col=text_col,
            id_col=id_col,
        )
    chunks = maybe_ckpt(chunked)
    stages.append(("chunks", chunks))

    sharded = maybe_ckpt(
        token_budget_shards(
            chunks.withColumn(
                "chunk_key",
                F.concat_ws("#", F.col("id"), F.col("chunk_idx")),
            ),
            tokens_col="n_chunk_tokens",
            shard_tokens=shard_tokens,
            n_groups=n_groups,
            key_col="chunk_key",
            hash_expr=(
                shard_hash(F.col("chunk_key"))
                if shard_hash is not None
                else None
            ),
        ).drop("chunk_key")
    )
    # No funnel stage for sharding: token_budget_shards is
    # withColumn-only (row count provably equals the chunk stage), so
    # a count there would cost a job and report nothing.

    return sharded, build_funnel(stages, "n_rows")
