"""Document chunking into fixed-token training windows.

The last hop before tokenization in a pretraining pipeline: long
documents split into ``chunk_tokens``-sized windows with
``overlap``-token context carry-over (the standard sliding-window
recipe). Pure Catalyst — token split, window starts, slicing, and
reassembly are all array expressions inside one Project, so chunking
10^12 documents is a map-only pass with output size bounded by
``n_tokens / (chunk_tokens - overlap)`` rows per document.

Determinism contract: windows start at fixed stride offsets
(0, stride, 2*stride, ...) capped so every window contributes at
least one token beyond the previous window's overlap (a tail start
inside the final overlap region would emit a window fully contained
in its predecessor — duplicated training data the dedup stages exist
to prevent); the windows jointly cover every token, a document
shorter than one window yields exactly one chunk, and an empty/NULL
document yields none. Tokens split on whitespace runs exactly like
``textstats.tokens()``/``n_tokens`` (so chunk budgets agree with the
token counters and shard packing); chunk text is the space-joined
token slice — original whitespace collapses, and byte-faithful
splitting belongs upstream of the token boundary, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import tokens

__all__ = ["chunk_documents", "pack_paragraph_chunks"]


def chunk_documents(
    df: DataFrame,
    *,
    chunk_tokens: int = 512,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_text) per window.

    ``overlap`` must be smaller than ``chunk_tokens``; the stride is
    their difference. The final window may be shorter than
    ``chunk_tokens`` (never empty)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap}) < chunk_tokens ({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    # Token array bound as a real column first: the window-start
    # arithmetic references it four times, and each reference to an
    # inline filter(split()) expression re-tokenizes the row (no
    # subexpression elimination for interpreted HOF expressions).
    bound = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            tokens(F.coalesce(F.col(text_col), F.lit(""))),
            lambda x: x != F.lit(""),
        ).alias("toks"),
    )
    n = F.size(F.col("toks"))
    # Last start must satisfy start <= n - overlap - 1 (each window
    # adds >= 1 non-overlap token); greatest(0) keeps one window for
    # docs shorter than overlap+1 tokens.
    starts = F.when(
        n > 0,
        F.sequence(
            F.lit(0),
            F.greatest(n - overlap - 1, F.lit(0)),
            F.lit(stride),
        ),
    ).otherwise(F.array().cast("array<int>"))
    exploded = bound.select(
        "id",
        "toks",
        n.alias("n"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    return exploded.select(
        "id",
        "chunk_idx",
        F.least(F.lit(chunk_tokens), F.col("n") - F.col("start")).alias(
            "n_chunk_tokens"
        ),
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, F.lit(chunk_tokens)),
            " ",
        ).alias("chunk_text"),
    )


def pack_paragraph_chunks(
    df: DataFrame,
    *,
    chunk_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_sep: str = "(?:\\r?\\n){2,}",
) -> DataFrame:
    """Boundary-respecting chunk packing: consecutive paragraphs pack
    into ~``chunk_tokens``-sized chunks that never cut inside a
    paragraph — the RAG/pretraining alternative to the sliding window
    when structure must survive (chunk_documents splits mid-sentence
    by design; this never does).

    Packing rule (deterministic, prefix-sum bucketing): a paragraph
    belongs to chunk ``floor(tokens_before_it / chunk_tokens)``, where
    ``tokens_before_it`` counts all earlier paragraphs in the
    document. Consequences, documented rather than hidden: every chunk
    boundary is a paragraph boundary; a chunk can exceed the budget by
    at most the tail of its last paragraph; a single paragraph larger
    than the budget owns its chunk whole (route hard-capped corpora
    through chunk_documents downstream if oversize chunks must split).
    Unlike greedy first-fit this rule is order-parallel — each
    paragraph's chunk id depends only on the prefix token sum, so the
    whole assignment is one within-document window, replayable exactly
    in ANSI SQL (the oracle does).

    Scale shape: paragraphs explode (output rows ~ paragraphs, bytes ~
    input text), then ONE shuffle keyed on the document id covers both
    the prefix-sum window and the chunk reassembly groupBy —
    HashPartitioning(id) satisfies the (id, chunk_idx) clustering, so
    Catalyst plans no second exchange. Token counts reuse
    ``textstats.tokens()`` (the shared whitespace convention the chunk
    budgets, shard packing, and token counters all agree on); the
    oracle's spelled-out class matches it exactly because Java's
    ``\\s`` is precisely ``[ \\t\\n\\x0B\\f\\r]``.

    Preconditions: ``id_col`` must be unique per document — the
    prefix-sum window partitions on it, so duplicate ids would
    interleave paragraphs from different rows nondeterministically
    (chunk_documents, being per-row, tolerates duplicates; this
    operator does not). The default ``para_sep`` matches LF and CRLF
    blank lines; other line-ending soup belongs upstream in
    normalize_text.

    Returns (id, chunk_idx, n_chunk_tokens, chunk_text); paragraphs
    joined back with a blank line. Unlike chunk_documents' contiguous
    ordinals, chunk_idx here is the prefix-sum BUCKET id — an
    oversize paragraph consumes several buckets, so ids can skip
    (0, 2, ...); gaps are meaningful, not missing rows. Empty/NULL
    documents yield no rows.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive: {chunk_tokens}")
    # Blank-paragraph filter via the spelled-out class, NOT trim():
    # Spark's trim strips only the space character, so a "\t"
    # paragraph would survive it and emit an empty zero-token chunk.
    paras = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), para_sep),
        lambda p: p.rlike("[^ \\t\\n\\r\\f\\x0B]"),
    )
    e = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(paras).alias("para_idx", "para"),
    ).withColumn(
        "n_para_tokens",
        F.size(F.filter(tokens(F.col("para")), lambda t: t != F.lit(""))),
    )
    before = (
        Window.partitionBy("id")
        .orderBy("para_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_para_tokens").over(before), F.lit(0))
    assigned = e.withColumn(
        "chunk_idx", F.floor(prefix / chunk_tokens).cast("int")
    )
    ordered = F.array_sort(F.collect_list(F.struct("para_idx", "para")))
    return assigned.groupBy("id", "chunk_idx").agg(
        F.sum("n_para_tokens").cast("int").alias("n_chunk_tokens"),
        F.array_join(
            F.transform(ordered, lambda s: s["para"]), "\n\n"
        ).alias("chunk_text"),
    )
