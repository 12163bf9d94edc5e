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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

__all__ = ["chunk_documents"]


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
    toks = F.filter(
        tokens(F.coalesce(F.col(text_col), F.lit(""))),
        lambda x: x != F.lit(""),
    )
    n = F.size(toks)
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
    exploded = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
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
