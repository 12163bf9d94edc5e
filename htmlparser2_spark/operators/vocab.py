"""Corpus vocabulary statistics (tokenizer-training prep).

The step before training a subword tokenizer or building an idf
table: per-token corpus term frequency (tf) and document frequency
(df) over the shared whitespace-token convention
(``textstats.oracle_tokens`` — lowercased, empty-dropped, the same
boundary the LM scorer and hashed embeddings use), plus a
deterministic top-k cut.

Scale shape (10^12 documents): tokens explode, then TWO key-changing
shuffles — (doc, token) with map-side partial aggregation (shuffle
volume is distinct pairs per partition, not raw tokens), then
(token). Both keys are high-cardinality and well-spread; no global
sort ever runs for the top-k — ``orderBy().limit(k)`` compiles to
TakeOrderedAndProject (per-partition heap top-k merged on the
driver, k rows of driver state), and the rank column is a window
over only those k rows. Ties break on the token string ascending so
the cut is reproducible across engines and runs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.textstats import oracle_tokens

__all__ = ["vocab_counts", "vocab_topk", "doc_keywords"]


def _per_doc_counts(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, token, c): within-document token counts — the shared
    first level of every vocabulary statistic (ONE definition of the
    pair construction so tf/df and the keyword screen can't drift)."""
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(oracle_tokens(F.col(text_col))).alias("token"),
    )
    return pairs.groupBy("id", "token").agg(F.count(F.lit(1)).alias("c"))


def vocab_counts(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, tf, df): corpus term frequency and document frequency
    per distinct token. Two shuffles, both partially aggregated
    map-side; df comes from counting the per-document rows of the
    first aggregate rather than a count-distinct expand."""
    return _per_doc_counts(docs, text_col, id_col).groupBy("token").agg(
        F.sum("c").alias("tf"), F.count(F.lit(1)).alias("df")
    )


def vocab_topk(
    docs: DataFrame,
    k: int = 100,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(rank, token, tf, df): the k most frequent tokens, rank 1-based
    by (tf desc, token asc) — the token tiebreak makes the cut and
    the ranks engine-reproducible."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    top = (
        vocab_counts(docs, text_col=text_col, id_col=id_col)
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(k)
    )
    # Window over the k surviving rows only (single tiny partition by
    # construction — never over the full vocabulary).
    w = Window.orderBy(F.desc("tf"), F.asc("token"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        "token",
        "tf",
        "df",
    )


def doc_keywords(
    docs: DataFrame,
    n: int = 5,
    *,
    max_df_ratio: float = 0.3,
    broadcast_common: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool | StorageLevel = False,
) -> DataFrame:
    """(id, rank, token, c): the n most frequent tokens per document
    AFTER removing corpus-common tokens — keyword extraction for
    document metadata/tagging. "Common" = document frequency >=
    ceil(max_df_ratio * n_docs), the df-threshold stopword rule (no
    curated stopword list, so it adapts to any language mix).

    Deliberately all-integer scoring (tf within doc, df threshold,
    (c desc, token asc) ranking): exact across engines, where a
    float idf would make rank ties engine-dependent at the ulp.

    Scale shape: the per-document counts aggregate once and feed both
    consumers — the common-token set (token-keyed agg whose OUTPUT is
    stopword-sized at realistic ratios) and a LEFT ANTI join against
    that set (broadcast by default, map-only on the big side), then
    one id-keyed window for the top-n. n_docs is a count() scalar on
    the driver (one pass, vector-sized state, same pattern as the
    classifier/centroid collects). The per-doc aggregate feeds two
    consumers and recomputes per consumer unless materialized: pass
    ``persist=True`` (MEMORY_AND_DISK) or an explicit ``StorageLevel``
    to cache it so both consumers read InMemoryTableScan
    (plan-pinned). The cache lives until LRU eviction or
    ``spark.catalog.clearCache()``; long-lived callers should
    materialize the counts upstream and keep the handle to unpersist.

    Broadcast hazard, documented: the common set shrinks toward
    "stopwords" only when ``max_df_ratio * n_docs`` is comfortably
    above 2 — at tiny thresholds it approaches the FULL vocabulary,
    and a forced broadcast of that would OOM. Pass
    ``broadcast_common=False`` to let the optimizer pick the join
    strategy (AQE will still broadcast it when it is actually small).
    The degenerate threshold ``< 2`` (every token has df >= 1, so the
    screen would silently delete the whole corpus) raises instead.
    """
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    if not 0.0 < max_df_ratio <= 1.0:
        raise ValueError(f"max_df_ratio must be in (0, 1]: {max_df_ratio}")
    n_docs = docs.count()
    min_common_df = math.ceil(max_df_ratio * n_docs)
    # n_docs == 0 is a legitimate no-op (an upstream filter emptied
    # the corpus; nothing to screen, empty result) — the raise is only
    # for the silent-full-screen shape on a NON-empty corpus.
    if n_docs > 0 and min_common_df < 2:
        raise ValueError(
            f"ceil(max_df_ratio * n_docs) = {min_common_df} screens "
            f"EVERY token (df >= 1 always) — the corpus ({n_docs} docs) "
            f"is too small for max_df_ratio={max_df_ratio}"
        )
    per_doc = _per_doc_counts(docs, text_col, id_col)
    if persist:
        level = (
            persist
            if isinstance(persist, StorageLevel)
            else StorageLevel.MEMORY_AND_DISK
        )
        per_doc = per_doc.persist(level)
    common = (
        per_doc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_common_df)
        .select("token")
    )
    if broadcast_common:
        common = F.broadcast(common)
    kept = per_doc.join(common, "token", "left_anti")
    w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("token"))
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n)
        .select("id", "rank", "token", "c")
    )
