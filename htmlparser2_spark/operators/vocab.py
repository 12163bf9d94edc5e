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

from ..functions.textstats import oracle_tokens

__all__ = ["vocab_counts", "vocab_topk", "doc_keywords"]


def vocab_counts(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(token, tf, df): corpus term frequency and document frequency
    per distinct token. Two shuffles, both partially aggregated
    map-side; df comes from counting the per-document rows of the
    first aggregate rather than a count-distinct expand."""
    pairs = docs.select(
        F.col(id_col).alias("id"),
        F.explode(oracle_tokens(F.col(text_col))).alias("token"),
    )
    per_doc = pairs.groupBy("id", "token").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_doc.groupBy("token").agg(
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
    text_col: str = "text",
    id_col: str = "doc_id",
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
    stopword-sized) and a broadcast LEFT ANTI join against that set
    (map-only on the big side), then one id-keyed window for the
    top-n. n_docs is a count() scalar on the driver (one pass,
    vector-sized state, same pattern as the classifier/centroid
    collects). The per-doc aggregate is recomputed by the two
    consumers unless the caller persists it; at corpus scale prefer
    ``docs_counts = per-doc counts; docs_counts.persist()`` semantics
    by materializing upstream — documented rather than hidden.
    """
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    if not 0.0 < max_df_ratio <= 1.0:
        raise ValueError(f"max_df_ratio must be in (0, 1]: {max_df_ratio}")
    n_docs = docs.count()
    min_common_df = math.ceil(max_df_ratio * n_docs)
    per_doc = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(oracle_tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    common = (
        per_doc.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_common_df)
        .select("token")
    )
    kept = per_doc.join(F.broadcast(common), "token", "left_anti")
    w = Window.partitionBy("id").orderBy(F.desc("c"), F.asc("token"))
    return (
        kept.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= n)
        .select("id", "rank", "token", "c")
    )
