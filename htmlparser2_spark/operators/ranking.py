"""BM25 ranked retrieval over the corpus (Robertson/Sparck Jones
probabilistic weighting, the Lucene non-negative idf variant) — the
"find training examples like X" / corpus-search operator of the
pipeline, and the relevance complement to the vocabulary statistics
in operators/vocab.py.

score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
idf(t)     = ln(1 + (N − df + 0.5)/(df + 0.5))

Token convention is the shared ``textstats.oracle_tokens`` boundary
(lowercased space-split), so query terms and document terms can never
disagree about tokenization. Query-term multiplicity is deliberately
ignored (distinct terms per query — the common web-search convention;
a weighted variant is one extra count column).

Determinism across engines: scores are rounded to ``round_dp`` BEFORE
ranking and ties break on the document id ascending, so the top-k cut
is reproducible between Spark and the DuckDB oracle even when libm
and java.lang.Math disagree in the last ulp (the same 4dp-then-rank
recipe as the perplexity buckets).

Scale shape (100 TB corpus, q queries, k results):
- per-document (id, token, tf) counts: ONE map-combined shuffle; the
  document length rides along from before the explode (a constant
  per id), so no second length join exists.
- query terms broadcast everywhere they appear (a query set is KB);
  the df table aggregates only tokens surviving that semi join —
  its output is ≤ |distinct query terms| rows, broadcast back.
- per-(query, doc) scores: one (query, id)-keyed aggregate.
- top-k per query is the hot-key window of the frontier/ANN family:
  q partitions would each sort every matching document. A salted
  partial top-k runs first — per (query, salt) keep the k best, a
  superset of the true top-k by the pigeonhole argument — so the
  exact window sorts ≤ salt_buckets·k rows per query.
- N and avgdl are ONE aggregate row cross-joined back (broadcast by
  construction: a single-row side is below every autoBroadcast
  threshold).
- the per-document counts feed two consumers (the match join and the
  df aggregate), and Catalyst expands the shared subtree into two
  scans unless it is materialized — pass ``persist=`` (same knob as
  ``vocab.doc_keywords``) to cache the counts and collapse the double
  scan into InMemoryTableScans; at corpus scale, or when running many
  query batches against one corpus snapshot, materialize upstream
  instead and keep the handle to unpersist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.textstats import oracle_tokens

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    round_dp: int = 4,
    salt_buckets: int = 32,
    persist: bool | StorageLevel = False,
) -> DataFrame:
    """(query_id, rank, doc_id, score): the k highest-BM25 documents
    per query, rank 1-based by (score desc, doc_id asc) over scores
    rounded to ``round_dp``. Documents sharing no term with a query
    never appear (score 0 by definition). ``queries`` must have
    unique ``query_id``s.

    ``persist``: ``True`` (MEMORY_AND_DISK) or an explicit
    ``StorageLevel`` caches the per-document (id, token, dl, tf)
    counts, which otherwise recompute once per consumer (the match
    join AND the df aggregate — two full corpus scans + tokenize
    passes). The cache lives until Spark's LRU evicts it or the
    caller runs ``spark.catalog.clearCache()``; for long-lived
    many-query-batch services, materialize the counts upstream and
    keep the handle instead. Plan-pinned: with ``persist`` both
    consumers read InMemoryTableScan."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if salt_buckets <= 0:
        raise ValueError(f"salt_buckets must be positive: {salt_buckets}")

    toks = oracle_tokens(F.col(text_col))
    # Length attaches BEFORE the explode — constant per document, so
    # the (id, token) aggregate can carry it with no extra join.
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("token"),
    )
    per_doc = exploded.groupBy("id", "token", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if persist:
        level = (
            persist
            if isinstance(persist, StorageLevel)
            else StorageLevel.MEMORY_AND_DISK
        )
        per_doc = per_doc.persist(level)

    qterms = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(oracle_tokens(F.col(query_text_col))).alias("token"),
        ).distinct()
    )

    # Corpus stats: one row, cross-joined (broadcast) everywhere.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_corpus"),
        F.avg(F.size(oracle_tokens(F.col(text_col)))).alias("avgdl"),
    )

    # df only for tokens some query mentions — tiny output.
    df_tbl = (
        per_doc.join(qterms.select("token").distinct(), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )

    matched = (
        per_doc.join(qterms, "token")
        .join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_corpus") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * (1.0 + k1)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = matched.groupBy("query_id", "id").agg(
        F.round(F.sum(idf * tf_part), round_dp).alias("score")
    )

    # Hot-key-safe top-k: salted partial top-k, then the exact window
    # over its <= salt_buckets * k survivors per query.
    salt = F.pmod(F.xxhash64(F.col("id")), F.lit(salt_buckets))
    w_pre = Window.partitionBy(F.col("query_id"), salt).orderBy(
        F.desc("score"), F.asc("id")
    )
    pre = (
        scored.withColumn("_pre", F.row_number().over(w_pre))
        .filter(F.col("_pre") <= k)
        .drop("_pre")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        pre.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("id").alias(id_col), "score")
    )
