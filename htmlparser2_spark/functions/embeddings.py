"""Deterministic feature-hashing text embeddings (pure Catalyst).

Closes the text -> embedding -> ANN/dedup loop inside the engine: the
similarity stack (brute force / LSH / IVF / PQ) usually consumes model
embeddings, but hashing-trick vectors (Weinberger et al.'s feature
hashing, the classic sparse-projection baseline) need no model at all
and are exactly reproducible in SQL — every token lands in a bucket
``h mod dim`` with sign from the next hash bit, then the count vector
is L2-normalized.

All arithmetic is integer until the final normalization, and the hash
is :func:`~htmlparser2_spark.operators.sampling.portable_hash` (md5
prefix), so DuckDB reproduces the vectors bit-identically for
1:1-case-mapping text (see the parity boundary note on
``textstats.ORACLE_TOKENS_SQL`` — full-case-mapping characters fold
differently across engines). The sign bit deliberately comes from
``h mod 2*dim`` (not ``h / dim`` — a double division there would
shave low bits of the 60-bit hash and desynchronize the two engines).

Scale: one Project over the corpus (no shuffle, no Python); cost is
O(tokens x dim) JVM additions per document, fine for the small dims
(16-128) the hashing trick targets. For model embeddings at higher
dims, the similarity operators accept any ``array<float|double>``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import portable_hash
from .textstats import oracle_tokens

__all__ = ["hashed_embedding", "embed_docs"]


def hashed_embedding(
    text_col: Column, *, dim: int = 64, normalize: bool = True
) -> Column:
    """``array<double>`` feature-hashed embedding of a text column.

    Tokens come from :func:`~htmlparser2_spark.functions.textstats.
    oracle_tokens` (the shared dual-dialect convention); empty or NULL
    documents produce the zero vector (not NULL — downstream cosine
    guards zero norms)."""
    toks = oracle_tokens(text_col)
    two_dim = F.lit(2 * dim)

    def pair(t):
        h = F.pmod(portable_hash(t), two_dim)
        return F.struct(
            F.pmod(h, F.lit(dim)).cast("int").alias("i"),
            F.when(h >= dim, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("s"),
        )

    pairs = F.transform(toks, pair)
    vec = F.aggregate(
        pairs,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, p: F.transform(
            acc,
            lambda v, i: v + F.when(p["i"] == i, p["s"]).otherwise(F.lit(0.0)),
        ),
    )
    if not normalize:
        return vec
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec, lambda v: v * v),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    return F.when(norm == 0.0, vec).otherwise(
        F.transform(vec, lambda v: v / norm)
    )


def embed_docs(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """(id, ``out_col``) hashed-embedding table ready for the
    similarity operators (brute_force_topk/lsh/ivf/pq)."""
    return df.select(
        F.col(id_col),
        hashed_embedding(F.col(text_col), dim=dim).alias(out_col),
    )
