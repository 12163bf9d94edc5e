"""Benchmark decontamination: find training documents that leak
evaluation data.

Standard practice before training on web text: any document sharing
enough word n-grams (conventionally 8-grams or longer) with a held-out
benchmark is flagged or dropped. The asymmetry drives the plan: the
benchmark side is tiny (thousands of items) while the corpus is the
100-TB side, so the benchmark's shingle table is **broadcast** — the
corpus is scanned exactly once, shuffles only the (rare) matching
shingles, and no corpus self-join exists anywhere.

* :func:`contamination_hits` — (doc_id, bench_id, n_shared) per
  contaminated (document, benchmark item) pair
* :func:`decontaminate`      — corpus minus contaminated docs (anti-join)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_array

__all__ = ["contamination_hits", "decontaminate"]


def _shingle_hashes(
    df: DataFrame, *, n: int, text_col: str, id_col: str, out_id: str
) -> DataFrame:
    """(out_id, sh) rows of distinct 64-bit n-gram hashes per row.
    Distinctness is in-row (``array_distinct``) — no exchange."""
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array_distinct(
                F.transform(
                    _shingle_array(text_col, n), lambda s: F.xxhash64(s)
                )
            )
        ).alias("sh"),
    )


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """(doc_id, bench_id, n_shared) for every document sharing at least
    ``min_hits`` distinct word ``n``-grams with a benchmark item.

    The benchmark shingle table is broadcast (pinned in
    tests/test_plans.py), so cost is one corpus scan + a hash probe
    per corpus shingle; only matches reach the final groupBy.
    """
    doc_sh = _shingle_hashes(
        docs, n=n, text_col=text_col, id_col=id_col, out_id="doc_id"
    )
    bench_sh = _shingle_hashes(
        bench, n=n, text_col=bench_text_col, id_col=bench_id_col,
        out_id="bench_id",
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    *,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """The corpus minus every document :func:`contamination_hits`
    flags (left anti-join on the id — keeps all original columns)."""
    hits = contamination_hits(
        docs,
        bench,
        n=n,
        min_hits=min_hits,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        bench_id_col=bench_id_col,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return docs.join(hits, id_col, "left_anti")
