"""Cross-document repeated-span dedup (substring-dedup core).

Whole-document and near-dup dedup miss the long verbatim *spans*
shared across otherwise-distinct pages (licenses, boilerplate
paragraphs, syndicated snippets) — the published substring-dedup
recipe (Lee et al., "Deduplicating Training Data Makes Language
Models Better") removes any ~50-token span occurring more than once
in the corpus. This module is the scalable relational shape of that
recipe over word windows:

* every document explodes into its rolling ``window``-token spans
  (one row per position — linear in corpus tokens, the same cost
  envelope as the published suffix-array approach's output side);
* spans are grouped by a window key — the span table shuffles twice
  (once into the per-key stats aggregate, once into the rows-stats
  join), deliberately: the single-pass alternative
  (``collect_list(struct(id, pos))`` per key) holds every occurrence
  of a span in one task, and boilerplate spans recur across millions
  of documents at web scale — the join shape spreads hot keys the
  way every other hot path here does. The stats side is filtered to
  marked spans *before* the join, so the probe discards the long
  unique tail early. ``min_docs`` thresholds cross-document
  recurrence (within-document repeats are the repetition *quality*
  signal, handled in operators/quality.py, so they don't count here);
* the lowest doc id keeps its occurrences; every other document's
  occurrences are marked (the mark rows carry the ``window`` they
  were computed with), and :func:`strip_spans` rebuilds the text
  with covered tokens elided (in-row array surgery).

The span key is pluggable: the default is a two-seed 128-bit
xxhash64 pair — a single 64-bit key has birthday collisions at the
10^10-span corpus scale this targets, and a collision marks (then
strips) innocent text — or pass the md5-based portable hash when
cross-engine reproducibility matters. The DuckDB oracle groups on
the actual window *text*, so the algorithm is verified
hash-independently.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import tokens

__all__ = ["repeated_spans", "strip_spans"]


def _window_rows(
    df: DataFrame, *, window: int, text_col: str, id_col: str
):
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    n = F.size(toks)
    idx = F.when(
        n >= window, F.sequence(F.lit(1), n - window + 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.explode(idx).alias("pos"),
    ).select(
        "id",
        "pos",
        F.concat_ws(" ", F.slice(F.col("toks"), F.col("pos"), window)).alias(
            "span_text"
        ),
    )


def repeated_spans(
    df: DataFrame,
    *,
    window: int = 50,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn=None,
) -> DataFrame:
    """(id, pos, n_docs, window) for every marked span occurrence.

    ``pos`` is the 1-based token position of the span start. A span
    key recurring in >= ``min_docs`` distinct documents marks every
    occurrence outside the lowest (keeper) doc id; documents shorter
    than ``window`` tokens emit no spans. The ``window`` column rides
    along so :func:`strip_spans` elides exactly the ranges these
    marks describe."""
    if hash_fn is not None:
        h = hash_fn
    else:
        # 128 bits: two independent xxhash64 draws (the extra literal
        # column acts as a seed change).
        h = lambda c: F.struct(F.xxhash64(c), F.xxhash64(c, F.lit(1)))
    rows = _window_rows(
        df, window=window, text_col=text_col, id_col=id_col
    ).select("id", "pos", h(F.col("span_text")).alias("k"))
    stats = (
        rows.groupBy("k")
        .agg(
            F.count_distinct("id").alias("n_docs"),
            F.min("id").alias("keep_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return (
        rows.join(stats, "k")
        .filter(F.col("id") != F.col("keep_id"))
        .select("id", "pos", "n_docs", F.lit(window).alias("window"))
    )


def strip_spans(
    df: DataFrame,
    marks: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, clean_text): rebuild each document's text with every
    token covered by a marked span removed (unmarked docs pass
    through verbatim... modulo the whitespace-run collapse inherent
    to token reassembly). The covered range comes from each mark's
    own ``window`` column — there is no window parameter to get out
    of sync with the one :func:`repeated_spans` ran with."""
    starts = marks.groupBy(F.col("id")).agg(
        F.collect_set(F.struct("pos", "window")).alias("starts")
    )
    toks = F.filter(tokens(F.col(text_col)), lambda x: x != F.lit(""))
    joined = df.select(F.col(id_col).alias("id"), toks.alias("toks")).join(
        starts, "id", "left"
    )
    st = F.coalesce(
        F.col("starts"),
        F.array().cast("array<struct<pos:int,window:int>>"),
    )
    # Linear, not quadratic: expand marks to their covered token-index
    # set once (O(sum of mark windows), dedup'd), then one hash-based
    # array_except against the 1..n index range — a per-token exists()
    # over the whole mark set would go O(tokens x marks) inside a single
    # boilerplate-heavy row (thousands of marks on one page).
    n = F.size(F.col("toks"))
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                st,
                lambda s: F.sequence(s["pos"], s["pos"] + s["window"] - 1),
            )
        )
    )
    idx = F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    kept_idx = F.array_except(idx, covered)
    return joined.select(
        "id",
        F.array_join(
            F.transform(
                kept_idx, lambda i: F.element_at(F.col("toks"), i)
            ),
            " ",
        ).alias("clean_text"),
    )
