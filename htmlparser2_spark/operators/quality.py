"""Repetition-based quality signals for training-data filtering.

The standard web-corpus quality filters (C4, Gopher-style rules from the
public literature) gate documents on internal repetition: near-empty
boilerplate repeats lines, and templated spam repeats short n-grams.
Two signals, both computed without any Python in the hot path:

* ``duplicate line fraction`` — share of non-unique lines; array
  expressions only (per-document line lists are small).
* ``top bigram character fraction`` — characters covered by the most
  frequent word bigram over the document length; computed with the
  scalable explode -> count -> max shape (one shuffle, map-side
  combined) rather than a per-document quadratic array scan, so it
  holds up on 100k-token documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repetition_stats"]


def repetition_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, dup_line_frac, top_bigram_frac) per document.

    ``dup_line_frac`` = (lines - distinct lines) / lines;
    ``top_bigram_frac`` = occurrences(top bigram) x len(top bigram)
    / document characters. Ties on the count break toward the larger
    coverage (deterministic). Documents with no bigrams score 0.0.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    lines = F.split(F.col("t"), "\n")
    n_lines = F.size(lines)
    dup_frac = F.when(
        n_lines > 0,
        F.round((n_lines - F.size(F.array_distinct(lines))) / n_lines, 4),
    ).otherwise(F.lit(0.0))
    per_doc = base.select(
        "id", dup_frac.alias("dup_line_frac"), F.length("t").alias("n_chars")
    )

    toks = F.filter(F.split(F.col("t"), r"\s+"), lambda x: x != F.lit(""))
    nt = F.size(toks)
    idx = F.when(nt >= 2, F.sequence(F.lit(1), nt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
        ),
    )
    counts = (
        base.select("id", F.explode(bigram).alias("bg"))
        .groupBy("id", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    best = counts.groupBy("id").agg(
        F.max(
            F.struct(F.col("c"), (F.col("c") * F.length("bg")).alias("cov"))
        ).alias("b")
    )
    return per_doc.join(best, "id", "left").select(
        F.col("id").alias(id_col),
        "dup_line_frac",
        F.round(
            F.coalesce(F.col("b.cov") / F.col("n_chars"), F.lit(0.0)), 4
        ).alias("top_bigram_frac"),
    )
