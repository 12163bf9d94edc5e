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

__all__ = [
    "repetition_stats",
    "gopher_signals",
    "gopher_filter",
    "c4_line_filter",
    "c4_page_pred",
]


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

    # Token array bound as a real column BEFORE the bigram lambda: HOF
    # lambdas are interpreted with no subexpression elimination, so an
    # unbound split() referenced twice per bigram would re-tokenize the
    # whole document per element — O(tokens^2) per doc. An attribute
    # reference is O(1) per use (and, unlike a nested-transform lambda
    # variable, stays safe if a Python UDF ever consumes the column —
    # see dedup._shingles_of).
    tk = F.col("__toks")
    nt = F.size(tk)
    idx = F.when(nt >= 2, F.sequence(F.lit(1), nt - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(tk, i), F.element_at(tk, i + 1)
        ),
    )
    counts = (
        base.select(
            "id",
            F.filter(
                F.split(F.col("t"), r"\s+"), lambda x: x != F.lit("")
            ).alias("__toks"),
        )
        .select("id", F.explode(bigram).alias("bg"))
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


# ----------------------------------------------------------------------
# Gopher-style document quality gate (thresholds from the public
# literature: 50..100k words, mean word length 3..10, symbol-to-word
# ratio < 0.1, >= 80% words with an alphabetic character, < 90% bullet
# lines, < 30% ellipsis-ending lines, >= 2 distinct required stopwords).
# All Catalyst expressions; the gate emits the FIRST failing rule as
# reject_reason so lineage can histogram why documents fall out.

_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

def gopher_signals(text, *, words=None, lines=None):
    """Dict of named signal Columns over a text Column/name.

    ``words`` / ``lines`` optionally take pre-bound token/line array
    Columns (attributes from a prior select): the signal expressions
    reference the word array 4+ times, and interpreted HOF lambdas
    get no subexpression elimination, so inline splits re-tokenize
    the document once per reference. :func:`gopher_filter` binds both
    (one split each per row); the unbound default keeps the
    single-signal ad-hoc use simple."""
    col = F.col(text) if isinstance(text, str) else text
    if words is None:
        words = F.filter(F.split(col, r"\s+"), lambda w: w != F.lit(""))
    if lines is None:
        lines = F.filter(F.split(col, "\n"), lambda l: l != F.lit(""))
    n_words = F.size(words)
    total_len = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x
    )
    mean_word_len = F.when(n_words > 0, total_len / n_words).otherwise(0.0)
    n_symbols = (
        F.size(F.split(col, "#", -1)) - 1
        + F.size(F.split(col, r"\.\.\.", -1)) - 1
    )
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(n_words > 0, alpha_words / n_words).otherwise(0.0)
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipsis = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    stopword_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in _REQUIRED_STOPWORDS]),
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": F.when(n_words > 0, n_symbols / n_words).otherwise(0.0),
        "alpha_frac": alpha_frac,
        "bullet_frac": F.when(n_lines > 0, bullet / n_lines).otherwise(0.0),
        "ellipsis_frac": F.when(n_lines > 0, ellipsis / n_lines).otherwise(0.0),
        "n_stopword_kinds": stopword_hits,
    }


def gopher_filter(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, keep, reject_reason) per document — the classic web-corpus
    quality gate. ``reject_reason`` is the first failing rule in a
    fixed order (NULL when kept), so a groupBy over it yields the
    filter-funnel histogram a pipeline reports per crawl batch.

    Three staged projections bind (a) the word/line arrays, then (b)
    the seven signals, so the rule chain tests attributes: inlined,
    the eight rule conditions plus the keep/reason duplication
    re-evaluated the split+filter tokenization ~20x per row (HOF
    expressions are interpreted — no codegen subexpression
    elimination). Values are identical; only evaluation count
    changes. CollapseProject keeps the stages separate (non-cheap,
    multiply-referenced aliases)."""
    col = F.col(text_col)
    bound = df.select(
        F.col(id_col),
        col.alias("__t"),
        F.filter(F.split(col, r"\s+"), lambda w: w != F.lit("")).alias(
            "__words"
        ),
        F.filter(F.split(col, "\n"), lambda l: l != F.lit("")).alias(
            "__lines"
        ),
    )
    s = gopher_signals(
        F.col("__t"), words=F.col("__words"), lines=F.col("__lines")
    )
    sig = bound.select(
        F.col(id_col), *[expr.alias(f"__{k}") for k, expr in s.items()]
    )
    rules = [
        ("too_few_words", F.col("__n_words") < 50),
        ("too_many_words", F.col("__n_words") > 100_000),
        ("word_length_out_of_range",
         (F.col("__mean_word_len") < 3) | (F.col("__mean_word_len") > 10)),
        ("symbol_heavy", F.col("__symbol_ratio") >= 0.1),
        ("low_alpha_fraction", F.col("__alpha_frac") < 0.8),
        ("bullet_heavy", F.col("__bullet_frac") >= 0.9),
        ("ellipsis_heavy", F.col("__ellipsis_frac") >= 0.3),
        ("too_few_stopwords", F.col("__n_stopword_kinds") < 2),
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(rules):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return sig.select(
        F.col(id_col),
        reason.isNull().alias("keep"),
        reason.alias("reject_reason"),
    )


def c4_line_filter(
    df: DataFrame,
    *,
    min_words: int = 5,
    min_lines: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style line + page filtering (the published rule list of
    Raffel et al. 2020 §2.2, reimplemented): a line survives iff it
    ends in a terminal punctuation mark (``. ! ?`` or a closing
    double quote after trailing whitespace), has at least
    ``min_words`` whitespace-separated words, and does not mention
    "javascript" (case-insensitive); the page survives iff at least
    ``min_lines`` lines did AND the full text contains neither
    "lorem ipsum" (case-insensitive) nor ``{``.

    Entirely map-only: line decisions are array HOFs over
    split(text, '\\n') — no explode, no shuffle; at 100 TB this is a
    single scan projection, and the page flag lets the caller decide
    whether to drop or just annotate.

    Returns (id, clean_text, n_lines_kept, keep_page) for every input
    document; ``clean_text`` is the surviving lines rejoined (original
    order, '' when none survive). NULL text is treated as '' (0 kept
    lines, page rejected) so every document gets a real decision —
    a NULL flag would silently vanish from BOTH sides of a
    keep/reject funnel report.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("t"),
    )
    kept = _c4_kept_lines(F.col("t"), min_words)
    keep_page = _c4_page_rules(F.col("t"), kept, min_lines)
    return base.select(
        "id",
        F.concat_ws("\n", kept).alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        keep_page.alias("keep_page"),
    )


def _c4_kept_lines(t, min_words: int):
    terminal = F.array(*[F.lit(c) for c in (".", "!", "?", '"')])

    def keep_line(line):
        words = F.filter(F.split(line, " "), lambda w: w != F.lit(""))
        last = F.substring(F.rtrim(line), -1, 1)
        return (
            F.array_contains(terminal, last)
            & (F.size(words) >= min_words)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    return F.filter(F.split(t, "\n"), keep_line)


def _c4_page_rules(t, kept, min_lines: int):
    return (
        (F.size(kept) >= min_lines)
        & ~F.contains(F.lower(t), F.lit("lorem ipsum"))
        & ~F.contains(t, F.lit("{"))
    )


def c4_page_pred(
    text_col: str = "text", *, min_words: int = 5, min_lines: int = 3
):
    """The C4 page decision as a standalone boolean Column — usable as
    ``run_curation(quality_pred=c4_page_pred())`` wherever a plan
    wants the C4 gate instead of the Gopher rules. Same rules as
    :func:`c4_line_filter` (NULL text rejects); drop-only: the page
    keeps its original text (use c4_line_filter when the surviving
    lines themselves are wanted)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return _c4_page_rules(t, _c4_kept_lines(t, min_words), min_lines)
