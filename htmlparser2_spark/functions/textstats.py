"""Text-analysis column functions for training-data pipelines.

All JVM-side Catalyst expressions (no Python in the hot path): language
ID by stopword-marker voting, quality scoring (length / stopword /
token-shape ratios), token counting (whitespace and a BPE-ish regex),
and document fingerprinting. Each returns a Column usable in select/agg.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "oracle_tokens",
    "ORACLE_TOKENS_SQL",
    "n_tokens",
    "bpe_ish_tokens",
    "stopword_ratio",
    "avg_token_len",
    "quality_score",
    "langid_guess",
    "SCRIPT_RANGES",
    "script_count",
    "dominant_script",
    "fingerprint",
    "rolling_fingerprints",
    "sentences",
    "SENTENCES_SQL",
]

# Tiny public marker sets — a deterministic n-gram/stopword heuristic
# (a real fastText model would slot in via pandas UDF; the pipeline
# shape and the Spark surface stay the same).
_LANG_MARKERS = {
    "en": ("the", "and", "of", "with"),
    "de": ("der", "die", "und", "nicht"),
    "fr": ("le", "les", "des", "est"),
    "es": ("el", "los", "que", "por"),
    "zh": ("的", "是", "了", "在"),
}

_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def tokens(text: Column | str) -> Column:
    return F.split(text, r"\s+")


# The dual-dialect tokenization convention shared by the LM scorer,
# the hashed embeddings, and their DuckDB oracles: lowercase, split on
# single spaces, drop empty tokens, NULL text = no tokens. Pinned in
# ONE place so the Spark expression and the SQL fragment can't drift.
# Parity boundary (documented, not hidden): lower() differs between
# the JVM (full case mapping: 'İ' -> 'i'+combining dot) and DuckDB
# (1:1 folding: 'İ' -> 'i') for full-case-mapping characters, so
# bit-identical oracle checks hold for 1:1-case text (all of the
# synthesized corpus); route full-Unicode corpora through a pre-folded
# column if exact cross-engine parity is required.
ORACLE_TOKENS_SQL = "list_filter(string_split(lower({col}), ' '), x -> x <> '')"


def oracle_tokens(text: Column | str) -> Column:
    """Array of lowercased space-split tokens per ORACLE_TOKENS_SQL
    (empty tokens dropped, NULL text -> empty array)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(F.coalesce(col, F.lit(""))), " "),
        lambda x: x != F.lit(""),
    )


def n_tokens(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_tokens(text: Column | str) -> Column:
    """Sub-word-ish tokenization: splits on whitespace AND before
    punctuation/digit boundaries (a cheap, deterministic stand-in for a
    BPE vocab; regexp runs in the JVM)."""
    spaced = F.regexp_replace(text, r"([\p{Punct}\d])", r" $1")
    return F.filter(F.split(spaced, r"\s+"), lambda t: t != F.lit(""))


def _bound(expr: Column, body) -> Column:
    """Evaluate ``expr`` once per row and hand it to ``body`` as a
    bound transform lambda variable. Interpreted HOF expressions get
    no subexpression elimination, so a Column function that mentions
    ``tokens(text)`` k times otherwise re-splits the text k times per
    row. Keep inner lambdas inside ``body`` to at most ONE reference
    of the bound variable if a pandas UDF may ever consume the result
    (see operators/dedup._shingles_of for the Spark 4.1 extraction
    trap); row-level references inside ``body`` are unrestricted."""
    return F.transform(F.array(expr), body)[0]


def stopword_ratio(text: Column | str) -> Column:
    return _bound(
        tokens(text),
        lambda tk: F.size(F.filter(tk, lambda t: t.isin(*_STOPWORDS)))
        / F.size(tk),
    )


def avg_token_len(text: Column | str) -> Column:
    return _bound(
        tokens(text),
        lambda tk: F.aggregate(
            F.transform(tk, F.length), F.lit(0), lambda acc, x: acc + x
        )
        / F.size(tk),
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + reasonable token lengths. Deterministic, order-free."""
    col = F.col(text) if isinstance(text, str) else text
    length_ok = (F.length(col) >= 50) & (F.length(col) <= 100_000)
    sw = stopword_ratio(col)
    atl = avg_token_len(col)
    return F.round(
        length_ok.cast("double") * 0.4
        + F.when((sw > 0.01) & (sw < 0.6), 0.3).otherwise(0.0)
        + F.when((atl >= 2.0) & (atl <= 12.0), 0.3).otherwise(0.0),
        4,
    )


def _argmax_label(
    scored: list[tuple[str, Column]], *, default: str
) -> Column:
    """Label of the highest score, ties won by the EARLIER entry;
    ``default`` when the best score is not positive (or all scores are
    NULL — struct ordering sorts NULL fields lowest, so the final
    ``> 0`` check falls through to ``default`` exactly like the old
    fold did). Built as ONE array<struct<score,prio,label>> + array_max
    (struct comparison is lexicographic by field order), so the
    expression tree is LINEAR in the entry count — the naive
    when-chain fold embeds the previous accumulator twice per step,
    doubling the tree each entry, and overflows whole-stage codegen's
    64KB method limit past ~8 entries (the failure q_script_profile
    hit when SCRIPT_RANGES grew to 11 scripts)."""
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    score.alias("s"),
                    F.lit(-i).alias("p"),
                    F.lit(label).alias("n"),
                )
                for i, (label, score) in enumerate(scored)
            ]
        )
    )
    return F.when(best["s"] > 0, best["n"]).otherwise(F.lit(default))


def langid_guess(text: Column | str) -> Column:
    """Most-probable language by marker-token votes (ties -> code
    order). The token array is bound once per row (``_bound``) — the
    five per-language vote counts otherwise each re-split the text."""

    def body(tk):
        def _marker_hits(markers):
            # Single-param lambda (a 2-param lambda would be treated
            # as (element, index) by F.filter); closure via factory.
            return F.size(F.filter(tk, lambda t: t.isin(*markers)))

        return _argmax_label(
            [(code, _marker_hits(m)) for code, m in _LANG_MARKERS.items()],
            default="und",
        )

    return _bound(tokens(text), body)


# Major Unicode script ranges: literal character ranges so the same
# class string compiles identically under Java regex (Spark) and RE2
# (DuckDB) — both engines match astral (supplementary-plane) class
# members per CODE POINT, verified cross-engine in
# tests/test_spark_ops.py. Dict order IS the dominant-script tie-break
# precedence, so the astral entries append at the end (BMP precedence
# unchanged). cjk_ext is CJK Ideograph Extensions B-F — the one astral
# block with real crawl-curation volume (rare hanzi in zh text);
# egyptian/cuneiform mark ancient-script corpora.
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cjk": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "arabic": "؀-ۿ",
    "hangul": "가-힯",
    "kana": "぀-ヿ",
    "greek": "Ͱ-Ͽ",
    "devanagari": "ऀ-ॿ",
    "cjk_ext": "\U00020000-\U0002EBEF",
    "egyptian": "\U00013000-\U0001342F",
    "cuneiform": "\U00012000-\U000123FF",
}


def script_count(text: Column | str, script: str) -> Column:
    """Number of characters of ``script`` (SCRIPT_RANGES) in the text
    — a single JVM regexp_count, NULL text counts 0."""
    col = F.col(text) if isinstance(text, str) else text
    cls = SCRIPT_RANGES[script]
    return F.regexp_count(F.coalesce(col, F.lit("")), F.lit(f"[{cls}]"))


def dominant_script(text: Column | str) -> Column:
    """The script with the most characters (ties break in
    SCRIPT_RANGES order, earlier wins — the langid_guess convention);
    'none' when no scripted character occurs. The multilingual-
    curation complement to langid_guess: script is a cheap, reliable
    signal where marker tokens need per-language lists."""
    return _argmax_label(
        [(name, script_count(text, name)) for name in SCRIPT_RANGES],
        default="none",
    )


# Dual-dialect sentence segmentation, pinned like ORACLE_TOKENS_SQL:
# a sentence ends at a run of [.!?] followed by whitespace (the
# whitespace is consumed). Deliberately no abbreviation logic ("Dr."
# splits) — a fixed, documented rule both engines reproduce exactly.
# The break marker is chr(30) (RS), which never occurs in corpus text
# (normalize_text strips C0 controls). The whitespace class is spelled
# out explicitly — Java's \s includes \x0B (vertical tab) while RE2's
# does not, so a bare \s would silently diverge between the engine
# and the DuckDB oracle on VT-bearing text; replacement syntax also
# differs ($1 vs \1), values don't.
SENTENCES_SQL = (
    "list_filter(string_split(regexp_replace(coalesce({col}, ''), "
    "'([.!?]+)[ \\t\\n\\f\\r\\x0b]+', '\\1' || chr(30), 'g'), "
    "chr(30)), x -> x <> '')"
)


def sentences(text: Column | str) -> Column:
    """Array of sentences per SENTENCES_SQL (NULL text -> empty)."""
    col = F.col(text) if isinstance(text, str) else text
    marked = F.regexp_replace(
        F.coalesce(col, F.lit("")), r"([.!?]+)[ \t\n\f\r\x0B]+", "$1\u001e"
    )
    return F.filter(F.split(marked, "\u001e"), lambda s: s != F.lit(""))


def fingerprint(text: Column | str) -> Column:
    """Whole-document fingerprint: md5 of case-folded text."""
    return F.md5(F.lower(text))


def rolling_fingerprints(text: Column | str, *, window: int = 8) -> Column:
    """Array of rolling window fingerprints (word-window xxhash64) — the
    content-defined-chunking building block for fuzzy matching.

    The token array is bound as a transform lambda variable: HOF
    lambdas are interpreted with no subexpression elimination, so an
    unbound ``tokens()`` inside the per-window slice would re-split
    the whole document per window — O(tokens^2) per doc."""
    toks_expr = tokens(text)

    def _windows(tk):
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(tk) - (window - 1), F.lit(1))
        )
        return F.transform(
            idx,
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, window))),
        )

    return F.transform(F.array(toks_expr), _windows)[0]
