"""Byte-pair-encoding subword tokenizer: distributed merge training
and pure-Catalyst encoding.

The tokenizer-TRAINING step of an LLM data pipeline (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the classic merge-learning algorithm), re-expressed
for Spark. Complements ``functions.textstats.bpe_ish_tokens`` (a
fixed regex stand-in): here the merge table is LEARNED from the
corpus and then applied everywhere.

Representation — the whole design hangs on it
---------------------------------------------
A segmentation is a single string of brace-wrapped symbols:
``"hello"`` → ``"{h}{e}{l}{l}{o}{</w>}"``. Merging pair ``(l, l)``
is then literally ``replace(seg, "{l}{l}", "{ll}")``. Because every
symbol carries its OWN delimiters (unlike space-joining, where
adjacent matches share the boundary space), a single left-to-right
non-overlapping string replace — the semantics of Python
``str.replace``, Spark ``F.replace`` and DuckDB/ANSI ``replace()``
alike — IS canonical BPE merge application: ``{a}{a}{a}`` →
``{aa}{a}``, ``{a}{b}{a}{b}`` → ``{ab}{ab}``. All three engines
agree byte-for-byte by construction, so the driver's DuckDB oracle
can replay training AND encoding exactly.

Words are ``[a-z]+`` runs of the lowercased text (ASCII-only by
design: the brace alphabet and the ``</w>`` end-of-word marker can
never collide with a symbol). Every word ends in the ``</w>``
symbol so learned subwords distinguish word-final from word-internal
positions, per the paper.

Scale shape (100 TB corpus)
---------------------------
- ``word_frequencies``: one explode + one (word)-keyed aggregate
  with map-side partial combine; the ``top_words`` cap compiles to
  TakeOrderedAndProject (per-partition heap top-k, k rows of driver
  state) — no global sort.
- ``train_bpe``: the merge loop runs on the DRIVER over the capped
  word-frequency table (≤ ``top_words`` rows — the same tiny-state
  collect contract as the PageRank/classifier operators; the CORPUS
  is never collected). This is how production tokenizers train at
  scale: frequencies are aggregated distributed, merges are learned
  on the aggregate. Cost O(n_merges × top_words × avg_word_len).
- ``encode_bpe``: the learned merges become LITERAL replace calls in
  the plan — a map-only whole-stage-codegen Project. No shuffle, no
  UDF, no broadcast join; 100× more data is 100× more map tasks.

Cross-word safety needs no separator symbol: a learned pair's left
symbol never contains ``</w>`` (it is word-final in every training
segmentation), so no merge pattern can span the ``...{x</w>}{y}...``
boundary between two words in a document stream.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "WORD_PATTERN",
    "EOW",
    "word_frequencies",
    "train_bpe_on_freqs",
    "train_bpe",
    "merges_to_df",
    "segment_expr",
    "apply_merges",
    "encode_bpe",
]

WORD_PATTERN = "[a-z]+"
EOW = "</w>"
_SYM_RE = re.compile(r"\{([^}]*)\}")


def word_frequencies(
    docs: DataFrame,
    *,
    text_col: str = "text",
    top_words: int | None = None,
    pattern: str = WORD_PATTERN,
) -> DataFrame:
    """(word, freq): corpus word frequencies over lowercased
    ``pattern`` runs (NULL text contributes nothing). With
    ``top_words``, keeps the k most frequent — ties broken on the
    word ascending so the cut is reproducible across engines."""
    words = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(pattern),
                F.lit(0),
            )
        ).alias("word")
    )
    freqs = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    if top_words is not None:
        if top_words <= 0:
            raise ValueError(f"top_words must be positive: {top_words}")
        freqs = freqs.orderBy(F.desc("freq"), F.asc("word")).limit(top_words)
    return freqs


def _word_seg(word: str) -> str:
    return "".join("{%s}" % c for c in word) + "{%s}" % EOW


def train_bpe_on_freqs(
    freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merges from a (word, count) table. Returns
    [(rank, lhs, rhs, pair_freq)], rank 1-based. Each round counts
    every adjacent symbol pair weighted by word frequency (overlapping
    occurrences each count, per the reference algorithm), picks the
    (count desc, lhs asc, rhs asc) argmax — the deterministic
    tie-break shared with the SQL oracle — and merges it everywhere.
    Stops early if the vocabulary runs out of pairs (single-symbol
    words only), returning fewer merges."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive: {n_merges}")
    segs = [(_word_seg(w), int(c)) for w, c in freqs]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for seg, freq in segs:
            syms = _SYM_RE.findall(seg)
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (lhs, rhs), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, lhs, rhs, cnt))
        pat, rep = "{%s}{%s}" % (lhs, rhs), "{%s%s}" % (lhs, rhs)
        segs = [(seg.replace(pat, rep), freq) for seg, freq in segs]
    return merges


def train_bpe(
    word_freqs: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Collect the (bounded — cap it with ``top_words``) frequency
    table and learn merges on the driver. The corpus itself is never
    collected; driver state is ≤ top_words short strings."""
    rows = word_freqs.select("word", "freq").collect()
    return train_bpe_on_freqs([(r["word"], r["freq"]) for r in rows], n_merges)


def merges_to_df(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    """Learned merge table as a (tiny) DataFrame for joins/sinks."""
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_freq bigint"
    )


def segment_expr(
    text_col: Column | str, pattern: str = WORD_PATTERN
) -> Column:
    """Brace-delimited character segmentation of a whole document:
    each lowercased ``pattern`` word becomes ``{c}{c}...{</w>}``,
    concatenated. NULL / word-free text segments to ''. Pure
    Catalyst (regexp + one interpreted HOF transform per doc)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.regexp_extract_all(
        F.lower(F.coalesce(col, F.lit(""))), F.lit(pattern), F.lit(0)
    )
    return F.array_join(
        F.transform(
            words,
            lambda w: F.concat(
                F.regexp_replace(w, "(.)", "{$1}"), F.lit("{%s}" % EOW)
            ),
        ),
        "",
    )


def apply_merges(
    seg: Column, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Fold the learned merges over a segmentation column in rank
    order — n_merges literal ``replace`` expressions, map-only."""
    col = seg
    for _rank, lhs, rhs, _cnt in merges:
        col = F.replace(
            col,
            F.lit("{%s}{%s}" % (lhs, rhs)),
            F.lit("{%s%s}" % (lhs, rhs)),
        )
    return col


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_seg",
    pattern: str = WORD_PATTERN,
) -> DataFrame:
    """Add ``out_col`` (the encoded segmentation string — symbols are
    its brace groups) and ``n_bpe`` (subword token count = brace-group
    count). Applying merges in learned-rank order is the original
    subword-nmt encoder; the whole thing is one map-only Project."""
    seg = apply_merges(segment_expr(text_col, pattern), merges)
    out = docs.withColumn(out_col, seg)
    n = F.length(out_col) - F.length(F.replace(F.col(out_col), F.lit("{")))
    return out.withColumn("n_bpe", n.cast("int"))
