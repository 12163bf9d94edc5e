"""Codepoint-level text normalization (pre-tokenization cleanup).

The standard C4/CCNet-style scrub between extraction and tokenization:

* typographic variants fold to ASCII (curly quotes, en/em dashes,
  NBSP, ellipsis) so tokenizers and dedup hashes see one spelling;
* CR / CRLF line endings fold to plain LF, then C0/C1-range control
  characters are stripped (tab/newline survive);
* horizontal whitespace runs collapse to one space, spaces around
  newlines drop, and the result is trimmed — newlines themselves are
  PRESERVED because the line-dedup and quality stages are line-based.

All pure Catalyst (translate + regexp_replace), map-only at any
scale. Patterns stick to explicit codepoint classes (no \\p{...}
properties) so the Java-regex and RE2/DuckDB dialects agree — the
oracle replays the identical chain (DuckDB needs the explicit 'g'
flag; Spark regexp_replace is global by default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "normalize_sql",
    "fix_mojibake",
    "TRANSLATE_FROM",
    "TRANSLATE_TO",
]

# 1:1 typographic folds (translate); the 1->3 ellipsis fold needs a
# regexp_replace and runs before control stripping.
TRANSLATE_FROM = "\u2018\u2019\u201c\u201d\u2013\u2014\u00a0"
TRANSLATE_TO = "''\"\"-- "

# CR is handled separately (folded to \n, so CRLF documents read as
# plain LF), then every remaining C0 control except tab/newline, DEL,
# and the full C1 range (U+0080-U+009F mojibake controls) strip.
_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]"


def normalize_text(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    s = F.translate(col, TRANSLATE_FROM, TRANSLATE_TO)
    s = F.regexp_replace(s, "…", "...")
    s = F.regexp_replace(s, "\r\n|\r", "\n")
    s = F.regexp_replace(s, _CTRL, "")
    s = F.regexp_replace(s, "[ \\t]+", " ")
    s = F.regexp_replace(s, " ?\n ?", "\n")
    return F.trim(s)


# ftfy-style mojibake detection: a latin-1-decoded-UTF-8 string is one
# whose every code point is < 0x100 AND whose byte-valued chars form
# well-formed UTF-8. The well-formedness grammar (RFC 3629 table) is
# spelled out as a regex over code-point ranges — proving validity
# BEFORE the decode matters because Spark 4's encode/decode RAISE on
# malformed input (MALFORMED_CHARACTER_CODING) instead of replacing.
_UTF8_SEQ = (
    "(?:[\xc2-\xdf][\x80-\xbf]"
    "|\xe0[\xa0-\xbf][\x80-\xbf]"
    "|[\xe1-\xec][\x80-\xbf]{2}"
    "|\xed[\x80-\x9f][\x80-\xbf]"
    "|[\xee-\xef][\x80-\xbf]{2}"
    "|\xf0[\x90-\xbf][\x80-\xbf]{2}"
    "|[\xf1-\xf3][\x80-\xbf]{3}"
    "|\xf4[\x80-\x8f][\x80-\xbf]{3})"
)
# \A/\z anchors, NOT ^/$: Java's $ matches before a FINAL line
# terminator (\n, \r, and crucially U+0085 NEL / U+2028 LS / U+2029 PS),
# so "caf\xc3\xa9\x85" would pass a $-anchored guard and the unguarded
# decode below would raise MALFORMED_CHARACTER_CODING on the dangling
# continuation byte. \z matches only at the true end of input.
_UTF8_FULL = "\\A(?:[\x00-\x7f]|" + _UTF8_SEQ + ")*\\z"


def fix_mojibake(text: Column | str) -> Column:
    """Repair double-encoded UTF-8 ("caf\xc3\xa9" -> "caf\xe9") — the
    ftfy-style fix for the classic crawl corruption where UTF-8 bytes
    were decoded as latin-1 somewhere upstream.

    A string is repaired iff it parses COMPLETELY as byte-valued
    well-formed UTF-8 (the anchored grammar regex: any code point
    >= 0x100 fails it) and contains at least one multi-byte sequence
    (pure ASCII round-trips to itself; skipping it avoids the encode).
    Everything else — including clean text that merely contains
    accents — passes through untouched, so the operator is safe to run
    unconditionally. Map-only, pure Catalyst (two rlike + encode/
    decode inside a short-circuiting CASE). Single-pass by design:
    doubly-mojibaked text needs a second application (ftfy loops; one
    pass covers the overwhelmingly common case).
    """
    col = F.col(text) if isinstance(text, str) else text
    repairable = col.rlike(_UTF8_FULL) & col.rlike(_UTF8_SEQ)
    return F.when(
        repairable, F.decode(F.encode(col, "ISO-8859-1"), "UTF-8")
    ).otherwise(col)


def normalize_sql(col: str) -> str:
    """The identical chain as DuckDB SQL (dual-dialect oracle side)."""
    to_lit = TRANSLATE_TO.replace("'", "''")
    return (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace("
        f"translate({col}, '{TRANSLATE_FROM}', '{to_lit}'), "
        "'…', '...', 'g'), "
        "'\\r\\n|\\r', chr(10), 'g'), "
        "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f]', '', 'g'), "
        "'[ \\t]+', ' ', 'g'), "
        "' ?\n ?', '\n', 'g'))"
    )
