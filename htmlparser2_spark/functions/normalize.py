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

__all__ = ["normalize_text", "normalize_sql", "TRANSLATE_FROM", "TRANSLATE_TO"]

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
