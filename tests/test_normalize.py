"""Codepoint normalization tests; cross-engine parity is oracle-checked
by q_normalize in tests/test_entry_oracle.py."""

from __future__ import annotations

import duckdb
import pytest

pytestmark = pytest.mark.spark

CASES = [
    ("‘quoted’ “words”", "'quoted' \"words\""),
    ("a–b—c", "a-b-c"),
    ("nbsp here", "nbsp here"),
    ("dots…", "dots..."),
    ("ctrl\x01\x02here", "ctrlhere"),
    ("  runs \t of\t\tspace  ", "runs of space"),
    ("line one \n  line two", "line one\nline two"),
    ("", ""),
    ("tab\tand\nnewline", "tab and\nnewline"),
    ("crlf\r\nend", "crlf\nend"),
    ("lone\rcr", "lone\ncr"),
    ("c1\x85here", "c1here"),
]


def test_normalize_cases_and_duckdb_parity(spark):
    from pyspark.sql import functions as F

    from htmlparser2_spark.functions.normalize import (
        normalize_sql,
        normalize_text,
    )

    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(CASES)],
                               "i long, t string")
    got = {r["i"]: r["n"] for r in
           df.select("i", normalize_text("t").alias("n")).collect()}
    con = duckdb.connect()
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i])
        ddb = con.execute(
            f"SELECT {normalize_sql('?')}", [raw]
        ).fetchone()[0]
        assert ddb == want, (raw, ddb)


def test_fix_mojibake(spark):
    from htmlparser2_spark.functions.normalize import fix_mojibake

    orig = "caf\xe9 — 中文 test \U0001f680 №"
    moji = orig.encode("utf-8").decode("latin-1")
    cases = [
        (1, moji, orig),             # full repair (2/3/4-byte seqs)
        (2, orig, orig),             # clean non-latin1 passthrough
        (3, "plain ascii", "plain ascii"),
        # Clean latin-1 accents: \xe9 is an invalid UTF-8 lead here,
        # so the grammar regex rejects and the text is untouched.
        (4, "caf\xe9 clean", "caf\xe9 clean"),
        (5, None, None),
        # Truncated continuation (corrupt mojibake): must NOT attempt
        # the decode (Spark 4 raises on malformed) — passthrough.
        (6, "bad \xc3", "bad \xc3"),
        # C1-control mojibake of a curly quote (\xe2\x80\x99).
        (7, "it\xe2\x80\x99s", "it’s"),
        # Trailing LINE TERMINATORS after an invalid tail: Java's $
        # matches BEFORE a final \n / U+0085 NEL / U+2028 LS, so a
        # ^...$-anchored validity guard would wave these through and
        # the decode would raise MALFORMED_CHARACTER_CODING. The \A/\z
        # anchors must reject (dangling \xc3) or pass through (U+2028
        # is >= 0x100, not byte-valued) — never crash.
        (8, "caf\xc3\xa9\x85\xc3", "caf\xc3\xa9\x85\xc3"),
        (9, "caf\xc3\xa9\u2028", "caf\xc3\xa9\u2028"),
        (10, "caf\xc3\xa9\u2029", "caf\xc3\xa9\u2029"),
        # Trailing newline with VALID mojibake: \n is ASCII, inside
        # the grammar — must still repair.
        (11, "caf\xc3\xa9\n", "caf\xe9\n"),
        # NEL-terminated valid mojibake: \x85 is byte-valued but an
        # invalid standalone UTF-8 continuation byte — passthrough.
        (12, "caf\xc3\xa9\x85", "caf\xc3\xa9\x85"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in cases], "i long, t string"
    )
    got = {r["i"]: r["f"] for r in
           df.select("i", fix_mojibake("t").alias("f")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
