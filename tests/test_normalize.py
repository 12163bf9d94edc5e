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
