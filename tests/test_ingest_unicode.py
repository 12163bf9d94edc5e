"""UTF-8 byte-stream ingestion semantics (WritableStream equivalent).

The reference's stream adapters keep split multi-byte UTF-8 sequences
intact (WritableStream.ts:18-42, spec:10-20); per-row whole-document
decoding makes that automatic here — these tests pin decoding of
multi-byte content, invalid bytes (errors='replace'), and astral-plane
position conversion.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htmlparser2_spark.engine.dom import parse_document, text_content
from htmlparser2_spark.engine.positions import cp_to_utf16, utf16_offsets, utf16_to_cp


def test_multibyte_utf8_through_udf(spark):
    from htmlparser2_spark.functions.udfs import extract_text_udf

    html = "<p>héllo wörld — café \U0001F600 中文</p>".encode()
    df = spark.createDataFrame([(html,)], "html binary")
    out = df.select(extract_text_udf()(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "héllo wörld — café \U0001F600 中文"


def test_invalid_utf8_replaced(spark):
    from htmlparser2_spark.functions.udfs import extract_text_udf

    html = b"<p>ok \xff\xfe bad</p>"
    df = spark.createDataFrame([(html,)], "html binary")
    out = df.select(extract_text_udf()(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "ok �� bad"


pytestmark_engine = []  # engine-level tests below need no spark


def test_astral_positions_engine():
    doc = "<p>a\U0001F600b</p>"
    nodes = parse_document(doc)
    text = [n for n in nodes if n["type"] == "text"][0]
    # Code-point positions (engine contract).
    assert doc[text["start_index"] : text["end_index"] + 1] == "a\U0001F600b"
    # UTF-16 conversion matches what the reference would report.
    offs = utf16_offsets(doc)
    assert cp_to_utf16(offs, text["start_index"]) == 3
    assert cp_to_utf16(offs, text["end_index"]) == 6  # 'b' at u16 index 6
    assert utf16_to_cp(offs, 6) == text["end_index"]


@pytest.mark.parametrize("u16", range(12))
def test_utf16_roundtrip(u16):
    doc = "x\U0001F600y\U0001F601z abc"
    offs = utf16_offsets(doc)
    cp = utf16_to_cp(offs, u16)
    # Round trip holds for positions that aren't inside a surrogate pair.
    if cp_to_utf16(offs, cp) == u16:
        assert 0 <= cp <= len(doc)


def test_text_content_multibyte():
    nodes = parse_document("<div>&#x1F600;&amp;中</div>")
    assert text_content(nodes) == "\U0001F600&中"


test_multibyte_utf8_through_udf = pytest.mark.spark(test_multibyte_utf8_through_udf)
test_invalid_utf8_replaced = pytest.mark.spark(test_invalid_utf8_replaced)
