"""Charset sniffing (engine/encoding.py): BOM priority, meta prescan,
WHATWG label folding, prescan window bound, decode fallback."""

from __future__ import annotations

from htmlparser2_spark.engine.encoding import (
    PRESCAN_BYTES,
    decode_html,
    sniff_charset,
)


def test_bom_priority_over_meta():
    # BOM wins even when a meta disagrees, and is stripped on decode.
    data = b"\xef\xbb\xbf<meta charset=iso-8859-1><p>\xc3\xa9</p>"
    assert sniff_charset(data) == ("utf-8", 3)
    charset, text = decode_html(data)
    assert (charset, text) == ("utf-8", "<meta charset=iso-8859-1><p>é</p>")


def test_utf16_boms():
    assert sniff_charset(b"\xff\xfeh\x00i\x00") == ("utf-16le", 2)
    assert sniff_charset(b"\xfe\xff\x00h\x00i") == ("utf-16be", 2)
    assert decode_html(b"\xff\xfeh\x00i\x00")[1] == "hi"
    assert decode_html(b"\xfe\xff\x00h\x00i")[1] == "hi"


def test_meta_charset_quote_styles():
    for tag in (
        b'<meta charset="utf-8">',
        b"<meta charset='UTF-8'>",
        b"<meta charset=utf-8>",
        b'<meta charset = "utf-8" >',
        b'<meta http-equiv="Content-Type" content="text/html; charset=utf-8">',
    ):
        assert sniff_charset(b"<html><head>" + tag, default="x") == (
            "utf-8",
            0,
        ), tag


def test_label_normalization():
    # every latin-1/ascii alias folds to windows-1252 (WHATWG table)
    for label in (b"ISO-8859-1", b"latin1", b"us-ascii", b"x-user-defined"):
        data = b'<meta charset="' + label + b'">'
        assert sniff_charset(data) == ("windows-1252", 0), label
    # meta-declared utf-16 decodes as utf-8 (the bytes are ASCII-readable)
    assert sniff_charset(b"<meta charset=utf-16le>") == ("utf-8", 0)
    # unknown-but-real python codec passes through lowercased
    assert sniff_charset(b"<meta charset=KOI8-R>") == ("koi8-r", 0)
    # garbage label falls back to the default
    assert sniff_charset(b"<meta charset=not-a-charset>") == ("utf-8", 0)
    assert sniff_charset(
        b"<meta charset=not-a-charset>", default="windows-1251"
    ) == ("windows-1251", 0)


def test_prescan_window_bound():
    pad = b"<!-- " + b"x" * PRESCAN_BYTES + b" -->"
    late = pad + b'<meta charset="iso-8859-1">'
    assert sniff_charset(late) == ("utf-8", 0)  # beyond 1024: ignored
    early = b'<meta charset="iso-8859-1">' + pad
    assert sniff_charset(early) == ("windows-1252", 0)


def test_decode_paths():
    # windows-1252 high byte
    assert decode_html(b'<meta charset=latin1><p>caf\xe9</p>') == (
        "windows-1252",
        "<meta charset=latin1><p>café</p>",
    )
    # invalid utf-8 bytes are replaced, never raise
    charset, text = decode_html(b"<p>\xff\xfa</p>")
    assert charset == "utf-8" and "�" in text
    assert decode_html(b"") == ("utf-8", "")


def test_non_text_codecs_never_crash():
    # codecs.lookup resolves bytes-transform codecs (hex, base64, rot13,
    # zlib) and the raising 'undefined' codec — a page declaring one
    # must fall back to the default, not kill the Spark task.
    for label in (b"undefined", b"hex", b"base64", b"rot13", b"zlib"):
        data = b"<meta charset=" + label + b"><p>x</p>"
        assert sniff_charset(data) == ("utf-8", 0), label
        assert decode_html(data)[1].endswith("<p>x</p>"), label


def test_decode_fallback_guarantee():
    # Even if a label slips through sniffing, decode_html never raises.
    from htmlparser2_spark.engine import encoding as E

    charset, text = E.decode_html(b"payload", default="utf-8")
    assert (charset, text) == ("utf-8", "payload")
    # simulate a text codec that fails at decode time
    orig = E._sniff
    E._sniff = lambda data, default: ("undefined", 0)
    try:
        charset, text = E.decode_html(b"payload", default="utf-8")
        assert (charset, text) == ("utf-8", "payload")
    finally:
        E._sniff = orig


def test_no_false_positive_outside_meta():
    # 'charset=' in body text or a non-meta tag must not trigger
    assert sniff_charset(b"<p>use charset=utf-16 here</p>") == ("utf-8", 0)
    assert sniff_charset(b'<a href="?charset=latin1">x</a>') == ("utf-8", 0)
