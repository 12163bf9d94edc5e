"""HTML byte-stream encoding detection: BOM + bounded meta prescan.

htmlparser2 consumes JS strings; its byte-stream adapter assumes UTF-8
(reference src/WritableStream.ts:20-41). A Common-Crawl ingestion layer
sits one step earlier: it must pick a decoder per document before any
tokenization. This module implements the first two steps of the WHATWG
encoding-sniffing algorithm — the ones that need no out-of-band
transport metadata and cover the overwhelming majority of real pages:

1. **BOM sniffing** (highest priority, spec "BOM sniff"): EF BB BF ->
   utf-8, FF FE -> utf-16le, FE FF -> utf-16be; the BOM is consumed.
2. **Meta prescan** over the first 1024 bytes: any ``charset=`` value
   inside a ``<meta ...>`` tag — this deliberately simplifies the
   spec's attribute-walk (a ``charset`` attribute and a
   ``content="...; charset=..."`` http-equiv both match one pattern;
   a decorative ``charset=`` inside some *other* meta attribute would
   false-positive, which real-world extractors accept).

Labels are normalized through a subset of the WHATWG encoding-label
table: every latin-1/ascii alias maps to ``windows-1252`` (the spec
folds them all into cp1252), meta-declared ``utf-16*`` is treated as
``utf-8`` (spec: documents claiming utf-16 in an ASCII-readable meta
are lying), ``x-user-defined`` maps to ``windows-1252``. Unknown but
Python-decodable labels pass through lowercased; undecodable labels
fall back to the default.
"""

from __future__ import annotations

import codecs
import re

__all__ = ["sniff_charset", "decode_html", "PRESCAN_BYTES"]

PRESCAN_BYTES = 1024

# A <meta ...> tag fully contained in the prescan window. Non-greedy,
# bounded body so a pathological unterminated tag cannot scan far.
_META_RE = re.compile(rb"<meta[\s/][^>]{0,1000}?>", re.IGNORECASE | re.DOTALL)
_CHARSET_RE = re.compile(
    rb"charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)", re.IGNORECASE
)

# WHATWG encoding-label table, the subset that shows up in web corpora.
_LABEL_GROUPS = {
    "utf-8": (
        "utf-8", "utf8", "unicode-1-1-utf-8", "unicode11utf8",
        "unicode20utf8", "x-unicode20utf8",
        # meta-declared utf-16 is decoded as utf-8 per spec
        "utf-16", "utf-16le", "utf-16be", "ucs-2",
    ),
    "windows-1252": (
        "windows-1252", "cp1252", "x-cp1252", "iso-8859-1", "iso8859-1",
        "iso_8859-1", "iso88591", "latin1", "l1", "ascii", "us-ascii",
        "ansi_x3.4-1968", "cp819", "ibm819", "iso-ir-100", "csisolatin1",
        "x-user-defined",
    ),
    "windows-1251": ("windows-1251", "cp1251", "x-cp1251"),
    "shift_jis": ("shift_jis", "shift-jis", "sjis", "x-sjis", "ms932"),
    "gbk": ("gbk", "gb2312", "gb_2312", "csgb2312", "x-gbk"),
    "euc-kr": ("euc-kr", "korean", "ksc_5601", "windows-949"),
    "big5": ("big5", "big5-hkscs", "cn-big5", "x-x-big5"),
}
_LABEL_TO_ENCODING = {
    label: enc for enc, labels in _LABEL_GROUPS.items() for label in labels
}


def _normalize_label(label: str, default: str) -> str:
    label = label.strip().lower()
    mapped = _LABEL_TO_ENCODING.get(label)
    if mapped is not None:
        return mapped
    # codecs.lookup also resolves NON-text codecs (hex, base64, zlib,
    # rot13 — bytes/str transforms that raise on .decode) and the
    # 'undefined' codec (claims _is_text_encoding but raises on every
    # call). A page declaring <meta charset=hex> must fall back, not
    # kill the Spark task.
    if label == "undefined":
        return default
    try:
        info = codecs.lookup(label)
    except LookupError:
        return default
    if not getattr(info, "_is_text_encoding", False):
        return default
    return label


def sniff_charset(data: bytes, default: str = "utf-8") -> tuple[str, int]:
    """-> (normalized encoding label, BOM length to strip)."""
    return _sniff(bytes(data), default)


def _sniff(data: bytes, default: str) -> tuple[str, int]:
    if data.startswith(b"\xef\xbb\xbf"):
        return "utf-8", 3
    if data.startswith(b"\xff\xfe"):
        return "utf-16le", 2
    if data.startswith(b"\xfe\xff"):
        return "utf-16be", 2
    head = data[:PRESCAN_BYTES]
    for tag in _META_RE.finditer(head):
        hit = _CHARSET_RE.search(tag.group(0))
        if hit:
            return (
                _normalize_label(hit.group(1).decode("ascii", "replace"),
                                 default),
                0,
            )
    return default, 0


def decode_html(data: bytes, default: str = "utf-8") -> tuple[str, str]:
    """-> (charset, decoded text); undecodable bytes are replaced, the
    BOM (when present) is stripped before decoding. Never raises on
    content: a sniffed codec that still fails at decode time (exotic
    stateful codecs) falls back to the default. Converts the input
    buffer at most once (hot path under run_extract sniff_charset)."""
    data = bytes(data)
    charset, bom = _sniff(data, default)
    payload = data[bom:] if bom else data
    try:
        return charset, payload.decode(charset, errors="replace")
    except (UnicodeError, LookupError, ValueError):
        return default, payload.decode(default, errors="replace")
