"""WHATWG character-reference decoding for the HTML/XML tokenizer.

Reimplements, from the public WHATWG HTML spec and Python's stdlib
``html.entities.html5`` table, the decoding semantics that the reference
engine (fb55/htmlparser2) gets from its external ``entities`` dependency.
Three decoding modes (see /root/reference/src/Tokenizer.ts:825-863):

* ``STRICT``    — XML: named refs limited to the five predefined XML
  entities, and every reference (named or numeric) must end with ``;``.
* ``LEGACY``    — HTML text content: named refs without ``;`` decode iff
  they are in the spec's legacy set (the ~106 semicolon-less table keys),
  using longest-prefix matching (``&timesbar`` -> ``×bar``).
* ``ATTRIBUTE`` — like LEGACY, but a semicolon-less named match is NOT
  decoded when the next character is ``=`` or alphanumeric
  (``&image=3`` stays literal; behavior pinned by
  /root/reference/src/Parser.events.spec.ts:264-267).

Numeric references: decimal/hex, ``;`` optional outside STRICT; zero
digits back out entirely (``&#x;`` stays literal); code points are
remapped per the spec (NUL and out-of-range -> U+FFFD, C1 range via the
windows-1252 table).

This module is pure Python (no Spark imports) so it can run inside
Arrow-batched UDF workers with zero per-row setup cost.
"""

from __future__ import annotations

import re

from html.entities import html5 as _HTML5

__all__ = ["STRICT", "LEGACY", "ATTRIBUTE", "decode_at", "decode_text", "decode_text_span"]

STRICT = 0
LEGACY = 1
ATTRIBUTE = 2

# The five predefined XML entities; STRICT mode additionally requires the
# terminating semicolon, so only the ';'-keys are reachable.
_XML_ENTITIES = {
    "amp;": "&",
    "apos;": "'",
    "gt;": ">",
    "lt;": "<",
    "quot;": '"',
}

# windows-1252 remapping of the C1 control range, per the WHATWG
# "numeric character reference end state" table. Code points absent from
# this map (0x81, 0x8D, 0x8F, 0x90, 0x9D) pass through unchanged.
_C1_REMAP = {
    0x00: 0xFFFD,
    0x80: 0x20AC,
    0x82: 0x201A,
    0x83: 0x0192,
    0x84: 0x201E,
    0x85: 0x2026,
    0x86: 0x2020,
    0x87: 0x2021,
    0x88: 0x02C6,
    0x89: 0x2030,
    0x8A: 0x0160,
    0x8B: 0x2039,
    0x8C: 0x0152,
    0x8E: 0x017D,
    0x91: 0x2018,
    0x92: 0x2019,
    0x93: 0x201C,
    0x94: 0x201D,
    0x95: 0x2022,
    0x96: 0x2013,
    0x97: 0x2014,
    0x98: 0x02DC,
    0x99: 0x2122,
    0x9A: 0x0161,
    0x9B: 0x203A,
    0x9C: 0x0153,
    0x9E: 0x017E,
    0x9F: 0x0178,
}


def _build_trie(table: dict[str, str]) -> dict:
    """Build a nested-dict trie over entity names (';' included in keys).

    A node is ``{char: child, ...}`` with the sentinel key ``None``
    holding the replacement string for names that terminate there.
    """
    root: dict = {}
    for name, value in table.items():
        node = root
        for ch in name:
            node = node.setdefault(ch, {})
        node[None] = value
    return root


_HTML_TRIE = _build_trie(_HTML5)
_XML_TRIE = _build_trie(_XML_ENTITIES)


def _replace_codepoint(cp: int) -> int:
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return 0xFFFD
    return _C1_REMAP.get(cp, cp)


_HEX_DIGITS = set("0123456789abcdefABCDEF")
_DEC_DIGITS = set("0123456789")

# Numeric reference matched at the '#': decimal or hex body, optional
# ';'. Decode rules around it (STRICT requires the ';'; no digits backs
# out fully) are applied by the caller — mirrors decode_at's branch.
_RE_NUM_REF = re.compile(r"#([0-9]+|[xX][0-9a-fA-F]+)(;?)")

# Fast path for the handful of references that dominate real HTML.
# Maps the exact text following '&' to (codepoints, consumed-from-&).
# Only safe entries: fully-terminated (';') references whose decode is
# mode-independent apart from STRICT's name restriction.
_COMMON = {
    "amp;": ([38], 5),
    "lt;": ([60], 4),
    "gt;": ([62], 4),
    "quot;": ([34], 6),
    "apos;": ([39], 6),
}
_COMMON_XML = _COMMON
_COMMON_HTML = {
    **_COMMON,
    "nbsp;": ([0xA0], 6),
    "copy;": ([0xA9], 6),
    "mdash;": ([0x2014], 7),
    "ndash;": ([0x2013], 7),
    "rsquo;": ([0x2019], 7),
    "lsquo;": ([0x2018], 7),
    "rdquo;": ([0x201D], 7),
    "ldquo;": ([0x201C], 7),
    "hellip;": ([0x2026], 8),
    "#39;": ([39], 5),
    "#034;": ([34], 6),
    "#038;": ([38], 6),
}


def decode_at(s: str, amp: int, mode: int):
    """Try to decode a character reference starting at ``s[amp] == '&'``.

    Returns ``(codepoints, consumed)`` where ``consumed`` counts from the
    ``&`` inclusive, or ``None`` when no reference matches (the ``&`` and
    everything after it remain literal text; the caller rescans from
    ``amp + 1``).
    """
    n = len(s)
    i = amp + 1
    if i >= n:
        return None
    c = s[i]

    # Dominant references resolve with one dict probe (longest common
    # entry is 8 chars; a probe hit is always the longest match since
    # every entry ends in ';').
    table = _COMMON_XML if mode == STRICT else _COMMON_HTML
    semi = s.find(";", i, i + 8)
    if semi != -1:
        hit = table.get(s[i : semi + 1])
        if hit is not None:
            return hit

    if c == "#":
        # Numeric reference.
        i += 1
        hexmode = False
        if i < n and (s[i] == "x" or s[i] == "X"):
            hexmode = True
            i += 1
        digits_start = i
        allowed = _HEX_DIGITS if hexmode else _DEC_DIGITS
        while i < n and s[i] in allowed:
            i += 1
        if i == digits_start:
            # No digits: back out fully ("&#x;", "&#anchor").
            return None
        has_semi = i < n and s[i] == ";"
        if mode == STRICT and not has_semi:
            return None
        value = int(s[digits_start:i], 16 if hexmode else 10)
        if has_semi:
            i += 1
        return ([_replace_codepoint(value)], i - amp)

    # Named reference: walk the trie, remembering the last terminal node.
    node = _XML_TRIE if mode == STRICT else _HTML_TRIE
    best_value: str | None = None
    best_end = i
    best_semi = False
    j = i
    while j < n:
        node = node.get(s[j])
        if node is None:
            break
        j += 1
        value = node.get(None)
        if value is not None:
            best_value = value
            best_end = j
            best_semi = s[j - 1] == ";"
    if best_value is None:
        return None
    if not best_semi:
        if mode == STRICT:
            return None
        if mode == ATTRIBUTE:
            # A semicolon-less named match followed by '=' or an
            # alphanumeric character stays literal (legacy URL params).
            if best_end < n:
                nxt = s[best_end]
                if nxt == "=" or (
                    "0" <= nxt <= "9" or "a" <= nxt <= "z" or "A" <= nxt <= "Z"
                ):
                    return None
    return ([ord(ch) for ch in best_value], best_end - amp)


def decode_text_span(s: str, start: int, end: int, mode: int) -> str:
    """Decode every reference in ``s[start:end]`` exactly as the
    tokenizer's sequential per-'&' scan would (failed references stay
    literal, rescan past the '&').

    The span boundary is semantics-preserving: ``end`` is either
    ``len(s)`` or the position of a ``<`` (the tokenizer's text-run
    terminator), and no reference can extend across ``<`` — trie edges
    are alphanumeric/';' and numeric bodies are digits — so bounding
    only the '&' search while letting :func:`decode_at` look at the
    full string is exact. Used by the batched fast-text path
    (``on_text_decoded``), which replaces per-entity event dispatch
    with one call per text run.
    """
    find = s.find
    out: list[str] = []
    append = out.append
    pos = start
    common_get = (_COMMON_XML if mode == STRICT else _COMMON_HTML).get
    num_match = _RE_NUM_REF.match
    strict = mode == STRICT
    while True:
        amp = find("&", pos, end)
        if amp == -1:
            append(s[pos:end])
            return "".join(out)
        semi = find(";", amp + 1, amp + 9)
        if semi != -1:
            hit = common_get(s[amp + 1 : semi + 1])
            if hit is not None:
                cps, consumed = hit
                if amp > pos:
                    append(s[pos:amp])
                append(chr(cps[0]) if len(cps) == 1 else "".join(map(chr, cps)))
                pos = amp + consumed
                continue
        if s[amp + 1 : amp + 2] == "#":
            # Numeric reference, decoded inline: one regex match + one
            # int() replaces decode_at's per-digit set-membership loop.
            m = num_match(s, amp + 1)
            if m is not None and (not strict or m.group(2)):
                body = m.group(1)
                value = (
                    int(body[1:], 16) if body[0] in "xX" else int(body)
                )
                if amp > pos:
                    append(s[pos:amp])
                append(chr(_replace_codepoint(value)))
                pos = m.end()
            else:
                # No digits (back out fully) or STRICT without ';'.
                append(s[pos : amp + 1])
                pos = amp + 1
            continue
        res = decode_at(s, amp, mode)
        if res is None:
            append(s[pos : amp + 1])
            pos = amp + 1
            continue
        cps, consumed = res
        if amp > pos:
            append(s[pos:amp])
        append("".join(map(chr, cps)))
        pos = amp + consumed


def decode_text(s: str, mode: int = LEGACY) -> str:
    """Decode all character references in ``s`` (helper for tests/feeds)."""
    out = []
    pos = 0
    while True:
        amp = s.find("&", pos)
        if amp == -1:
            out.append(s[pos:])
            break
        res = decode_at(s, amp, mode)
        if res is None:
            out.append(s[pos : amp + 1])
            pos = amp + 1
        else:
            cps, consumed = res
            out.append(s[pos:amp])
            out.append("".join(map(chr, cps)))
            pos = amp + consumed
    return "".join(out)
