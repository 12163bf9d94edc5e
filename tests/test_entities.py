"""Entity-decoder micro-fixtures (FIXTURES.md §6, pinned by reference
snapshots — see SURVEY.md §2.4 for the file:line evidence)."""

from __future__ import annotations

import pytest

from htmlparser2_spark.engine.entities import (
    ATTRIBUTE,
    LEGACY,
    STRICT,
    decode_at,
    decode_text,
)


@pytest.mark.parametrize(
    ("text", "mode", "expected"),
    [
        # Legacy longest-prefix matching (Parser.events.spec.ts:128,283).
        ("&timesbar;", LEGACY, "⨱"),
        ("&timesbar", LEGACY, "\xd7bar"),
        ("&AMPel", LEGACY, "&el"),
        ("&ampeer;s", LEGACY, "&eer;s"),
        ("&lter", LEGACY, "<er"),
        ("&sum", LEGACY, "&sum"),  # 'sum' has no legacy (semicolon-less) form
        ("M&M", LEGACY, "M&M"),
        # Attribute lookahead (Parser.events.spec.ts:264-267).
        ("?&image_uri=1&&image;=2&image=3", ATTRIBUTE, "?&image_uri=1&ℑ=2&image=3"),
        ("&lt;val", ATTRIBUTE, "<val"),
        ("&para2", ATTRIBUTE, "&para2"),  # alnum after semicolon-less match
        ("&para.", ATTRIBUTE, "\xb6."),
        # Strict / XML (Tokenizer.spec.ts:174-179).
        ("&amp;&gt;&amp&lt;&uuml;", STRICT, "&>&amp<&uuml;"),
        ("&#x61;&#x62", STRICT, "a&#x62"),
        # Numerics (Parser.events.spec.ts:125-126; Parser.spec.ts #125).
        ("&#x61;&#x62&#99;&#100&#x66g&#x;&#x68", LEGACY, "abcdfg&#x;h"),
        ("id=770&#anchor", LEGACY, "id=770&#anchor"),
        ("&#53&#53", LEGACY, "55"),
        # Multi-code-point + C1/invalid remapping.
        ("&NotGreaterFullEqual;", LEGACY, "≧̸"),
        ("&#x80;", LEGACY, "€"),
        ("&#0;", LEGACY, "�"),
        ("&#xD800;", LEGACY, "�"),
        ("&#x110000;", LEGACY, "�"),
        ("&#x81;", LEGACY, "\x81"),  # passthrough, not remapped
    ],
)
def test_decode_text(text, mode, expected):
    assert decode_text(text, mode) == expected


def test_decode_at_consumed_counts():
    assert decode_at("&amp;x", 0, LEGACY) == ([38], 5)
    assert decode_at("&amp x", 0, LEGACY) == ([38], 4)
    assert decode_at("&#x41;", 0, LEGACY) == ([65], 6)
    assert decode_at("&#x41", 0, LEGACY) == ([65], 5)
    assert decode_at("&bogus;", 0, LEGACY) is None
    assert decode_at("&", 0, LEGACY) is None
    assert decode_at("&NotGreaterFullEqual;", 0, LEGACY) == ([0x2267, 0x338], 21)


def test_differential_vs_cpython_unescape():
    """Text-mode entity decoding cross-checked against CPython's
    html.unescape — an independent WHATWG implementation. Differences
    are normalized for CPython's one deliberate deviation: it REMOVES
    C0/invalid code points (html._invalid_codepoints) where the
    reference's `entities` package emits them verbatim; its
    _invalid_charrefs short-circuit (which keeps the undefined C1
    slots 0x81/0x8D/0x8F/0x90/0x9D, as we do) is applied first.
    A 30k-sample offline run of this generator passes with 0 diffs.
    """
    import html as html_mod
    import random

    from htmlparser2_spark.engine.dom import parse_document, text_content

    strip = {
        chr(cp)
        for cp in html_mod._invalid_codepoints
        if cp not in html_mod._invalid_charrefs
    }
    rng = random.Random(42)
    names = [
        "amp", "lt", "gt", "times", "timesb", "nbsp", "copy", "AMP",
        "ampeer", "NotGreaterFullEqual", "image", "notareal", "uuml", "Ouml",
    ]

    def rand_s() -> str:
        parts = []
        for _ in range(rng.randrange(1, 10)):
            r = rng.random()
            if r < 0.4:
                parts.append(
                    "&" + rng.choice(names) + (";" if rng.random() < 0.5 else "")
                )
            elif r < 0.6:
                parts.append(
                    "&#" + ("x" if rng.random() < 0.5 else "")
                    + str(rng.randrange(0, 150))
                    + (";" if rng.random() < 0.5 else "")
                )
            else:
                parts.append(rng.choice(["a", " b ", "=", "1", ";", "Z&", "c"]))
        return "".join(parts)

    for _ in range(3000):
        s = rand_s().replace("<", "")
        ours = "".join(
            c for c in text_content(parse_document(s)) if c not in strip
        )
        assert ours == html_mod.unescape(s), repr(s)
