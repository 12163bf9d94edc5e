"""Property-based fuzzing of the engine (hypothesis).

Invariants (mirroring the reference's own guarantees):
* never raises on any input, in any option combination
* event indices satisfy start <= end and are in-bounds
* DOM adjacency is well-formed (parents precede children, idx_in_parent
  consecutive per parent)
* text extraction is identical between the event stream, the DOM fold,
  and the relational rebuild
* serialize -> reparse preserves textContent for HTML-safe trees
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from htmlparser2_spark.engine.collector import EventCollector
from htmlparser2_spark.engine.dom import DomArrayHandler, parse_document, text_content
from htmlparser2_spark.engine.parser import Parser, ParserOptions

# Markup-ish alphabet biased toward structure characters.
_MARKUP = st.text(
    alphabet=st.sampled_from(
        list("<>/=&;!?-[]'\" \n\tabcdDATAscriptyleXMP#x0123&amp;lt<!--]]>")
    ),
    max_size=200,
)
_FREE = st.text(max_size=120)

_OPTIONS = st.fixed_dictionaries(
    {
        "xml_mode": st.booleans(),
        "decode_entities": st.booleans(),
        "recognize_cdata": st.booleans(),
        "recognize_self_closing": st.booleans(),
    }
)


@given(st.one_of(_MARKUP, _FREE), _OPTIONS)
@settings(max_examples=400, deadline=None)
def test_never_raises_and_indices_valid(doc, options):
    collector = EventCollector()
    parser = Parser(collector, ParserOptions(**options))
    collector.attach(parser)
    parser.parse(doc)  # EventCollector validates start<=end on every event
    for ev in collector.events:
        # len(doc)+1 is reachable: after trailing comment-like data the
        # reference sets startIndex = endIndex + 1 with endIndex ==
        # buffer.length (Parser.ts:663-671), and onend copies that into
        # the implied EOF close-tags (Parser.ts:699-708).
        assert 0 <= ev["startIndex"] <= len(doc) + 1
        assert 0 <= ev["endIndex"] <= len(doc) + 1


@given(st.one_of(_MARKUP, _FREE))
@settings(max_examples=300, deadline=None)
def test_dom_well_formed_and_text_consistent(doc):
    nodes = parse_document(doc)
    seen_children: dict[int, int] = {}
    for n in nodes:
        assert n["parent_id"] < n["node_id"]
        expected_idx = seen_children.get(n["parent_id"], 0)
        assert n["idx_in_parent"] == expected_idx
        seen_children[n["parent_id"]] = expected_idx + 1

    # Event-stream text == DOM text fold.
    parts: list[str] = []

    class TextOnly:
        @staticmethod
        def on_text(data: str) -> None:
            parts.append(data)

    Parser(TextOnly()).parse(doc)
    assert "".join(parts) == text_content(nodes)


@given(st.lists(st.sampled_from(["p", "div", "span", "li", "em"]), max_size=6),
       st.text(alphabet=st.characters(blacklist_characters="<&\x00", blacklist_categories=("Cs",)), max_size=40))
@settings(max_examples=200, deadline=None)
def test_serialize_roundtrip_preserves_text(tags, inner):
    doc = "".join(f"<{t}>" for t in tags) + inner + "".join(
        f"</{t}>" for t in reversed(tags)
    )
    from htmlparser2_spark.engine.dom import serialize

    nodes = parse_document(doc)
    rendered = serialize(nodes)
    assert text_content(parse_document(rendered)) == text_content(nodes)


@given(st.one_of(_MARKUP, _FREE))
@settings(max_examples=200, deadline=None)
def test_xml_mode_never_raises(doc):
    handler = DomArrayHandler()
    parser = Parser(handler, ParserOptions(xml_mode=True))
    handler.attach(parser)
    parser.parse(doc)


def test_pathological_deep_nesting_is_iterative():
    """100k-deep nesting must not hit Python's recursion limit anywhere
    in parse -> extract -> clean -> serialize -> readability."""
    from htmlparser2_spark.engine.dom import (
        clean_text,
        parse_document,
        serialize,
        text_content,
    )
    from htmlparser2_spark.engine.fast_text import fast_text_content
    from htmlparser2_spark.engine.readability import main_content

    depth = 100_000
    deep = "<div>" * depth + "core" + "</div>" * depth
    nodes = parse_document(deep)
    assert len(nodes) == depth + 1
    assert text_content(nodes) == "core"
    assert clean_text(nodes) == "core"
    assert serialize(nodes) == deep
    assert fast_text_content(deep) == "core"
    assert main_content(deep) == "core"


def test_pathological_wide_document():
    from htmlparser2_spark.engine.dom import parse_document, text_content

    wide = "<p>x</p>" * 200_000
    nodes = parse_document(wide)
    assert len(nodes) == 400_000
    assert text_content(nodes) == "x" * 200_000
