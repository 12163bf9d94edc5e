"""Streaming write()/end() lifecycle: chunk-invariance + byte safety.

Ports the reference's chunked-parse contract: every Parser.events golden
is replayed char-by-char through StreamingParser and must produce the
identical event stream as the whole-document parse
(/root/reference/src/Parser.events.spec.ts:13-40), plus the
write-after-end errors (Parser.ts:776-779) and the split-multi-byte
UTF-8 byte-stream test (WritableStream.spec.ts:10-20).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from htmlparser2_spark.engine.collector import EventCollector
from htmlparser2_spark.engine.parser import Parser, ParserOptions
from htmlparser2_spark.engine.stream import StreamingParser, WritableStreamParser

GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "goldens" / "parser_events.json").read_text()
)

_OPTION_MAP = {
    "xmlMode": "xml_mode",
    "decodeEntities": "decode_entities",
    "lowerCaseTags": "lower_case_tags",
    "lowerCaseAttributeNames": "lower_case_attribute_names",
    "recognizeCDATA": "recognize_cdata",
    "recognizeSelfClosing": "recognize_self_closing",
}


def _opts(options: dict) -> ParserOptions:
    return ParserOptions(**{_OPTION_MAP[k]: v for k, v in options.items()})


@pytest.mark.parametrize("case", GOLDENS, ids=[c["name"] for c in GOLDENS])
def test_char_by_char_equals_whole(case):
    opts = _opts(case["options"])

    whole = EventCollector()
    p = Parser(whole, opts)
    whole.attach(p)
    p.parse(case["input"])

    chunked = EventCollector()
    sp = StreamingParser(chunked, opts)
    chunked.attach(sp._parser)
    for ch in case["input"]:
        sp.write(ch)
    sp.end()

    assert chunked.events == whole.events


def test_write_after_end_silently_ignored_without_handler():
    # The reference routes use-after-end through `this.cbs.onerror?.()`
    # (optional chaining, Parser.ts:776-779, 790-793): with no onerror
    # handler the misuse is silently ignored, never thrown.
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.end("<p>x</p>")
    before = list(col.events)
    sp.write("more")  # no error, no new events
    sp.end()
    assert col.events == before


def test_reset_reuses_instance():
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("<h1>a")
    sp.end("</h1>")
    first = [e for e in col.events if e["$event"] == "text"]
    assert first and first[0]["data"] == ["a"]

    col.events.clear()
    sp.reset()
    sp.parse_complete("<p>b</p>")
    second = [e for e in col.events if e["$event"] == "text"]
    assert second and second[0]["data"] == ["b"]


@pytest.mark.parametrize("split_at", [1, 2, 3])
def test_utf8_split_across_chunks(split_at):
    # "Ü" is 2 bytes, "€" is 3, "😀" is 4 — byte splits land mid-sequence
    # for every split_at in 1..3.
    doc = "<p>café € \U0001f600</p>".encode()
    expected = "café € \U0001f600"

    col = EventCollector()
    ws = WritableStreamParser(col)
    col.attach(ws._parser)
    for i in range(0, len(doc), split_at):
        ws.write(doc[i : i + split_at])
    ws.end()
    texts = [e for e in col.events if e["$event"] == "text"]
    assert texts[0]["data"] == [expected]


def test_truncated_utf8_tail_replaced():
    # Document ends mid-sequence: the decoder flush yields U+FFFD, like
    # bytes.decode(..., errors="replace") in the Spark ingest path.
    col = EventCollector()
    ws = WritableStreamParser(col)
    col.attach(ws._parser)
    ws.write(b"<p>ok ")
    ws.end("€".encode()[:2])
    texts = [e for e in col.events if e["$event"] == "text"]
    assert texts[0]["data"] == ["ok �"]


def test_create_document_stream():
    """createDocumentStream parity (/root/reference/src/index.ts:44-55):
    per-element callbacks fire as elements complete; the final callback
    receives the whole document."""
    from htmlparser2_spark.engine.stream import create_document_stream

    elements = []
    finished = []
    sp = create_document_stream(
        lambda err, nodes: finished.append((err, nodes)),
        element_callback=lambda node: elements.append(node["name"]),
    )
    sp.write("<div><p>a</p>")
    sp.write("<p>b</p></div><hr>")
    sp.end()

    # close order: p, p, div; hr (void) closes implied; html-level EOF.
    assert elements == ["p", "p", "div", "hr"]
    assert len(finished) == 1 and finished[0][0] is None
    nodes = finished[0][1]
    texts = [n["data"] for n in nodes if n["type"] == "text"]
    assert texts == ["a", "b"]


def test_element_type_constants():
    from htmlparser2_spark import ElementType, parse_document

    nodes = parse_document("<p>x</p><!--c--><script>s</script>")
    types = {n["type"] for n in nodes}
    assert types == {ElementType.TAG, ElementType.TEXT, ElementType.COMMENT,
                     ElementType.SCRIPT}


def test_write_after_end_routed_to_onerror():
    """With an on_error handler, use-after-end reports instead of
    raising (Parser.ts:776-779)."""
    errors = []

    class H(EventCollector):
        def on_error(self, exc):
            errors.append(str(exc))

    col = H()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.end("<p>x</p>")
    sp.write("more")   # no raise
    sp.end()           # no raise
    assert errors == [".write() after done!", ".end() after done!"]


def test_byte_stream_end_after_done_single_error():
    """WritableStreamParser.end(chunk) after done emits exactly one
    '.end() after done!' error (reference behavior) — not a
    '.write() after done!' first."""
    errors = []

    class H(EventCollector):
        def on_error(self, exc):
            errors.append(str(exc))

    col = H()
    ws = WritableStreamParser(col)
    col.attach(ws._parser)
    ws.end(b"<p>x</p>")
    ws.end(b"more")
    assert errors == [".end() after done!"]


def test_document_stream_reuse_does_not_leak_nodes():
    """Reference DomHandler re-inits in onparserinit, so a reused
    parser starts each document with a clean tree; a second parse must
    not return the previous document's nodes prepended."""
    from htmlparser2_spark.engine.stream import create_document_stream

    results = []
    sp = create_document_stream(lambda err, nodes: results.append(nodes))
    sp.parse_complete("<p>a</p>")
    sp.parse_complete("<b>x</b>")
    assert [n["name"] for n in results[0] if n["type"] == "tag"] == ["p"]
    assert [n["name"] for n in results[1] if n["type"] == "tag"] == ["b"]
    texts = [n["data"] for n in results[1] if n["type"] == "text"]
    assert texts == ["x"]


def test_dom_handler_reuse_across_parser_reset():
    from htmlparser2_spark.engine.dom import DomArrayHandler
    from htmlparser2_spark.engine.parser import Parser

    handler = DomArrayHandler()
    parser = Parser(handler)
    handler.attach(parser)
    parser.parse("<div><p>one</p></div>")
    first = [n["name"] for n in handler.nodes if n["type"] == "tag"]
    parser.parse("<span>two</span>")
    second = [n["name"] for n in handler.nodes if n["type"] == "tag"]
    assert first == ["div", "p"]
    assert second == ["span"]


# ---------------- incremental (write-time) delivery ----------------

def test_events_delivered_during_write():
    """Complete constructs are delivered at write() time, like the
    reference's per-chunk tokenization — not deferred to end()."""
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("<div><p>hello</p>")
    # div open, p open, text, p close are all complete already.
    assert [e["$event"] for e in col.events] == [
        "opentagname", "opentag", "opentagname", "opentag", "text", "closetag",
    ]
    n_before = len(col.events)
    sp.write("<p>wo")
    # "<p>" is complete; "wo" is pending trailing text.
    assert [e["$event"] for e in col.events][n_before:] == [
        "opentagname", "opentag",
    ]
    sp.end("rld</p></div>")
    texts = [e for e in col.events if e["$event"] == "text"]
    assert texts[-1]["data"] == ["world"]


def test_element_callback_fires_during_write():
    from htmlparser2_spark.engine.stream import create_document_stream

    seen = []
    sp = create_document_stream(
        lambda err, nodes: None, element_callback=lambda n: seen.append(n["name"])
    )
    sp.write("<ul><li>a</li>")
    assert seen == ["li"]  # delivered before end()
    sp.write("<li>b</li></ul>")
    assert seen == ["li", "li", "ul"]
    sp.end()
    assert seen == ["li", "li", "ul"]


def test_incomplete_constructs_are_withheld():
    """Nothing is delivered for a construct that may still change:
    unterminated script body, comment, tag, or boundary entity."""
    for prefix in ("<script>alert('</scr", "<!-- unterminated", "<div cls",
                   "text &am"):
        col = EventCollector()
        sp = StreamingParser(col)
        col.attach(sp._parser)
        sp.write(prefix)
        held = [e for e in col.events
                if not (e["$event"] == "text" and prefix.startswith(e["data"][0]))]
        assert held == [], (prefix, col.events)


def test_boundary_entity_resolves_across_chunks():
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("x &am")
    sp.write("p; y")
    sp.end()
    assert [e["data"] for e in col.events if e["$event"] == "text"] == [["x & y"]]


def test_legacy_entity_upgrade_across_chunks():
    # "&times" (legacy, no ;) must not decode early when "bar;" follows
    # in a later chunk and upgrades the match to "&timesbar;".
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("&timesbar")
    sp.write(";")
    sp.end()
    assert col.events[0]["data"] == ["⨱"]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_chunk_splits_equal_whole(seed):
    """Arbitrary (not just per-char) chunkings across all goldens."""
    import random

    rng = random.Random(seed)
    for case in GOLDENS:
        opts = _opts(case["options"])
        whole = EventCollector()
        p = Parser(whole, opts)
        whole.attach(p)
        p.parse(case["input"])

        chunked = EventCollector()
        sp = StreamingParser(chunked, opts)
        chunked.attach(sp._parser)
        s = case["input"]
        i = 0
        while i < len(s):
            step = rng.randint(1, 7)
            sp.write(s[i : i + step])
            i += step
        sp.end()
        assert chunked.events == whole.events, case["name"]


# ---------------- pause() / resume() backpressure ----------------

def test_pause_buffers_writes_until_resume():
    """Parser.ts:805-823: paused writes buffer; resume replays them."""
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("<p>a</p>")
    n_before = len(col.events)
    sp.pause()
    sp.write("<b>x</b>")
    assert len(col.events) == n_before  # nothing delivered while paused
    sp.resume()
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p", "b"]
    sp.end()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["a", "x"]


def test_pause_from_callback_stops_mid_buffer():
    """A handler can pause from inside a callback and the in-flight
    pass stops at the construct boundary (reference tokenizer pause)."""
    holder = {}

    class H(EventCollector):
        def on_open_tag(self, name, attrs, implied):
            super().on_open_tag(name, attrs, implied)
            holder["sp"].pause()

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.write("<p>a</p><b>x</b>")
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p"]  # stopped right after the pausing callback
    sp.resume()  # runs until <b> pauses again
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p", "b"]
    sp.resume()
    sp.end()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["a", "x"]


def test_end_while_paused_deferred_to_resume():
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("<p>a")
    sp.pause()
    sp.end("</p>")
    assert not any(e["$event"] == "closetag" for e in col.events)
    sp.resume()
    assert [e["$event"] for e in col.events][-1] == "closetag"
    # The stream equals an unchunked parse.
    whole = EventCollector()
    p = Parser(whole)
    whole.attach(p)
    p.parse("<p>a</p>")
    assert col.events == whole.events


def test_resume_without_pause_is_noop():
    col = EventCollector()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.resume()
    sp.end("<p>x</p>")
    assert any(e["$event"] == "text" for e in col.events)


def test_pause_in_one_callback_resume_in_another():
    """Reference-legal pattern: pause in onopentagname, resume in
    onopentag — must not recurse or duplicate events."""
    holder = {}

    class H(EventCollector):
        def on_open_tag_name(self, name):
            super().on_open_tag_name(name)
            holder["sp"].pause()

        def on_open_tag(self, name, attrs, implied):
            super().on_open_tag(name, attrs, implied)
            holder["sp"].resume()

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.write("<p>a</p><b>x</b>")
    sp.end()

    whole = EventCollector()
    p = Parser(whole)
    whole.attach(p)
    p.parse("<p>a</p><b>x</b>")
    assert col.events == whole.events  # no duplicates, no recursion


def test_write_from_callback_buffers_without_replay():
    """A write() from inside a handler callback only buffers; the
    injected data parses after the outer pass, never replaying
    already-delivered constructs."""
    holder = {"injected": False}

    class H(EventCollector):
        def on_open_tag(self, name, attrs, implied):
            super().on_open_tag(name, attrs, implied)
            if not holder["injected"]:
                holder["injected"] = True
                holder["sp"].write("<i>inj</i>")

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.write("<p>a</p>")
    sp.end()
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p", "i"]  # each tag delivered exactly once
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["a", "inj"]


def test_end_while_paused_latches_done_state():
    """Reference Parser.end sets ended even while paused: later
    write()/end() calls are misuse (onerror), and their data must NOT
    splice into the document."""
    errors = []

    class H(EventCollector):
        def on_error(self, exc):
            errors.append(str(exc))

    col = H()
    sp = StreamingParser(col)
    col.attach(sp._parser)
    sp.write("<p>a")
    sp.pause()
    sp.end("</p>")
    sp.write("LATE")
    sp.end("AGAIN")
    assert errors == [".write() after done!", ".end() after done!"]
    sp.resume()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["a"]  # no LATE/AGAIN in the document


def test_pause_during_end_flush_suspends_and_resumes():
    """pause() raised from a callback during the end() EOF flush stops
    delivery at the construct boundary; resume() completes the parse."""
    holder = {}

    class H(EventCollector):
        def on_open_tag(self, name, attrs, implied):
            super().on_open_tag(name, attrs, implied)
            if name == "b":
                holder["sp"].pause()

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.pause()
    sp.write("<p>a</p><b>x</b><i>t</i>")
    sp.resume()  # everything parses in resume's pump... until <b> pauses
    # the <i> element must not have been delivered yet
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p", "b"]
    sp.end()  # deferred: still paused
    sp.resume()
    opens = [e["data"][0] for e in col.events if e["$event"] == "opentag"]
    assert opens == ["p", "b", "i"]

    whole = EventCollector()
    p = Parser(whole)
    whole.attach(p)
    p.parse("<p>a</p><b>x</b><i>t</i>")
    assert col.events == whole.events


def test_pause_does_not_lose_data_reference_parity():
    """Ported from the reference 'should not lose data when pausing'
    (Tokenizer.spec.ts:271-304): pause on the first text delivery,
    write more while paused, resume twice (idempotent), then end —
    the full decoded text survives."""
    holder = {}
    first = {"done": False}

    class H(EventCollector):
        def on_text(self, data):
            super().on_text(data)
            if not first["done"]:
                first["done"] = True
                holder["sp"].pause()

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.write("&am")
    sp.write("p; it up!")
    sp.resume()
    sp.resume()  # double-resume must be a no-op, like the reference
    assert not sp._paused
    sp.end()
    # Deviation from the reference's timing: our entity guard defers
    # the short buffer's delivery to the end() flush, so the handler's
    # pause lands there and one more resume completes the flush. The
    # contract under test — no data is lost across pause — holds.
    sp.resume()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert "".join(texts) == "& it up!"


def test_end_from_callback_during_resume_pump_completes():
    """An end() issued from a handler callback while resume()'s pump is
    in flight must still flush the document — trailing text and on_end
    included (regression: the deferred end was dropped on this path)."""
    holder = {}
    ends = []

    class H(EventCollector):
        def on_open_tag(self, name, attrs, implied):
            super().on_open_tag(name, attrs, implied)
            if name == "b":
                holder["sp"].end()

        def on_end(self):
            ends.append(True)

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.pause()
    sp.write("<p>a</p><b>x</b>trailing text")
    sp.resume()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["a", "x", "trailing text"]
    assert ends == [True]


def test_pause_in_final_callback_defers_epilogue():
    """pause() from the last construct's callback during the end()
    flush defers trailing text and on_end until resume() (reference
    finish() is gated by the running flag)."""
    holder = {}
    ends = []

    class H(EventCollector):
        def on_close_tag(self, name, implied):
            super().on_close_tag(name, implied)
            if name == "b":
                holder["sp"].pause()

        def on_end(self):
            ends.append(True)

    col = H()
    sp = StreamingParser(col)
    holder["sp"] = sp
    col.attach(sp._parser)
    sp.pause()
    sp.write("<b>x</b>tail")
    sp.resume()  # pump pauses again inside </b>'s callback
    sp.end()     # deferred: paused
    assert ends == []
    assert all(e["data"] != ["tail"] for e in col.events)
    sp.resume()
    texts = [e["data"][0] for e in col.events if e["$event"] == "text"]
    assert texts == ["x", "tail"]
    assert ends == [True]
