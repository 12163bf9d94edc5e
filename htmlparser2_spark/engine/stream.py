"""Streaming write()/end() lifecycle over the one-shot engine.

Mirrors the reference's incremental-parse API surface
(/root/reference/src/Parser.ts:774-800 write/end semantics,
/root/reference/src/WritableStream.ts:18-42 byte-stream adapter whose
StringDecoder keeps split multi-byte UTF-8 intact):

* :class:`StreamingParser` — ``write(chunk)* ; end()`` with
  write-after-end / end-after-end errors exactly like the reference
  (Parser.ts:776-779, 790-793), plus ``reset()`` for instance reuse
  (Parser.ts:713-726).
* :class:`WritableStreamParser` — accepts ``bytes`` chunks split at
  arbitrary byte offsets; an incremental UTF-8 decoder reassembles
  multi-byte sequences that straddle chunk boundaries
  (WritableStream.spec.ts:10-20 is the reference test for this).

Delivery model: the reference tokenizes each chunk as it arrives and
guarantees the *final* event stream is chunk-invariant — its own spec
parses every input both char-by-char and whole and asserts identical
streams (Parser.events.spec.ts:13-40; the collector merges adjacent
text events split by chunk boundaries). This engine holds the chunks
and emits that same stream at ``end()``: per-document memory is O(doc)
either way (the Parser retains all chunks for getSlice until consumed,
Parser.ts:285-286), and the cluster-scale analogue of bounded
incremental progress is Arrow batch sizing + Structured Streaming
(SURVEY.md §2.3), not intra-document chunk replay. The chunk-invariance
contract itself is pinned by tests/test_streaming_parser.py, which
replays every ported golden char-by-char.
"""

from __future__ import annotations

import codecs

from .parser import Parser, ParserOptions

__all__ = [
    "StreamingParser",
    "WritableStreamParser",
    "WebWritableStreamParser",
    "create_document_stream",
]


class StreamingParser:
    """Incremental-input facade: ``write(str)* ; end()``."""

    def __init__(self, handler, options: ParserOptions | None = None) -> None:
        self._parser = Parser(handler, options)
        self._handler = handler
        self._chunks: list[str] = []
        self._ended = False

    def _use_after_end(self, message: str) -> None:
        # Reference: routed to handler.onerror when provided, silently
        # ignored otherwise (`this.cbs.onerror?.(...)`,
        # Parser.ts:776-779, 790-793 — optional chaining, no throw).
        on_error = getattr(self._handler, "on_error", None)
        if on_error is not None:
            on_error(RuntimeError(message))

    def write(self, chunk: str) -> None:
        if self._ended:
            self._use_after_end(".write() after done!")
            return
        self._chunks.append(chunk)

    def end(self, chunk: str | None = None) -> None:
        if self._ended:
            self._use_after_end(".end() after done!")
            return
        if chunk is not None:
            self._chunks.append(chunk)
        self._ended = True
        self._parser.parse("".join(self._chunks))

    def reset(self) -> None:
        """Reuse the instance for a new document (Parser.ts:713-726)."""
        self._chunks.clear()
        self._ended = False

    def parse_complete(self, data: str) -> None:
        """reset + end(data) — Parser.ts:731-740."""
        self.reset()
        self.end(data)


def create_document_stream(
    callback,
    options: ParserOptions | None = None,
    element_callback=None,
) -> StreamingParser:
    """createDocumentStream-equivalent (/root/reference/src/index.ts:44-55).

    Returns a :class:`StreamingParser` with an attached DOM handler.
    ``element_callback(node_dict)`` fires every time an element
    completes; ``callback(error, nodes)`` fires once at ``end()`` with
    the full adjacency node list (the reference passes the DomHandler
    root; our DOM contract is the flat node list, SURVEY.md §1.3).
    """
    from .dom import DomArrayHandler

    handler = DomArrayHandler(element_callback=element_callback)
    orig_on_end = handler.on_end

    def on_end() -> None:
        orig_on_end()
        callback(None, handler.nodes)

    handler.on_end = on_end  # type: ignore[method-assign]
    sp = StreamingParser(handler, options)
    handler.attach(sp._parser)
    return sp


class WritableStreamParser(StreamingParser):
    """Byte-stream adapter: ``write(bytes)`` at arbitrary split points.

    UTF-8 sequences split across chunks decode correctly via an
    incremental decoder; invalid bytes become U+FFFD (the engine-wide
    ingest policy, matching ``html.decode('utf-8', errors='replace')``
    in the Spark layer).
    """

    def __init__(self, handler, options: ParserOptions | None = None) -> None:
        super().__init__(handler, options)
        self._decoder = codecs.getincrementaldecoder("utf-8")("replace")

    def write(self, chunk: bytes) -> None:  # type: ignore[override]
        super().write(self._decoder.decode(chunk))

    def end(self, chunk: bytes | None = None) -> None:  # type: ignore[override]
        if self._ended:
            # Guard before decoding/writing the final chunk so misuse
            # emits exactly one '.end() after done!' error (the
            # reference's behavior) instead of a '.write() after done!'
            # followed by a second error.
            self._use_after_end(".end() after done!")
            return
        if chunk is not None:
            self.write(chunk)
        tail = self._decoder.decode(b"", final=True)
        if tail:
            super().write(tail)
        super().end()

    def reset(self) -> None:
        super().reset()
        self._decoder.reset()


# The reference ships two byte-stream adapters — Node Writable
# (WritableStream.ts:18-42, StringDecoder) and Web Streams
# (WebWritableStream.ts:23-47, TextDecoder(stream: true)). Both reduce
# to "incremental UTF-8 decode, then write()"; in Python one class
# covers both, so the Web variant is an alias.
WebWritableStreamParser = WritableStreamParser
