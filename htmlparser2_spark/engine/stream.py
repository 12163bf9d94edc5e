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

Delivery model: like the reference, ``write()`` tokenizes incrementally
— events for every construct that is provably complete in the data so
far are delivered during the ``write()`` call (so createDocumentStream
element callbacks fire as elements close, not only at ``end()``).
Constructs that might still change with more input (an unterminated
tag/comment/rawtext body, an entity touching the buffer end, trailing
text) are deferred: the tokenizer suspends at the first such construct
(:meth:`Tokenizer.run_partial`) and the final ``end()`` pass applies
EOF semantics from the suspension point. Consequences of that contract:

* The *final* event stream is chunk-invariant, exactly like the
  reference (Parser.events.spec.ts:13-40); text events may split at
  chunk boundaries in both engines and collectors merge them.
* Delivery timing differs from the reference only in that an element
  whose construct spans a chunk boundary is delivered when it
  completes, not re-attempted per character.
* Per-document memory is O(doc) in both engines (the reference retains
  all chunks for getSlice, Parser.ts:285-286).

Custom injected tokenizers (``ParserOptions.tokenizer_class``) fall
back to buffer-and-parse-at-end, since their overridden behavior has no
incremental contract.
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
        # Incremental tokenization needs our scan-based Tokenizer's
        # run_partial contract; injected custom tokenizers keep the
        # buffer-and-parse-at-end behavior.
        self._incremental = (options is None or options.tokenizer_class is None)
        self._buf = ""
        self._resume = 0
        self._started = False
        self._ended = False
        self._paused = False
        self._end_pending: tuple | None = None

    def _use_after_end(self, message: str) -> None:
        # Reference: routed to handler.onerror when provided, silently
        # ignored otherwise (`this.cbs.onerror?.(...)`,
        # Parser.ts:776-779, 790-793 — optional chaining, no throw).
        on_error = getattr(self._handler, "on_error", None)
        if on_error is not None:
            on_error(RuntimeError(message))

    def _begin(self) -> None:
        # Lifecycle parity with Parser.parse: onreset/onparserinit fire
        # once at the start of each document (Parser.ts:713-740).
        if not self._started:
            self._parser.reset()
            self._started = True

    def _pump(self) -> None:
        """Tokenize as much buffered input as delivery rules (and a
        possible mid-pass pause()) allow."""
        self._begin()
        self._parser.buffer = self._buf
        self._resume = self._parser.tokenizer.run_partial(
            self._buf, self._resume, should_pause=lambda: self._paused
        )

    def write(self, chunk: str) -> None:
        if self._ended:
            self._use_after_end(".write() after done!")
            return
        self._buf += chunk
        if self._incremental and not self._paused:
            self._pump()

    def end(self, chunk: str | None = None) -> None:
        if self._ended:
            self._use_after_end(".end() after done!")
            return
        if self._paused:
            # Reference: end() while paused is honored on resume()
            # (Parser.ts:805-823 buffers and replays).
            self._end_pending = (chunk,)
            return
        if chunk is not None:
            self._buf += chunk
        self._ended = True
        if self._incremental:
            self._begin()
            self._parser.buffer = self._buf
            self._parser.tokenizer.run(self._buf, self._resume)
        else:
            self._parser.parse(self._buf)

    def pause(self) -> None:
        """Stop consuming input (backpressure, Parser.ts:805-811).

        Subsequent ``write()`` calls buffer without tokenizing; a call
        from within a handler callback stops the in-flight pass at the
        current construct boundary. ``end()`` while paused is deferred
        until :meth:`resume`.
        """
        self._paused = True

    def resume(self) -> None:
        """Resume consumption, replaying buffered input
        (Parser.ts:813-823)."""
        if not self._paused:
            return
        self._paused = False
        if self._ended:
            return
        if self._incremental and (self._started or self._buf):
            self._pump()
        if self._end_pending is not None and not self._paused:
            (chunk,) = self._end_pending
            self._end_pending = None
            self.end(chunk)

    def reset(self) -> None:
        """Reuse the instance for a new document (Parser.ts:713-726)."""
        self._buf = ""
        self._resume = 0
        self._started = False
        self._ended = False
        self._paused = False
        self._end_pending = None

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
