"""Scan-based HTML/XML tokenizer, semantically equivalent to the reference.

Reproduces the observable callback stream of the reference tokenizer
(/root/reference/src/Tokenizer.ts — a 27-state per-character machine) with
a different execution strategy designed for CPython inside Arrow-batched
Spark UDFs: each state consumes the longest possible run using
``str.find`` / precompiled regex scans (C speed), so the Python-level loop
iterates per *token*, not per character. Positions are Unicode code-point
offsets into the document string (the reference uses UTF-16 code units;
identical for BMP input — see SURVEY.md §7 "hard parts").

Callback surface mirrors Tokenizer.ts:113-130 (positional events carrying
index pairs, entity events carrying code points). Whole-document parsing
only: the reference's chunk/pause/resume machinery maps to Spark's own
batching (SURVEY.md §2.3), so each call to :meth:`Tokenizer.run` processes
one complete document.

Every helper consumes input from a given position and returns
``(cursor, section_start)``; the main loop ends when ``cursor >= len`` and
the epilogue emits ``buf[section_start:]`` as trailing text when non-empty
(helpers that drop their pending construct — e.g. a tag open at EOF,
Tokenizer.ts:1106-1121 — return ``section_start == len`` to suppress it).
"""

from __future__ import annotations

import re

from .entities import (
    ATTRIBUTE,
    LEGACY,
    STRICT,
    _COMMON_HTML,
    _COMMON_XML,
    decode_at,
    decode_text_span,
)

__all__ = ["Tokenizer", "QUOTE_NONE", "QUOTE_UNQUOTED", "QUOTE_SINGLE", "QUOTE_DOUBLE"]

# Quote types for on_attrib_end (reference: Tokenizer.ts:103-108).
QUOTE_NONE = 0
QUOTE_UNQUOTED = 1
QUOTE_SINGLE = 2
QUOTE_DOUBLE = 3

_WS = " \t\n\f\r"

# Length-preserving ASCII lowercasing (str.lower can change string length
# for some Unicode code points, which would corrupt position bookkeeping).
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)

# Text-only ("special") HTML tags, keyed by first character (reference:
# Tokenizer.ts:138-176). `plaintext` switches the rest of the document to
# text; `title`/`textarea` are RCDATA (entities decode inside); the rest
# are raw text.
_SPECIAL_BY_FIRST = {
    "i": ("iframe",),
    "n": ("noembed", "noframes"),
    "p": ("plaintext",),
    "s": ("script", "style"),
    "t": ("title", "textarea"),
    "x": ("xmp",),
}
_RCDATA = frozenset(("title", "textarea"))

_RE_TEXT_STOP = re.compile(r"[<&]")
_RE_NON_WS = re.compile(r"[^ \t\n\f\r]")
_RE_TAG_SECTION_END = re.compile(r"[ \t\n\f\r/>]")
_RE_ATTR_NAME_END = re.compile(r"[ \t\n\f\r/>=]")
_RE_NQ_VALUE_END = re.compile(r"[ \t\n\f\r>&]")
_RE_NQ_VALUE_END_NODECODE = re.compile(r"[ \t\n\f\r>]")
# Light-path whole-tag match (name + attribute section + '>') — the
# group-1 end is the tag-name end (first section-end char), saving the
# separate _RE_TAG_SECTION_END search on the hot per-tag path.
# Attribute-section grammar: quotes are consumable ONLY directly after
# '=' + optional whitespace — the exact condition under which the
# attribute machine enters a quoted-value state. Any other quote
# placement fails the match (no alternative can consume a bare quote)
# and the caller bails to the exact machine. The alternatives are
# first-character-disjoint ('=' is excluded from the char class), so
# the scan is backtrack-free/linear.
_RE_LIGHT_TAG = re.compile(
    r"""([^ \t\n\f\r/>]*)"""
    r"""(?:>|[ \t\n\f\r/](?:[^>"'=]|=[ \t\n\f\r]*(?:"[^"]*"|'[^']*')?)*>)"""
)
# Closing-tag light path (HTML mode): name section ([a-zA-Z] then
# anything that isn't a section-end char), after which
# AfterClosingTagName skips EVERYTHING up to the terminating '>' — so
# one linear match reproduces the exact machine's positions (group-1
# end = name end, match end = '>' + 1). The junk+'>' suffix is
# optional because the exact machine still EMITS on_close_tag when EOF
# arrives during the junk skip (only EOF inside the name drops the
# event) — the caller distinguishes the three EOF shapes by where the
# match ends.
_RE_LIGHT_CLOSE = re.compile(r"([a-zA-Z][^ \t\n\f\r/>]*)(?:[^>]*>)?")
# Per-attribute light path for the exact machine (attribute events
# wanted — the full parser): ONE linear match replaces the non-ws /
# name-end / non-ws / value scans for the dominant shapes — quoted
# entity-free value, or a valueless attribute. The terminator
# lookahead after the name group blocks backtracking from re-matching
# a shortened name as valueless when the value branch fails (e.g. a
# '&' inside the quotes); any failure — EOF anywhere, unquoted or
# entity-carrying value, empty name — falls through to the exact
# machine, which re-scans from the same position.
_RE_ATTR_LIGHT = re.compile(
    r"[ \t\n\f\r]*"
    r"([^ \t\n\f\r/>=]+)(?=[ \t\n\f\r/>=])"
    r"(?:"
    r"""[ \t\n\f\r]*=[ \t\n\f\r]*(?:"([^"&]*)"|'([^'&]*)')"""
    r"|(?=[ \t\n\f\r]*[^ \t\n\f\r=])"
    r")"
)
_RE_COMMENT_END = re.compile(r"--!?>")
_RE_TRAILING_BANG_DASHES = re.compile(r"--+!$")
_RE_TRAILING_DASHES = re.compile(r"--+$")


def _is_end_of_tag_section(c: str) -> bool:
    return c == "/" or c == ">" or c in _WS


class Tokenizer:
    """One-shot tokenizer over a complete document string.

    ``cbs`` is any object providing the callback methods mirroring the
    reference ``Callbacks`` interface: ``on_text(start, end)``,
    ``on_text_entity(cp, end)``, ``on_open_tag_name(start, end)``,
    ``on_open_tag_end(end)``, ``on_self_closing_tag(end)``,
    ``on_close_tag(start, end)``, ``on_attrib_name(start, end)``,
    ``on_attrib_data(start, end)``, ``on_attrib_entity(cp)``,
    ``on_attrib_end(quote, end)``, ``on_comment(start, end, offset)``,
    ``on_cdata(start, end, offset)``, ``on_declaration(start, end)``,
    ``on_processing_instruction(start, end)``, ``on_end()`` and
    ``is_in_foreign_context()``.
    """

    __slots__ = (
        "xml_mode",
        "decode_entities",
        "recognize_self_closing",
        "light_attrs",
        "cbs",
    )

    def __init__(
        self,
        cbs,
        *,
        xml_mode: bool = False,
        decode_entities: bool = True,
        recognize_self_closing: bool | None = None,
        light_attrs: bool = False,
    ) -> None:
        self.cbs = cbs
        self.xml_mode = xml_mode
        self.decode_entities = decode_entities
        self.recognize_self_closing = (
            xml_mode if recognize_self_closing is None else recognize_self_closing
        )
        # light_attrs: callers that ignore attribute events (text-only
        # extraction) may skip the attribute machine when the tag chunk
        # is quote-free — the first '>' then provably ends the tag
        # (unquoted values and names terminate at '>'). Quoted chunks
        # fall back to the exact per-attribute scan. Only valid when
        # recognize_self_closing is off (on_self_closing_tag vs
        # on_open_tag_end indices are not distinguished).
        self.light_attrs = light_attrs

    # ------------------------------------------------------------------
    def run(self, buf: str, start: int = 0, should_pause=None,
            lbuf: str | None = None) -> int | None:
        """Tokenize ``buf`` from ``start`` to EOF (one-shot semantics).

        ``start`` supports the incremental path (:meth:`run_partial`):
        the final ``end()`` pass resumes where the last partial pass
        suspended; positions stay absolute document offsets either way.
        ``should_pause`` (streaming only) is checked between constructs;
        when it fires, the pass stops WITHOUT the EOF epilogue and
        returns the position to resume from (None = ran to completion).
        ``lbuf`` is an optional precomputed ASCII-lowercased shadow of
        ``buf`` (streaming callers maintain it incrementally).
        """
        cbs = self.cbs
        xml = self.xml_mode
        decode = self.decode_entities
        n = len(buf)
        if lbuf is None:
            lbuf = buf.translate(_ASCII_LOWER)
        text_mode = STRICT if xml else LEGACY

        # Hot-path locals: attribute/method lookups hoisted out of the
        # per-token loop (same technique as the reference's hot-state
        # dispatch ordering, Tokenizer.ts:893-897).
        on_text = cbs.on_text
        open_tag = self._open_tag
        closing_tag = self._closing_tag
        markup_declaration = self._markup_declaration
        find = buf.find

        i = start  # cursor
        sec = start  # section start of the current text run
        # Text-stop scanning: the next '<' and next '&' are tracked as
        # lazily-refreshed str.find positions instead of a per-text-run
        # `[<&]` regex search — C-level find beats the regex machinery,
        # and an entity-free document (the common web shape) pays ONE
        # failed '&' probe total instead of one regex scan per text run.
        # A cached position is stale once the cursor passes it (< i);
        # -1 ("none ahead") is final, find from a later start can only
        # re-confirm it.
        lt = find("<", i)
        amp = find("&", i) if decode else -1
        # Dominant-entity inline probe: the handful of references that
        # carry most of the web's escaping (&amp; &lt; &nbsp; …, all
        # fully ';'-terminated and mode-independent given the table)
        # resolve with one find + one dict probe right here, skipping
        # the _entity -> decode_at call chain. A miss falls through to
        # the exact decoder unchanged.
        common = _COMMON_XML if text_mode == STRICT else _COMMON_HTML
        common_get = common.get
        on_text_entity = cbs.on_text_entity
        # Batched-text opt-in: a handler exposing ``on_text_decoded``
        # (the fast text path) receives each entity-carrying text run
        # as ONE pre-decoded string — decode_text_span reproduces the
        # sequential per-'&' scan exactly (see its docstring for why
        # the '<' boundary is semantics-preserving) — instead of
        # alternating on_text/on_text_entity events. Positional
        # handlers (parser, collectors) keep the exact event stream.
        on_text_decoded = getattr(cbs, "on_text_decoded", None)
        while i < n:
            if should_pause is not None and should_pause():
                return sec
            # ---------------- Text ----------------
            if lt != -1 and lt < i:
                lt = find("<", i)
            if amp != -1:
                if amp < i:
                    amp = find("&", i)
                if amp != -1 and (lt == -1 or amp < lt):
                    if on_text_decoded is not None:
                        seg_end = lt if lt != -1 else n
                        on_text_decoded(
                            decode_text_span(buf, sec, seg_end, text_mode),
                            seg_end,
                        )
                        i = sec = seg_end
                        continue
                    semi = find(";", amp + 1, amp + 9)
                    hit = (
                        common_get(buf[amp + 1 : semi + 1])
                        if semi != -1
                        else None
                    )
                    if hit is None:
                        # Exact decoder, inlined from _entity's text
                        # branch (the wrapper call was measurable at
                        # real-web entity densities).
                        res = decode_at(buf, amp, text_mode)
                        if res is None:
                            i = amp + 1  # '&' stays literal; rescan
                            continue
                        hit = res
                    cps, consumed = hit
                    if amp > sec:
                        on_text(sec, amp)
                    end = amp + consumed
                    for cp in cps:
                        on_text_entity(cp, end)
                    i = sec = end
                    continue
            j = lt
            if j == -1:
                i = n
                break
            # '<' found at j.
            if j > sec:
                on_text(sec, j)
            sec = j
            i = j + 1
            if i >= n:
                break  # trailing '<' emitted by the epilogue

            c = buf[i]
            # ------------- BeforeTagName dispatch -------------
            if ("a" <= c <= "z" or "A" <= c <= "Z") if not xml else (
                not _is_end_of_tag_section(c) and c not in "!?/"
            ):
                i, sec = open_tag(buf, lbuf, i)
            elif c == "!":
                i, sec = markup_declaration(buf, lbuf, i + 1)
            elif c == "?":
                if xml:
                    i, sec = self._processing_instruction(buf, i + 1)
                else:
                    i, sec = self._bogus_comment(buf, i, i)
            elif c == "/":
                i, sec = closing_tag(buf, lbuf, i + 1)
            # else: '<' stays literal text (sec still at '<'); rescan from i.

        # ------------- EOF epilogue (plain trailing text) -------------
        # A pause() raised from the final construct's callback (or from
        # the trailing-text callback itself) defers the rest of the
        # epilogue — including on_end — until resume, like the
        # reference's running flag gates finish().
        if should_pause is not None and should_pause():
            return sec
        if sec < n:
            cbs.on_text(sec, n)
            if should_pause is not None and should_pause():
                return n  # text delivered; on_end deferred to resume
        cbs.on_end()
        return None

    # ------------------------------------------------------------------
    # Incremental (chunked) tokenization.
    #
    # ``run_partial`` tokenizes as much of ``buf`` as is provably final:
    # each construct is pre-validated for completeness with cheap
    # find-based scans, then executed through the same helpers the
    # one-shot path uses. On the first construct that *might* change
    # with more input (unterminated tag/comment/rawtext body, an entity
    # touching the buffer end, trailing text) it stops and returns the
    # position to resume from; the caller re-invokes with the grown
    # buffer, and the final pass runs :meth:`run` (EOF semantics) from
    # the last resume point. Validation is deliberately conservative:
    # a false "incomplete" only defers delivery to ``end()`` (the
    # pre-existing behavior); validation never lets a helper hit its
    # EOF path mid-stream, which is what the chunked==whole golden
    # replays pin.

    # Longest named entity is 33 chars ("&CounterClockwiseContourIntegral;");
    # any '&' closer than this to the buffer end might still grow.
    _ENTITY_GUARD = 48

    def run_partial(self, buf: str, start: int, should_pause=None,
                    lbuf: str | None = None) -> int:
        """Deliver events for every complete construct in
        ``buf[start:]``; return the resume position (callers pass it
        back with more data, or to :meth:`run` at end-of-input).

        ``should_pause`` (optional nullary callable) is checked between
        constructs so a handler callback can apply backpressure
        mid-buffer, like the reference's ``pause()``
        (Parser.ts:805-823): when it returns true, the pass stops at
        the current construct boundary and the resume position points
        at the unconsumed remainder. ``lbuf`` is an optional
        precomputed lowercased shadow (streaming callers maintain it
        incrementally so repeated pumps stay O(new data), not O(doc)).
        """
        cbs = self.cbs
        xml = self.xml_mode
        decode = self.decode_entities
        n = len(buf)
        if lbuf is None:
            lbuf = buf.translate(_ASCII_LOWER)
        text_mode = STRICT if xml else LEGACY
        guard = self._ENTITY_GUARD

        i = start
        sec = start
        while i < n:
            if should_pause is not None and should_pause():
                return sec
            # ---------------- text ----------------
            if decode:
                m = _RE_TEXT_STOP.search(buf, i)
                if m is None:
                    return sec  # trailing text: not final yet
                j = m.start()
                if buf[j] == "&":
                    res = decode_at(buf, j, text_mode)
                    # Stability: a decode (or non-decode) is final only
                    # when no future char can change it. Any '&' within
                    # the longest-entity window of the buffer end can
                    # ("&timesbar" + ";" upgrades a legacy &times match
                    # to the full name; "&am" + "p;" turns a non-match
                    # into one), and an arbitrarily long numeric run
                    # touching the end can keep growing.
                    if n - j < guard or (res is not None and j + res[1] >= n):
                        if sec < j:
                            cbs.on_text(sec, j)
                        return j
                    if res is None:
                        i = j + 1  # stable literal '&'
                        continue
                    cps, consumed = res
                    end = j + consumed
                    if sec < j:
                        cbs.on_text(sec, j)
                    for cp in cps:
                        cbs.on_text_entity(cp, end)
                    i = sec = end
                    continue
            else:
                j = buf.find("<", i)
                if j == -1:
                    return sec
            # '<' at j. Text before a construct is final in every
            # continuation (the one-shot loop emits it before
            # dispatching too), so suspensions flush it and resume at
            # the '<' itself.
            if j + 1 >= n:
                if j > sec:
                    cbs.on_text(sec, j)
                return j  # dispatch char not buffered yet
            c = buf[j + 1]
            if ("a" <= c <= "z" or "A" <= c <= "Z") if not xml else (
                not _is_end_of_tag_section(c) and c not in "!?/"
            ):
                if not self._validate_open_tag(buf, lbuf, j + 1):
                    if j > sec:
                        cbs.on_text(sec, j)
                    return j
                if j > sec:
                    cbs.on_text(sec, j)
                i, sec = self._open_tag(buf, lbuf, j + 1)
            elif c == "!":
                if not self._validate_bang(buf, lbuf, j):
                    if j > sec:
                        cbs.on_text(sec, j)
                    return j
                if j > sec:
                    cbs.on_text(sec, j)
                i, sec = self._markup_declaration(buf, lbuf, j + 2)
            elif c == "?":
                terminated = (
                    buf.find("?>", j + 2) != -1
                    if xml
                    else buf.find(">", j + 2) != -1
                )
                if not terminated:
                    if j > sec:
                        cbs.on_text(sec, j)
                    return j
                if j > sec:
                    cbs.on_text(sec, j)
                if xml:
                    i, sec = self._processing_instruction(buf, j + 2)
                else:
                    i, sec = self._bogus_comment(buf, j + 1, j + 1)
            elif c == "/":
                # Every closing-tag path (name, '</>', '</ ' bogus
                # comment, junk skip) terminates at a '>'.
                if buf.find(">", j + 2) == -1:
                    if j > sec:
                        cbs.on_text(sec, j)
                    return j
                if j > sec:
                    cbs.on_text(sec, j)
                i, sec = self._closing_tag(buf, lbuf, j + 2)
            else:
                i = j + 1  # literal '<': stays in the text run
        return sec

    def _validate_open_tag(self, buf: str, lbuf: str, i: int) -> bool:
        """True when the open tag starting at ``i`` (first name char) —
        including a raw-text/RCDATA body for special tags — is provably
        complete in ``buf``."""
        n = len(buf)
        special = None
        if not self.xml_mode:
            cands = _SPECIAL_BY_FIRST.get(lbuf[i])
            if cands and not self.cbs.is_in_foreign_context():
                for cand in cands:
                    end = i + len(cand)
                    if lbuf[i:end] == cand and end < n:
                        if _is_end_of_tag_section(buf[end]):
                            special = cand
                        break
                    if end >= n and cand.startswith(lbuf[i:n]):
                        return False  # could still become special
        if special == "plaintext":
            # Consumes to EOF by definition: only final.
            return False
        # Quote-aware scan for the tag-ending '>' (value quotes are
        # those preceded by '='+ws; any other quote placement is
        # pathological — defer it rather than model the exact machine).
        pos = i
        while True:
            g = buf.find(">", pos)
            if g == -1:
                return False
            q1 = buf.find('"', pos, g)
            q2 = buf.find("'", pos, g)
            q = q1 if q2 == -1 else q2 if q1 == -1 else min(q1, q2)
            if q == -1:
                break
            k = q - 1
            while k >= i and buf[k] in _WS:
                k -= 1
            if k < i or buf[k] != "=":
                return False  # suspicious quote: defer to end()
            mate = buf.find(buf[q], q + 1)
            if mate == -1:
                return False
            pos = mate + 1
        if special is None:
            return True
        # Raw-text/RCDATA body: the case-insensitive end tag, a tag-
        # section char after it, and the closing '>' must all be here.
        needle = "</" + special
        ln = len(needle)
        pos = g + 1
        while True:
            k = lbuf.find(needle, pos)
            if k == -1 or k + ln >= n:
                return False
            if not _is_end_of_tag_section(buf[k + ln]):
                pos = k + ln
                continue
            if buf[k + ln] == ">":
                return True
            return buf.find(">", k + ln) != -1

    def _validate_bang(self, buf: str, lbuf: str, j: int) -> bool:
        """True when the ``<!`` construct at ``j`` is provably complete:
        comments need their end sequence, CDATA its ``]]>``, everything
        else a ``>``; prefixes that could still become a different
        construct ("<![CD", "<!doct" at buffer end) stay incomplete."""
        n = len(buf)
        s = j + 2
        if s >= n:
            return False
        c = buf[s]
        if c == "[":
            rest = buf[s + 1 : s + 7]
            if rest == "CDATA[":
                # XML emits the cdata at ']]>'; unclosed HTML CDATA is
                # a bogus-comment-to-EOF — either way ']]>' must be
                # in-buffer before the construct is final.
                return buf.find("]]>", s + 7) != -1
            if len(rest) < 6 and "CDATA[".startswith(rest):
                return False  # could still complete the sequence
            return buf.find(">", s + 1) != -1  # declaration / bogus
        if c == "-":
            if s + 1 >= n:
                return False
            if buf[s + 1] == "-":
                body = s + 2  # comment content start
                if not self.xml_mode:
                    # Abruptly closed empty comments are HTML-only
                    # (Tokenizer.ts:419-432); XML comments always need
                    # the full end sequence.
                    if body >= n:
                        return False
                    if buf[body] == ">":
                        return True  # <!-->
                    if buf[body] == "-" and body + 1 >= n:
                        return False  # could be <!---> or a dash run
                    if buf.startswith("->", body):
                        return True  # <!--->
                return _RE_COMMENT_END.search(buf, body) is not None
            # '<!-' + other: XML declaration (consumes the char at s+1
            # unchecked, so its terminator starts at s+2) / HTML
            # bogus-or-empty comment (terminator can be at s+1 itself).
            if self.xml_mode:
                return buf.find(">", s + 2) != -1
            return buf.find(">", s + 1) != -1
        if not self.xml_mode and lbuf[s] == "d":
            k = s + 1
            t = 1
            while k < n and t < 7 and lbuf[k] == "doctype"[t]:
                k += 1
                t += 1
            if t < 7 and k >= n:
                return False  # partial 'doctype' could still match
            return buf.find(">", k) != -1
        if not self.xml_mode:
            if c == ">":
                return True  # '<!>': empty bogus comment
            return buf.find(">", s + 1) != -1  # bogus comment
        # XML declaration: the char at s is consumed unchecked
        # (Tokenizer.ts BeforeDeclaration), so '<!>' scans on for a
        # LATER '>' — the terminator search starts past it.
        return buf.find(">", s + 1) != -1

    # ------------------------------------------------------------------
    def _is_tag_start(self, c: str) -> bool:
        if self.xml_mode:
            return not _is_end_of_tag_section(c)
        return "a" <= c <= "z" or "A" <= c <= "Z"

    def _entity(self, buf: str, amp: int, mode: int, sec: int, in_attr: bool):
        """Handle '&' at ``amp``; returns (cursor, section_start)."""
        res = decode_at(buf, amp, mode)
        if res is None:
            # No reference: '&' stays literal, rescan after it.
            return amp + 1, sec
        cps, consumed = res
        cbs = self.cbs
        end = amp + consumed
        if in_attr:
            if sec < amp:
                cbs.on_attrib_data(sec, amp)
            for cp in cps:
                cbs.on_attrib_entity(cp)
        else:
            if sec < amp:
                cbs.on_text(sec, amp)
            for cp in cps:
                cbs.on_text_entity(cp, end)
        return end, end

    # ------------------------------------------------------------------
    # Open tag + attributes. Entered with ``i`` at the first tag-name char.
    def _open_tag(self, buf: str, lbuf: str, i: int):
        cbs = self.cbs
        n = len(buf)
        name_start = i

        special = None  # matched text-only tag name, if any
        if not self.xml_mode:
            cands = _SPECIAL_BY_FIRST.get(lbuf[i])
            # Foreign-context query deferred until a special candidate
            # matches by first letter (rare) — one dict probe replaces a
            # Python call on the per-tag hot path.
            if cands and not cbs.is_in_foreign_context():
                for cand in cands:
                    end = i + len(cand)
                    if lbuf[i:end] == cand and end < n:
                        if _is_end_of_tag_section(buf[end]):
                            special = cand
                        break
                    if end >= n and cand.startswith(lbuf[i:n]):
                        # EOF while the tail is still a (possibly complete)
                        # prefix of the special-start sequence: the partial
                        # name is emitted as trailing text (reference
                        # trailing-data rule for SpecialStartSequence).
                        return n, name_start

        if self.light_attrs:
            # One linear regex scan over the whole tag — name section
            # plus attributes to the tag-ending '>' (_RE_LIGHT_TAG). A
            # quote is a value delimiter only when preceded by '='
            # (+ optional ws) — the exact condition under which the
            # attribute machine enters a quoted-value state. Any other
            # quote placement (quote in a name or unquoted value:
            # pathological markup) fails the match and bails to the
            # exact machine below, as does EOF inside the tag (the
            # exact machine's EOF paths then drop the tag). Attribute
            # events are skipped by contract; '/>' is equivalent to
            # '>' here (recognize_self_closing off).
            m = _RE_LIGHT_TAG.match(buf, name_start)
            if m is not None:
                cbs.on_open_tag_name(name_start, m.end(1))
                end = m.end() - 1
                cbs.on_open_tag_end(end)
                return self._enter_tag_body(buf, lbuf, end + 1, special)
            # No match: fall through to the exact attribute machine.

        m = _RE_TAG_SECTION_END.search(buf, i)
        if m is None:
            return n, n  # EOF inside tag name: tag dropped
        j = m.start()
        cbs.on_open_tag_name(name_start, j)

        # Fast path: attribute-less tag (`<p>` — the dominant shape).
        if buf[j] == ">":
            cbs.on_open_tag_end(j)
            return self._enter_tag_body(buf, lbuf, j + 1, special)

        # --------- attribute loop (BeforeAttributeName etc.) ---------
        i = j
        attr_light_match = _RE_ATTR_LIGHT.match
        on_attrib_name = cbs.on_attrib_name
        on_attrib_data = cbs.on_attrib_data
        on_attrib_end = cbs.on_attrib_end
        while True:
            # Light per-attribute path (see _RE_ATTR_LIGHT): quoted
            # entity-free values and valueless attributes in one match,
            # with event positions identical to the exact machine below.
            m = attr_light_match(buf, i)
            if m is not None:
                on_attrib_name(m.start(1), m.end(1))
                v = m.start(2)
                if v != -1:
                    on_attrib_data(v, m.end(2))
                    on_attrib_end(QUOTE_DOUBLE, m.end())
                else:
                    v = m.start(3)
                    if v != -1:
                        on_attrib_data(v, m.end(3))
                        on_attrib_end(QUOTE_SINGLE, m.end())
                    else:
                        on_attrib_end(QUOTE_NONE, m.end(1))
                i = m.end()
                continue
            m = _RE_NON_WS.search(buf, i)
            if m is None:
                return n, n  # EOF between attributes: tag dropped
            i = m.start()
            c = buf[i]
            if c == ">":
                cbs.on_open_tag_end(i)
                return self._enter_tag_body(buf, lbuf, i + 1, special)
            if c == "/":
                # InSelfClosingTag: whitespace may separate '/' and '>'.
                m2 = _RE_NON_WS.search(buf, i + 1)
                if m2 is None:
                    return n, n  # EOF: tag dropped
                k = m2.start()
                if buf[k] == ">":
                    cbs.on_self_closing_tag(k)
                    if self.recognize_self_closing:
                        return k + 1, k + 1
                    return self._enter_tag_body(buf, lbuf, k + 1, special)
                i = k  # anything else: treat as a new attribute
                continue
            # --- attribute name ---
            m = _RE_ATTR_NAME_END.search(buf, i)
            if m is None:
                return n, n  # EOF in attribute name: tag dropped
            j = m.start()
            cbs.on_attrib_name(i, j)
            name_end = j
            m = _RE_NON_WS.search(buf, j)
            if m is None:
                return n, n  # EOF after attribute name: tag dropped
            i = m.start()
            if buf[i] != "=":
                # Valueless attribute; current char starts the next one.
                cbs.on_attrib_end(QUOTE_NONE, name_end)
                continue
            m = _RE_NON_WS.search(buf, i + 1)
            if m is None:
                return n, n  # EOF before attribute value: tag dropped
            i = m.start()
            c = buf[i]
            if c == '"' or c == "'":
                qtype = QUOTE_DOUBLE if c == '"' else QUOTE_SINGLE
                sec = pos = i + 1
                while True:
                    j = buf.find(c, pos)
                    if self.decode_entities:
                        a = buf.find("&", pos, j if j != -1 else n)
                        if a != -1:
                            pos, sec = self._entity(buf, a, ATTRIBUTE, sec, True)
                            continue
                    if j == -1:
                        return n, n  # EOF in quoted value: tag dropped
                    cbs.on_attrib_data(sec, j)
                    cbs.on_attrib_end(qtype, j + 1)
                    i = j + 1
                    break
                continue
            # Unquoted value (possibly empty, e.g. `x=>`).
            sec = pos = i
            stop = (
                _RE_NQ_VALUE_END
                if self.decode_entities
                else _RE_NQ_VALUE_END_NODECODE
            )
            while True:
                m = stop.search(buf, pos)
                if m is None:
                    return n, n  # EOF in unquoted value: tag dropped
                j = m.start()
                if buf[j] == "&":
                    pos, sec = self._entity(buf, j, ATTRIBUTE, sec, True)
                    continue
                cbs.on_attrib_data(sec, j)
                cbs.on_attrib_end(QUOTE_UNQUOTED, j)
                i = j
                break
            continue

    # ------------------------------------------------------------------
    def _enter_tag_body(self, buf: str, lbuf: str, i: int, special):
        """After '>' of an open tag: normal text, raw text, or plaintext."""
        if special is None:
            return i, i
        if special == "plaintext":
            n = len(buf)
            if i < n:
                self.cbs.on_text(i, n)
            return n, n
        return self._special_tag(buf, lbuf, i, special)

    def _special_tag(self, buf: str, lbuf: str, i: int, name: str):
        """Scan raw-text/RCDATA content for the case-insensitive end tag."""
        cbs = self.cbs
        n = len(buf)
        needle = "</" + name
        ln = len(needle)
        rcdata = name in _RCDATA and self.decode_entities
        sec = pos = i
        while True:
            j = lbuf.find(needle, pos)
            if rcdata:
                a = buf.find("&", pos, j if j != -1 else n)
                if a != -1:
                    pos, sec = self._entity(buf, a, LEGACY, sec, False)
                    continue
            if j == -1 or j + ln >= n:
                # EOF: all remaining content — including a trailing
                # partial/unterminated end tag — is text.
                if sec < n:
                    cbs.on_text(sec, n)
                return n, n
            k = j + ln  # just past the matched "</name"
            if not _is_end_of_tag_section(buf[k]):
                pos = k
                continue
            # Matched closing tag: flush text, then InClosingTagName with
            # the section starting just past "</".
            if sec < j:
                cbs.on_text(sec, j)
            cbs.on_close_tag(j + 2, k)
            if buf[k] == ">":
                return k + 1, k + 1
            g = buf.find(">", k)  # AfterClosingTagName: skip junk to '>'
            if g == -1:
                return n, n
            return g + 1, g + 1

    # ------------------------------------------------------------------
    def _closing_tag(self, buf: str, lbuf: str, i: int):
        """Entered just past '</'."""
        cbs = self.cbs
        n = len(buf)
        if i >= n:
            return n, i - 2  # '</' at EOF: trailing text from '<'
        c = buf[i]
        if c in _WS:
            if self.xml_mode:
                m = _RE_NON_WS.search(buf, i)
                if m is None:
                    return n, i - 2  # trailing text from '<'
                i = m.start()
                c = buf[i]
            else:
                # '</ ' in HTML: bogus comment from the whitespace char.
                return self._bogus_comment(buf, i, i)
        if c == ">":
            if self.xml_mode:
                # '</>' ignored; the section (from '<') stays in the text.
                return i + 1, i - 2
            return i + 1, i + 1
        if not self.xml_mode and ("a" <= c <= "z" or "A" <= c <= "Z"):
            # Light path: one linear match replaces the section-end
            # search + junk-skip find (see _RE_LIGHT_CLOSE). Three EOF
            # shapes, mirroring the exact machine below: name ran to
            # EOF -> event dropped; name ended but no '>' -> event
            # emitted, rest dropped; '>' found -> resume past it.
            m = _RE_LIGHT_CLOSE.match(buf, i)
            j = m.end(1)
            if j >= n:
                return n, n  # EOF in closing tag name: dropped
            cbs.on_close_tag(i, j)
            e = m.end()
            if e > j:
                return e, e
            return n, n  # junk-skip hit EOF: no '>' anywhere ahead
        if self._is_tag_start(c):
            m = _RE_TAG_SECTION_END.search(buf, i)
            if m is None:
                return n, n  # EOF in closing tag name: dropped
            j = m.start()
            cbs.on_close_tag(i, j)
            if buf[j] == ">":
                return j + 1, j + 1
            g = buf.find(">", j)
            if g == -1:
                return n, n
            return g + 1, g + 1
        return self._bogus_comment(buf, i, i)

    # ------------------------------------------------------------------
    def _bogus_comment(self, buf: str, i: int, sec: int):
        """InSpecialComment: everything up to '>' is a comment."""
        n = len(buf)
        j = buf.find(">", i)
        if j == -1:
            if self.xml_mode:
                if sec < n:
                    self.cbs.on_text(sec, n)
            else:
                self.cbs.on_comment(sec, n, 0)
            return n, n
        self.cbs.on_comment(sec, j, 0)
        return j + 1, j + 1

    # ------------------------------------------------------------------
    def _markup_declaration(self, buf: str, lbuf: str, i: int):
        """Entered just past '<!'; the section starts at ``i``."""
        cbs = self.cbs
        n = len(buf)
        xml = self.xml_mode
        sec = i
        if i >= n:
            # '<!' at EOF: empty bogus comment (HTML) / nothing (XML).
            if not xml:
                cbs.on_comment(sec, n, 0)
            return n, n
        c = buf[i]
        if c == "[":
            # CDATA sequence must match 'CDATA[' exactly (case-sensitive,
            # Tokenizer.ts:354-372).
            rest = buf[i + 1 : i + 7]
            if rest == "CDATA[":
                return self._comment_like(buf, i + 7, is_cdata=True)
            if len(rest) < 6 and "CDATA[".startswith(rest):
                # EOF inside the sequence.
                if xml:
                    cbs.on_text(sec, n)
                else:
                    cbs.on_comment(sec, n, 0)
                return n, n
            # Mismatch: reconsume at the first offending character.
            k = i + 1
            t = 0
            while t < 6 and buf[k] == "CDATA["[t]:
                k += 1
                t += 1
            if xml:
                return self._declaration(buf, k, sec)
            return self._bogus_comment(buf, k, sec)
        if xml:
            if c == "-":
                return self._before_comment(buf, i + 1, sec)
            # Anything else: declaration; this char is consumed unchecked.
            return self._declaration(buf, i + 1, sec)
        # ---- HTML mode ----
        if lbuf[i] == "d":
            # DeclarationSequence: case-insensitive 'doctype'.
            k = i + 1
            t = 1
            while k < n and t < 7 and lbuf[k] == "doctype"[t]:
                k += 1
                t += 1
            if t == 7:
                return self._declaration(buf, k, sec)
            if k >= n:
                cbs.on_comment(sec, n, 0)  # partial 'doctype' at EOF
                return n, n
            if buf[k] == ">":
                cbs.on_comment(sec, k, 0)
                return k + 1, k + 1
            return self._bogus_comment(buf, k + 1, sec)
        if c == ">":
            cbs.on_comment(sec, i, 0)
            return i + 1, i + 1
        if c == "-":
            return self._before_comment(buf, i + 1, sec)
        return self._bogus_comment(buf, i + 1, sec)

    def _before_comment(self, buf: str, i: int, sec: int):
        """After '<!-': a second '-' opens a real comment."""
        cbs = self.cbs
        n = len(buf)
        if i >= n:
            if not self.xml_mode:
                cbs.on_comment(sec, n, 0)
            elif sec < n:
                cbs.on_text(sec, n)
            return n, n
        c = buf[i]
        if c == "-":
            return self._comment_like(buf, i + 1, is_cdata=False)
        if self.xml_mode:
            return self._declaration(buf, i + 1, sec)
        if c == ">":
            cbs.on_comment(sec, i, 0)
            return i + 1, i + 1
        return self._bogus_comment(buf, i + 1, sec)

    def _declaration(self, buf: str, i: int, sec: int):
        """InDeclaration: scan to '>'."""
        n = len(buf)
        j = buf.find(">", i)
        if j == -1:
            if self.xml_mode and sec < n:
                self.cbs.on_text(sec, n)
            # HTML: a complete doctype left open at EOF emits nothing.
            return n, n
        self.cbs.on_declaration(sec, j)
        return j + 1, j + 1

    # ------------------------------------------------------------------
    def _comment_like(self, buf: str, sec: int, *, is_cdata: bool):
        """InCommentLike: comments ('-->' with quirks) and CDATA (']]>')."""
        cbs = self.cbs
        n = len(buf)
        xml = self.xml_mode
        if is_cdata:
            j = buf.find("]]>", sec)
            if j != -1:
                end = j + 2
                cbs.on_cdata(sec, end, 2)
                return end + 1, end + 1
            if xml:
                if sec < n:
                    cbs.on_cdata(sec, n, 0)
            else:
                # Unclosed CDATA in HTML is a bogus comment from the '['.
                cbs.on_comment(sec - 7, n, 0)
            return n, n
        # ---- comment ----
        if not xml and sec < n:
            # Abruptly closed empty HTML comments: <!--> and <!--->.
            if buf[sec] == ">":
                cbs.on_comment(sec, sec, 0)
                return sec + 1, sec + 1
            if buf.startswith("->", sec):
                cbs.on_comment(sec, sec + 1, 1)
                return sec + 2, sec + 2
        m = _RE_COMMENT_END.search(buf, sec)
        if m is not None:
            end = m.end() - 1  # index of '>'
            cbs.on_comment(sec, end, end - m.start())  # 2 for -->, 3 for --!>
            return end + 1, end + 1
        # EOF: trim a partially-matched end sequence (HTML only).
        if xml:
            cbs.on_comment(sec, n, 0)
        else:
            tail = buf[sec:]
            if _RE_TRAILING_BANG_DASHES.search(tail):
                k = 3
            elif _RE_TRAILING_DASHES.search(tail):
                k = 2
            elif tail.endswith("-"):
                k = 1
            else:
                k = 0
            cbs.on_comment(sec, n, k)
        return n, n

    # ------------------------------------------------------------------
    def _processing_instruction(self, buf: str, i: int):
        """XML '<?...?>'; requires '?' immediately before '>'."""
        n = len(buf)
        j = buf.find("?>", i)
        if j == -1:
            if i < n:
                self.cbs.on_text(i, n)
            return n, n
        self.cbs.on_processing_instruction(i, j)
        return j + 2, j + 2
