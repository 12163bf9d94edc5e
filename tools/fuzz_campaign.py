"""Heavy offline fuzz campaign (beyond the CI-sized tests/test_fuzz.py).

Generates markup-biased random documents and checks, for every one of
the 16 ParserOptions combinations:

* the parser never raises and indices satisfy
  ``0 <= start <= end <= len(doc) + 1`` (the +1 is reachable — see
  tests/test_eof_edges.py::test_eof_implied_close_index_is_len_plus_one)
* chunked parse (random split) == whole-document parse, same options
* default options: fast_text == DOM textContent

Usage: ``python tools/fuzz_campaign.py [N] [seed]`` (default 60000).
A 60k-document run passes clean as of round 1.
"""

from __future__ import annotations

import itertools
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from htmlparser2_spark.engine.collector import EventCollector  # noqa: E402
from htmlparser2_spark.engine.dom import parse_document, text_content  # noqa: E402
from htmlparser2_spark.engine.fast_text import FastTextExtractor  # noqa: E402
from htmlparser2_spark.engine.parser import Parser, ParserOptions  # noqa: E402
from htmlparser2_spark.engine.stream import StreamingParser  # noqa: E402

ALPH = "<>/=&;!?-[]'\" \n\tabcdDATAscriptyleXMP#x0123&amp;lt<!--]]>" + "é€\U0001f600̸"
TOKENS = [
    "<script>", "</script>", "<style>", "<p ", "<svg>", "</svg>", "<math>",
    "<title>", "</title>", "<textarea>", "<!--", "-->", "--!>", "<![CDATA[",
    "]]>", "<!doctype html>", "&amp;", "&times", "&#x41;", "&#",
    "&NotGreaterFullEqual;", "a='b'", 'c="d"', "x=y", "<br/>", "</p>",
    "<li>", "<tr>", "<td>", "<plaintext>", "<?php ?>", "</ div>",
    "<iframe>", "<noembed>", "<xmp>", "</xmp>",
]

OPTION_SPACE = [
    dict(
        zip(
            ("xml_mode", "decode_entities", "recognize_cdata", "recognize_self_closing"),
            values,
        )
    )
    for values in itertools.product((False, True), repeat=4)
]


def rand_doc(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randrange(0, 30)):
        if rng.random() < 0.5:
            parts.append(rng.choice(TOKENS))
        else:
            parts.append("".join(rng.choice(ALPH) for _ in range(rng.randrange(0, 12))))
    return "".join(parts)


def main(n_docs: int = 60000, seed: int = 20260816) -> int:
    rng = random.Random(seed)
    extractor = FastTextExtractor()
    failures = 0
    for i in range(n_docs):
        doc = rand_doc(rng)
        opts = OPTION_SPACE[i % len(OPTION_SPACE)]
        try:
            col = EventCollector()
            parser = Parser(col, ParserOptions(**opts))
            col.attach(parser)
            parser.parse(doc)
            for ev in col.events:
                assert 0 <= ev["startIndex"] <= ev["endIndex"] <= len(doc) + 1, (
                    doc, opts, ev,
                )
            col2 = EventCollector()
            sp = StreamingParser(col2, ParserOptions(**opts))
            col2.attach(sp._parser)
            k = rng.randrange(0, len(doc) + 1)
            sp.write(doc[:k])
            sp.end(doc[k:])
            assert col2.events == col.events, f"chunk!=whole k={k}: {doc!r} {opts}"
            if i % len(OPTION_SPACE) == 0:
                dom_text = text_content(parse_document(doc))
                fast, _ = extractor.extract(doc)
                assert fast == dom_text, f"fast!=dom: {doc!r}"
            if i % 4 == 0:
                # batch_text opt-in parity (round 4): index-free DOM
                # must match the exact per-event stream's DOM.
                from htmlparser2_spark.engine.dom import DomArrayHandler

                h1 = DomArrayHandler(with_indices=False)
                Parser(h1, ParserOptions(**opts)).parse(doc)
                h2 = DomArrayHandler(with_indices=False)
                Parser(h2, ParserOptions(**opts), batch_text=True).parse(doc)
                assert h1.nodes == h2.nodes, f"batch!=exact: {doc!r} {opts}"
        except Exception as exc:  # noqa: BLE001 - report and count everything
            failures += 1
            print(f"FAIL[{i}] {type(exc).__name__}: {str(exc)[:300]}")
            if failures > 5:
                return 1
    print(f"campaign done: {n_docs} docs x {len(OPTION_SPACE)} option combos, "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 60000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 20260816,
    ))
