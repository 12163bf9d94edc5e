"""Golden tests: raw tokenizer callback logs vs the reference snapshots.

Ported from /root/reference/src/Tokenizer.spec.ts (+ .snap). The log
records every positional callback with its JS-side name so the streams
compare exactly (including entity code points and quote-type enums).
"""

from __future__ import annotations

import json
import pathlib

import pytest

from htmlparser2_spark.engine.tokenizer import Tokenizer

GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "goldens" / "tokenizer.json").read_text()
)

_OPTION_MAP = {
    "xmlMode": "xml_mode",
    "decodeEntities": "decode_entities",
    "recognizeSelfClosing": "recognize_self_closing",
}


class RawLog:
    """Records raw tokenizer callbacks under their reference names."""

    def __init__(self) -> None:
        self.log: list[list] = []

    def is_in_foreign_context(self) -> bool:
        return False

    def on_text(self, s, e):
        self.log.append(["ontext", s, e])

    def on_text_entity(self, cp, e):
        self.log.append(["ontextentity", cp, e])

    def on_open_tag_name(self, s, e):
        self.log.append(["onopentagname", s, e])

    def on_open_tag_end(self, e):
        self.log.append(["onopentagend", e])

    def on_self_closing_tag(self, e):
        self.log.append(["onselfclosingtag", e])

    def on_close_tag(self, s, e):
        self.log.append(["onclosetag", s, e])

    def on_attrib_name(self, s, e):
        self.log.append(["onattribname", s, e])

    def on_attrib_data(self, s, e):
        self.log.append(["onattribdata", s, e])

    def on_attrib_entity(self, cp):
        self.log.append(["onattribentity", cp])

    def on_attrib_end(self, quote, e):
        self.log.append(["onattribend", quote, e])

    def on_comment(self, s, e, offset):
        self.log.append(["oncomment", s, e, offset])

    def on_cdata(self, s, e, offset):
        self.log.append(["oncdata", s, e, offset])

    def on_declaration(self, s, e):
        self.log.append(["ondeclaration", s, e])

    def on_processing_instruction(self, s, e):
        self.log.append(["onprocessinginstruction", s, e])

    def on_end(self):
        self.log.append(["onend"])


@pytest.mark.parametrize("case", GOLDENS, ids=[c["name"] for c in GOLDENS])
def test_tokenizer_golden(case):
    log = RawLog()
    opts = {_OPTION_MAP[k]: v for k, v in case["options"].items()}
    Tokenizer(log, **opts).run(case["input"])
    assert log.log == case["events"]
