"""DOM -> Markdown rendering (training-corpus text shaping).

LLM-data pipelines routinely keep *structure* that plain textContent
(reference DomUtils ``textContent``, README.md:184) throws away —
headings, lists, links, tables — by converting pages to Markdown. The
reference has no such operator; this renderer walks the
DomArrayHandler adjacency list (engine/dom.py) with a small, fixed,
deterministic rule set so the Spark oracle can predict output exactly:

* rendered scope: the first ``<body>`` subtree when present, else the
  whole document; ``head``/``script``/``style``/``title`` subtrees,
  comments, directives/PIs are skipped;
* blocks joined by one blank line: ``h1..h6`` -> ``#``*n, ``p`` ->
  inline text, ``ul``/``ol`` -> ``- `` / ``1. `` items (nested lists
  indent two spaces per level), ``pre`` -> fenced code block,
  ``blockquote`` -> ``> `` per line, ``hr`` -> ``---``, ``table`` ->
  pipe rows with the first row as header, ``textarea`` -> its raw
  text; ``div``-like containers are transparent;
* consecutive inline siblings at block level form an implicit
  paragraph; ``a`` -> ``[text](href)``, ``img`` -> ``![alt](src)``,
  ``strong``/``b`` -> ``**..**``, ``em``/``i`` -> ``*..*``, ``code``
  -> `` `..` ``, ``br`` -> a newline; other inline elements are
  transparent;
* whitespace in inline content collapses to single spaces (``pre``
  keeps raw text); cell ``|`` is escaped; no other Markdown escaping —
  content fidelity over re-parseability, documented trade-off.
"""

from __future__ import annotations

import re
from operator import itemgetter

__all__ = ["to_markdown"]

_SKIP = {"head", "script", "style", "title"}
_BLOCK = {
    "address", "article", "aside", "blockquote", "body", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2",
    "h3", "h4", "h5", "h6", "header", "hr", "html", "li", "main", "nav",
    "ol", "p", "pre", "section", "table", "tbody", "td", "textarea",
    "tfoot", "th", "thead", "tr", "ul",
}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}
_WS = re.compile(r"[ \t\r\n\f]+")
# Fast-path guard: text needing collapse contains a non-space
# whitespace char or a double space. search() early-exits and, when
# clean (the common case for running text), skips the sub's full
# string rebuild — measured 1.5x on single-spaced paragraphs, ~parity
# on messy input.
_WS_NEEDED = re.compile(r"[\t\r\n\f]|  ")
# Placeholder so <br> survives whitespace collapsing. NUL is a valid
# parsed-text character (the tokenizer passes it through), so document
# text is scrubbed of the sentinel before splicing — a literal NUL in
# page text must not become a phantom line break (it is dropped from
# the markdown output instead, the right call for training text).
_BR = "\x00"
_BR_RE = re.compile(f" ?{_BR} ?")


def _collapse(raw: str) -> str:
    out = raw if _WS_NEEDED.search(raw) is None else _WS.sub(" ", raw)
    if _BR in out:
        out = _BR_RE.sub("\n", out)
    return out.strip()


def _edge_space(inner: str, side: int) -> str:
    """The single space an inline wrapper must re-emit outside its
    markers when the wrapped content had leading/trailing whitespace
    ('foo<b> bar </b>baz' -> 'foo **bar** baz', not 'foo**bar**baz')."""
    ch = inner[side] if inner else ""
    return " " if ch in " \t\r\n\f" else ""


def _wrap(inner: str, mark: str) -> str:
    core = _collapse(inner)
    if not core:
        # a whitespace-only wrapper still separates its neighbours
        return " " if inner else ""
    return (
        _edge_space(inner, 0) + mark + core + mark + _edge_space(inner, -1)
    )


class _Renderer:
    def __init__(self, nodes: list[dict]) -> None:
        self.children: dict[int, list[dict]] = {}
        setdefault = self.children.setdefault
        for n in nodes:
            setdefault(n["parent_id"], []).append(n)
        # Parser-built arrays arrive in document order, so each child
        # list is already sorted by idx_in_parent; manipulated arrays
        # (operators/dommanip renumbers idx_in_parent in place) may
        # not be. Timsort on the sorted case is a linear verify, but
        # the per-element key extraction still costs — skip it with an
        # O(n) check, and use itemgetter (C-side) when sorting.
        key = itemgetter("idx_in_parent")
        for kids in self.children.values():
            if len(kids) < 2:
                continue
            seq = [key(k) for k in kids]
            if any(a > b for a, b in zip(seq, seq[1:])):
                kids.sort(key=key)
        self.body = next(
            (n for n in nodes
             if n["type"] == "tag" and n["name"] == "body"),
            None,
        )

    def kids(self, node: dict | None) -> list[dict]:
        return self.children.get(-1 if node is None else node["node_id"], [])

    # ---------------- inline ----------------
    def inline(self, node: dict) -> str:
        t = node["type"]
        if t in ("text", "cdata"):
            return (node["data"] or "").replace(_BR, "")
        if t not in ("tag", "script", "style"):
            return ""  # comments, directives
        name = node["name"]
        if name in _SKIP:
            return ""
        attrs = node["attrs"] or {}
        inner = "".join(self.inline(k) for k in self.kids(node))
        if name == "br":
            return _BR
        if name == "a":
            label = _collapse(inner)
            href = attrs.get("href")
            if not href:
                return inner
            return (
                _edge_space(inner, 0)
                + f"[{label}]({href})"
                + _edge_space(inner, -1)
            )
        if name == "img":
            return f"![{attrs.get('alt', '')}]({attrs.get('src', '')})"
        if name in ("strong", "b"):
            return _wrap(inner, "**")
        if name in ("em", "i"):
            return _wrap(inner, "*")
        if name == "code":
            return _wrap(inner, "`")
        return inner  # transparent inline (span, u, small, ...)

    def _raw_text(self, node: dict) -> str:
        out = []
        for k in self.kids(node):
            if k["type"] in ("text", "cdata"):
                out.append((k["data"] or "").replace(_BR, ""))
            elif k["type"] in ("tag", "script", "style"):
                out.append(self._raw_text(k))
        return "".join(out)

    # ---------------- blocks ----------------
    def blocks(self, parents: list[dict], depth: int = 0) -> list[str]:
        out: list[str] = []
        run: list[str] = []  # pending inline pieces -> implicit paragraph

        def flush() -> None:
            if run:
                text = _collapse("".join(run))
                run.clear()
                if text:
                    out.append(text)

        for node in parents:
            t = node["type"]
            if t in ("comment", "directive"):
                continue
            name = node["name"] if t in ("tag", "script", "style") else None
            if name in _SKIP:
                continue
            if name not in _BLOCK:
                run.append(self.inline(node))
                continue
            flush()
            if name in _HEADINGS:
                text = _collapse(
                    "".join(self.inline(k) for k in self.kids(node))
                )
                out.append(f"{'#' * _HEADINGS[name]} {text}".rstrip())
            elif name in ("ul", "ol"):
                out.append(self._list(node, depth))
            elif name == "table":
                out.append(self._table(node))
            elif name == "pre":
                out.append(f"```\n{self._raw_text(node)}\n```")
            elif name == "blockquote":
                inner = "\n\n".join(self.blocks(self.kids(node), depth))
                out.append(
                    "\n".join(f"> {line}" if line else ">"
                              for line in inner.split("\n"))
                )
            elif name == "hr":
                out.append("---")
            elif name == "textarea":
                text = _collapse(self._raw_text(node))
                if text:
                    out.append(text)
            elif name == "p":
                text = _collapse(
                    "".join(self.inline(k) for k in self.kids(node))
                )
                if text:
                    out.append(text)
            else:  # transparent containers: div/section/tbody/...
                out.extend(self.blocks(self.kids(node), depth))
        flush()
        return [b for b in out if b != ""]

    def _list(self, node: dict, depth: int) -> str:
        ordered = node["name"] == "ol"
        lines: list[str] = []
        items = [
            k for k in self.kids(node)
            if k["type"] == "tag" and k["name"] == "li"
        ]
        for i, li in enumerate(items, start=1):
            marker = f"{i}. " if ordered else "- "
            head: list[str] = []
            tail: list[str] = []
            for k in self.kids(li):
                if k["type"] == "tag" and k["name"] in ("ul", "ol"):
                    # nested lists carry their own depth-based indent
                    tail.append(self._list(k, depth + 1))
                elif k["type"] == "tag" and k["name"] in _BLOCK:
                    tail.extend(
                        "\n".join(
                            "  " * (depth + 1) + line
                            for line in block.split("\n")
                        )
                        for block in self.blocks([k], depth + 1)
                    )
                else:
                    head.append(self.inline(k))
            first = _collapse("".join(head))
            lines.append("  " * depth + marker + first)
            lines.extend(tail)
        return "\n".join(lines)

    def _table(self, node: dict) -> str:
        rows: list[list[str]] = []

        def walk_rows(parent: dict) -> None:
            for k in self.kids(parent):
                if k["type"] != "tag":
                    continue
                if k["name"] == "tr":
                    cells = [
                        _collapse(
                            "".join(self.inline(c) for c in self.kids(cell))
                        ).replace("|", "\\|")
                        for cell in self.kids(k)
                        if cell["type"] == "tag"
                        and cell["name"] in ("td", "th")
                    ]
                    rows.append(cells)
                elif k["name"] in ("thead", "tbody", "tfoot"):
                    walk_rows(k)

        walk_rows(node)
        if not rows:
            return ""
        lines = ["| " + " | ".join(rows[0]) + " |"]
        lines.append("| " + " | ".join("---" for _ in rows[0]) + " |")
        for row in rows[1:]:
            lines.append("| " + " | ".join(row) + " |")
        return "\n".join(lines)


def to_markdown(nodes: list[dict]) -> str:
    """Adjacency node list (DomArrayHandler) -> Markdown string."""
    r = _Renderer(nodes)
    scope = r.kids(r.body) if r.body is not None else r.kids(None)
    return "\n\n".join(r.blocks(scope))
