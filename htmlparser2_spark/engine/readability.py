"""Main-content selection by DOM heuristics (readability-lite).

The north rule's "HTML boilerplate strip … DOM heuristics": score every
element by the text mass of its subtree, penalizing link-dominated
regions (nav/menu/footer boilerplate is mostly anchor text), and return
the best block's normalized text. Deterministic, engine-defined contract
pinned by tests; no ML, no external deps.

Scoring (per element):
  score = own_subtree_text_chars * (1 - link_ratio) - tag_penalty
where link_ratio is the share of subtree text inside <a> descendants
and tag_penalty discounts wrapper elements with many children but
little direct text. Candidates are restricted to block containers.
"""

from __future__ import annotations

from .dom import parse_document

__all__ = ["main_content", "main_content_nodes", "main_content_text"]

_BLOCK_CANDIDATES = frozenset(
    ("div", "article", "main", "section", "td", "li", "body", "p", "pre", "blockquote")
)
_SKIP_SUBTREES = frozenset(("script", "style"))


def _subtree_stats(nodes: list[dict]) -> tuple[dict[int, int], dict[int, int]]:
    """Per-node (text_chars, link_text_chars) including descendants.

    One reverse pass: children precede parents never (DFS order means
    parents come first), so accumulate bottom-up by iterating reversed.
    """
    text_chars: dict[int, int] = {n["node_id"]: 0 for n in nodes}
    link_chars: dict[int, int] = {n["node_id"]: 0 for n in nodes}
    in_link: dict[int, bool] = {}
    in_skip: dict[int, bool] = {}
    for n in nodes:
        pid = n["parent_id"]
        in_link[n["node_id"]] = (n["name"] == "a") or in_link.get(pid, False)
        in_skip[n["node_id"]] = (n["type"] in ("script", "style")) or in_skip.get(
            pid, False
        )
    for n in reversed(nodes):
        nid = n["node_id"]
        if n["type"] == "text" and not in_skip.get(n["parent_id"], False):
            stripped = len("".join(n["data"].split()))
            text_chars[nid] = text_chars.get(nid, 0) + stripped
            if in_link.get(n["parent_id"], False):
                link_chars[nid] = link_chars.get(nid, 0) + stripped
        pid = n["parent_id"]
        if pid >= 0:
            text_chars[pid] += text_chars.get(nid, 0)
            link_chars[pid] += link_chars.get(nid, 0)
    return text_chars, link_chars


def main_content_nodes(nodes: list[dict]) -> int | None:
    """node_id of the best main-content candidate (None if no text)."""
    text_chars, link_chars = _subtree_stats(nodes)
    children_count: dict[int, int] = {}
    for n in nodes:
        children_count[n["parent_id"]] = children_count.get(n["parent_id"], 0) + 1
    best_id = None
    best_score = 0.0
    for n in nodes:
        if n["type"] != "tag" or n["name"] not in _BLOCK_CANDIDATES:
            continue
        nid = n["node_id"]
        total = text_chars.get(nid, 0)
        if total == 0:
            continue
        link_ratio = link_chars.get(nid, 0) / total
        score = total * (1.0 - link_ratio) - 2.0 * children_count.get(nid, 0)
        # Prefer the DEEPEST node among equal scores: a wrapper whose text
        # is entirely one child's scores the same minus child penalty, so
        # strict '>' keeps the first (outermost); use '>' on score and
        # tie-break toward higher node_id for tighter blocks.
        if score > best_score or (score == best_score and best_id is not None and nid > best_id):
            best_score = score
            best_id = nid
    return best_id


def main_content_text(nodes: list[dict]) -> str:
    """Main-content text from an already-parsed node list: normalized
    text inside the winning subtree (script/style skipped, like
    clean_text). Node-list entry point so batch UDFs can reuse one
    parser across rows."""
    best = main_content_nodes(nodes)
    if best is None:
        return ""
    inside = {best}
    skip: set[int] = set()
    out: list[str] = []
    for n in nodes:
        nid = n["node_id"]
        pid = n["parent_id"]
        if pid not in inside and nid != best:
            continue
        if nid != best:
            inside.add(nid)
        if n["type"] in ("script", "style") or pid in skip:
            skip.add(nid)
            continue
        if n["type"] == "text":
            piece = " ".join(n["data"].split())
            if piece:
                out.append(piece)
    return " ".join(out)


def main_content(html: str) -> str:
    """Extract the main content text of an HTML document."""
    return main_content_text(parse_document(html))
