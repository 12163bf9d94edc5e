"""Sitemap XML extraction over adjacency-array DOMs.

The sitemaps.org protocol counterpart to :mod:`feed` (the reference's
feed handler covers RSS/Atom/RDF; sitemaps are the crawl-discovery
sibling a web-corpus pipeline actually ingests at scale):

* ``<urlset>`` documents -> one entry per ``<url>`` child: ``loc``
  (required — entries without one are dropped), ``lastmod`` (ISO
  8601 / RFC 2822 via :func:`feed.parse_date`), ``changefreq``,
  ``priority`` (float).
* ``<sitemapindex>`` documents -> one entry per ``<sitemap>`` child
  (``loc`` + ``lastmod``), ``kind='index'``.

Parsed in xmlMode exactly like :func:`feed.parse_feed`; field text is
the trimmed textContent of the first matching child.
"""

from __future__ import annotations

from .feed import _children_map, _fetch, _one, parse_date

__all__ = ["get_sitemap", "parse_sitemap"]


def _entries(kids, container, child_name: str, with_details: bool):
    out = []
    for el in kids.get(container["node_id"], []):
        if el["type"] not in ("tag", "script", "style"):
            continue
        if el["name"] != child_name:
            continue
        loc = _fetch(kids, kids.get(el["node_id"], []), "loc")
        if not loc:
            continue
        entry = {
            "loc": loc,
            "lastmod": parse_date(
                _fetch(kids, kids.get(el["node_id"], []), "lastmod")
            ),
            "changefreq": None,
            "priority": None,
        }
        if with_details:
            entry["changefreq"] = (
                _fetch(kids, kids.get(el["node_id"], []), "changefreq")
                or None
            )
            prio = _fetch(kids, kids.get(el["node_id"], []), "priority")
            try:
                entry["priority"] = float(prio) if prio else None
            except ValueError:
                entry["priority"] = None
        out.append(entry)
    return out


def get_sitemap(nodes: list[dict]) -> dict | None:
    """Sitemap record from an adjacency node list, or None when the
    document has no urlset/sitemapindex root."""
    kids = _children_map(nodes)
    roots = kids.get(-1, [])
    container = _one(kids, roots, "urlset", recurse=True)
    if container is not None:
        return {
            "kind": "urlset",
            "entries": _entries(kids, container, "url", True),
        }
    container = _one(kids, roots, "sitemapindex", recurse=True)
    if container is not None:
        return {
            "kind": "index",
            "entries": _entries(kids, container, "sitemap", False),
        }
    return None


def parse_sitemap(xml: str) -> dict | None:
    """Parse a sitemap document string (xmlMode) into a record."""
    from .dom import parse_document

    return get_sitemap(parse_document(xml, xml_mode=True))
