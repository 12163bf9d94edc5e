"""URL column functions for crawl pipelines — pure Catalyst expressions.

Deduplication and host-level budgeting at crawl scale start from a
canonical URL: the same resource fetched as
``HTTPS://Host.Example:443/a?b=2&a=1#frag`` and
``https://host.example/a?a=1&b=2`` must key identically. Everything here
is JVM-side (regexp/array built-ins — no UDFs, codegen-friendly,
pushdown-safe), usable in selects, joins, and groupBys at 100 TB.

Canonicalization contract (deterministic, order-free):

* scheme and host lowercased
* fragment dropped
* default ports stripped (``:80`` for http, ``:443`` for https)
* query parameters sorted bytewise; empty query dropped
* path preserved verbatim (no dot-segment resolution — that requires
  base-URL context); empty path becomes ``/``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_scheme", "url_host", "url_port", "url_path", "url_query",
           "canonicalize_url", "resolve_url", "surt_key"]

_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"


def _col(url: Column | str) -> Column:
    return F.col(url) if isinstance(url, str) else url


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_col(url), r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))


def url_host(url: Column | str) -> Column:
    """Lowercased host without port or userinfo. IPv6 literals keep
    their brackets (``[2001:db8::1]``) — the bracket alternative wins
    before the stop-at-colon rule mangles them."""
    auth = F.regexp_extract(_col(url), _AUTHORITY, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.lower(F.regexp_extract(no_user, r"^(\[[^\]]*\]|[^:]*)", 1))


def url_port(url: Column | str) -> Column:
    """Explicit port as a string; '' when absent. The digits-only,
    end-anchored match never fires inside an IPv6 bracket literal."""
    auth = F.regexp_extract(_col(url), _AUTHORITY, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    return F.regexp_extract(no_user, r":(\d+)$", 1)


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(_col(url), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)


def url_query(url: Column | str) -> Column:
    """Query string without the '?'; '' when absent. The fragment is
    stripped *first* — an unanchored ``\\?`` would otherwise match a
    '?' inside the fragment and resurrect fragment content as query."""
    defragged = F.substring_index(_col(url), "#", 1)
    return F.regexp_extract(defragged, r"\?(.*)$", 1)


def _path_part(path: Column) -> Column:
    """Empty path -> '/'; shared by canonicalize_url and surt_key so
    the two conventions can never drift on this rule."""
    return F.when(path == "", F.lit("/")).otherwise(path)


def _query_part(query: Column) -> Column:
    """Bytewise-sorted '?...' suffix; empty query dropped — the other
    shared assembly rule."""
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )


def canonicalize_url(url: Column | str) -> Column:
    u = _col(url)
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    return F.concat(
        scheme, F.lit("://"), host, port_part,
        _path_part(url_path(u)), _query_part(url_query(u)),
    )


def surt_key(url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the CDX
    ``urlkey`` convention of web archives (OpenWayback/pywb):
    ``https://www.Example.com/A/b?b=2&a=1`` →
    ``com,example)/a/b?a=1&b=2``. Host labels reversed and
    comma-joined so one prefix range covers a whole domain tree;
    everything lowercased; the leading ``www.`` label, ports,
    userinfo, and fragments dropped; query parameters sorted bytewise
    (empty query dropped, empty path becomes ``/``). Pure Catalyst —
    usable as a sort/bucket/range-partition key at any scale."""
    u = _col(url)
    host = F.regexp_replace(url_host(u), r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev_host, F.lit(")"),
        _path_part(F.lower(url_path(u))),
        _query_part(F.lower(url_query(u))),
    )


# Dot-segment nesting bound for resolve_url: each regexp pass resolves
# one level of '..' nesting everywhere in the path, so K passes handle
# paths up to K levels of '/a/b/../..' chains — far beyond anything a
# real crawl emits. The passes are pure Catalyst regexp_replace (no
# loop at execution time; the plan just contains K nested Projects).
_DOT_PASSES = 8


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path ('' treated as '/')."""
    # '/./' collapses in one global pass (zero-width lookahead keeps the
    # following '/' as the next match's anchor); a trailing '/.' keeps
    # the directory slash.
    p = F.regexp_replace(path, r"/\.(?=/)", "")
    p = F.regexp_replace(p, r"/\.$", "/")
    for _ in range(_DOT_PASSES):
        # '/seg/../' -> '/' where seg is itself neither '.' nor '..'
        # (a '..' consumed as seg would resolve the wrong level).
        p = F.regexp_replace(p, r"/(?!\.\.(?:/|$))[^/]+/\.\./", "/")
        p = F.regexp_replace(p, r"/(?!\.\.$)[^/]+/\.\.$", "/")
        # '..' above the root is a no-op (RFC: skip it).
        p = F.regexp_replace(p, r"^/\.\./", "/")
        p = F.regexp_replace(p, r"^/\.\.$", "/")
    return F.when(p == "", F.lit("/")).otherwise(p)


def resolve_url(base: Column | str, href: Column | str) -> Column:
    """Resolve ``href`` against ``base`` (RFC 3986 §5.2 for the
    http(s) URLs a crawl handles), entirely in Catalyst — the outlink
    normalization step between link extraction (q_links) and frontier
    admission (plans/crawl_job.py).

    Contract (differential-tested against urllib.parse.urljoin, whose
    quirks we match deliberately — a frontier mixing Python-side and
    Spark-side resolution must not disagree with itself):

    * fragments are dropped from the result (crawl convention — the
      frontier never distinguishes fragments)
    * absolute hrefs (with scheme) pass through untouched, including
      non-fetchable schemes (``mailto:``, ``javascript:``) — admission
      filtering is the frontier's job
    * scheme-relative hrefs (``//host/p/../q``) take the base scheme
      with the href's authority+path verbatim — like urljoin, which
      skips dot-segment removal when the reference has its own
      authority
    * root-relative (``/a/../b``), query-only (``?q``), empty, and
      relative hrefs merge per the RFC, with dot-segment removal
      bounded at ``_DOT_PASSES`` nesting levels
    * base must be absolute http(s); no authority-less bases

    Dot-segment removal is applied exactly once, on a pre-merged path
    column shared by the two branches that need it — keeping the
    expression tree inside the 64 KB whole-stage-codegen method limit
    (one chain of regexp_replace per row, not one per branch).
    """
    b = _col(base)
    h = F.trim(_col(href))
    h = F.substring_index(h, "#", 1)
    b_nofrag = F.substring_index(b, "#", 1)
    scheme = url_scheme(b)
    # Same-scheme references without an authority (href="https:x",
    # "https:?q", "https:/abs") resolve RELATIVELY: urljoin strips a
    # scheme equal to the base scheme (case-insensitive) and resolves
    # the remainder — passing them through verbatim would emit a
    # non-fetchable "https:x" and key the same outlink two ways in a
    # mixed Python/Spark frontier. With an authority ("https://other")
    # the verbatim pass-through below already matches urljoin.
    h_scheme = F.regexp_extract(h, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    same_scheme_rel = (F.lower(h_scheme) == F.lower(scheme)) & ~h.rlike(
        r"^[A-Za-z][A-Za-z0-9+.\-]*://"
    )
    h = F.when(
        same_scheme_rel,
        F.regexp_replace(h, r"^[A-Za-z][A-Za-z0-9+.\-]*:", ""),
    ).otherwise(h)
    origin = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    b_path = url_path(b)
    b_dir = F.when(b_path == "", F.lit("/")).otherwise(
        F.regexp_replace(b_path, r"[^/]*$", "")
    )
    h_path = F.substring_index(h, "?", 1)
    h_query = F.regexp_extract(h, r"(\?.*)$", 1)
    # The only two branches that normalize share one merged-path column,
    # so _remove_dot_segments appears once in the plan.  (The "//" case
    # never reaches these branches — its earlier `when` wins.)
    merged = F.when(h.startswith("/"), h_path).otherwise(
        F.concat(b_dir, h_path)
    )
    norm_path = _remove_dot_segments(merged)
    return (
        F.when(h == "", b_nofrag)
        .when(h.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("?"), F.concat(origin, b_path, h))
        .otherwise(F.concat(origin, norm_path, h_query))
    )
