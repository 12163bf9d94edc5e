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
           "canonicalize_url"]

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
    path = url_path(u)
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query = url_query(u)
    sorted_query = F.array_join(F.array_sort(F.split(query, "&")), "&")
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), sorted_query)
    )
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part)
