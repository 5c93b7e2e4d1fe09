"""URL canonicalization — the crawl-dedup primitive.

A web-scale corpus keyed by raw URL over-counts wildly: the same page
arrives as ``HTTP://WWW.Example.COM:80/a/?utm_source=feed&b=2&a=1#top``
and ``http://www.example.com/a?a=1&b=2``. Canonicalizing BEFORE the
url-level dedup/latest-per-key steps is how crawl pipelines collapse
these (cf. the standard rules in RFC 3986 §6: case normalization of
scheme/host, default-port elision) plus the de-facto tracking-param
strip every production crawler applies.

Everything here is pure JVM column expressions — regexp extracts, one
array HOF chain on a flat column (no explode, so no optimizer-clone /
Janino risk), zero shuffle, whole-stage codegen, and fully portable to
the DuckDB oracle (same regexps under RE2 semantics: no lookahead, no
backreferences).

Rules applied by :func:`normalize_url`:
- scheme and host lowercased
- default port elided (``:80`` for http, ``:443`` for https)
- fragment dropped
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``)
- remaining query params sorted bytewise (param ORDER is almost never
  semantic; sorting makes equal param-sets equal strings)
- trailing slashes stripped from non-root paths; empty path -> ``/``
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
# the leading [^#?]* pins the match to the FIRST '?' and only when it
# precedes any '#' — a bare '\?([^#]*)' would match a '?' inside the
# fragment (SPA-style '#/route?x=1') and leak fragment content into
# the canonical URL
_QUERY_RE = r"^[^#?]*\?([^#]*)"
_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid)(=|$)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme, '' when the value is not an absolute URL."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased authority with default ports elided — the grouping
    key for host-level corpus stats (pages per site, site quality)."""
    scheme = url_scheme(url)
    auth = F.lower(F.regexp_extract(url, _AUTH_RE, 1))
    return (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (rules in the module
    docstring). Non-matching values pass through the component
    extracts as empty strings — callers should pre-filter to absolute
    URLs (crawl frontiers always are)."""
    scheme = url_scheme(url)
    host = url_host(url)
    raw_path = F.regexp_extract(url, _PATH_RE, 1)
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(kept, "&")
    suffix = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, path, suffix)


_HREF_RE = r'<a href="([^"]*)"'


def extract_links(html: Column) -> Column:
    """All ``<a href="...">`` target URLs in an HTML page, in document
    order — the crawl-frontier / link-graph primitive. One JVM
    ``regexp_extract_all`` (group 1); identical under DuckDB's RE2.
    Double-quoted hrefs only — the normalized form crawl-stored HTML
    uses; a permissive parser belongs in operators/html.py's Arrow
    stage, not in a hot-path regex."""
    return F.regexp_extract_all(html, F.lit(_HREF_RE), 1)


_ANCHOR_RE = r'<a href="[^"]*">[^<]*</a>'


def extract_anchors(html: Column) -> Column:
    """All full ``<a href="...">text</a>`` tags in document order —
    feed for anchor-text aggregation (href + text are then pulled from
    each tag with scalar regexp_extract, which both engines can do;
    neither engine's regexp_extract_all returns two capture groups in
    one pass)."""
    return F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 0)
