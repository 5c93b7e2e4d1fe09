"""Web-corpus operators: the link graph and crawl-snapshot maintenance.

These are the two webtext jobs that sit UPSTREAM of KG extraction in a
Common-Crawl-style pipeline (reference scope: nlquery matches text it
is given — `/root/reference/README.md:5-11`; fetching/organizing that
text is this engine's added scale surface):

- :func:`host_link_graph` — the host-to-host hyperlink graph, the
  substrate for site-level PageRank / spam scoring / crawl
  prioritization.
- :func:`crawl_diff` — two crawl snapshots keyed by canonical URL
  diffed into added/removed/changed/unchanged, the incremental-crawl
  bookkeeping step that decides what to re-extract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.web import extract_links, url_host


def host_link_graph(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """(src_host, dst_host, n_links) from raw page HTML: extract every
    ``<a href>`` target, key source and target by lowercased
    default-port-elided host, and count links per directed host pair.

    Scale posture: link extraction + host mapping is a narrow per-row
    projection (one regexp_extract_all, explode, two regexp extracts)
    that rides the page scan — no Python stage, no join; the only
    shuffle is the final (src_host, dst_host) hash aggregation, which
    map-side combines to at most |hosts|^2 rows per task regardless of
    page count. Self-links (intra-site navigation) are kept — dropping
    them is the PageRank caller's choice, not the graph builder's.
    """
    return (
        pages.select(
            url_host(F.col(url_col)).alias("src_host"),
            F.explode(extract_links(F.col(html_col))).alias("link"),
        )
        .select("src_host", url_host(F.col("link")).alias("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "canonical_url",
    digest_col: str = "digest",
) -> DataFrame:
    """Diff two crawl snapshots keyed by canonical URL: ``added``
    (key only in new), ``removed`` (only in old), ``changed`` (both,
    digest differs), ``unchanged``. Digests are coalesced to '' so the
    output carries no nullable strings (nullable strings break
    multiset-sorting comparators downstream — repo convention from the
    full-outer-join queries).

    Callers must pass snapshots already unique per key (one row per
    canonical URL — the latest-per-key upsert operator is the
    de-duplicating step); the full outer join then stays 1:1.

    Scale posture: ONE full outer sort-merge join on the canonical-URL
    key — both sides hash-partition on the same key, no broadcast of
    unbounded snapshots, and with both snapshots bucketed by key on
    disk the shuffle amortizes away across daily runs. The status
    column is a narrow post-join projection.
    """
    o = old.select(
        F.col(key_col).alias("k"), F.col(digest_col).alias("old_digest")
    )
    n = new.select(
        F.col(key_col).alias("k"), F.col(digest_col).alias("new_digest")
    )
    joined = o.join(n, "k", "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        F.col("k").alias(key_col),
        status.alias("status"),
        F.coalesce("old_digest", F.lit("")).alias("old_digest"),
        F.coalesce("new_digest", F.lit("")).alias("new_digest"),
    )
