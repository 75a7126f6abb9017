"""Outlink extraction — the web link graph feeding S7b PageRank.

A KG-construction crawl pipeline materializes two graphs: the entity graph
(triples, canonicalized by connected components) and the hyperlink graph
(page → page), whose PageRank is the standard curation/salience prior
(the Common Crawl project publishes exactly this host- and domain-level
ranking).  The reference has no crawl layer at all — this belongs to the
web-scale re-targeting (BASELINE.json north_star), not to TabbyLD parity.

Everything here is whole-stage-codegen column expressions — binary→string
cast + `regexp_extract_all` + `explode` — NOT part of the one Arrow UDF:
link extraction needs no block structure, so it must not pay the Python
round-trip.  Malformed UTF-8 in crawl HTML reads as replacement characters
(the cast is lenient; strict `decode` would fail the task on the first bad
byte), so href scanning is unaffected outside the corrupted spans
(pytest-pinned with garbage-byte probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.operators.webfilter import url_host

# href value of an <a> tag, double- or single-quoted.  Java regex (codegen);
# group 1 = double-quoted value, group 2 = single-quoted.
_HREF_DQ = r'<[aA]\s[^>]*href\s*=\s*"([^"]*)"'
_HREF_SQ = r"<[aA]\s[^>]*href\s*=\s*'([^']*)'"


def extract_outlinks(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html:binary, ...) → (src_url, dst_url), one row per
    absolute http(s) outlink, de-duplicated per page.  Fragment-only and
    relative links are dropped (host-graph consumers resolve nothing);
    self-links survive — PageRank treats them as ordinary edges.
    """
    # NOT decode(html, 'UTF-8'): Spark 4 raises MALFORMED_CHARACTER_CODING on
    # the first invalid byte sequence — guaranteed in crawl HTML.  The binary→
    # string cast wraps the bytes leniently (replacement-character semantics
    # at read time), never fails a task.
    html_s = F.col(html_col).cast("string")
    hrefs = F.array_union(
        F.regexp_extract_all(html_s, F.lit(_HREF_DQ), 1),
        F.regexp_extract_all(html_s, F.lit(_HREF_SQ), 1),
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"),
            F.explode(F.array_distinct(hrefs)).alias("dst_url"),
        )
        .filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    )


def host_edges(outlinks: DataFrame) -> DataFrame:
    """(src_url, dst_url) page-grain links → distinct (src, dst) host-grain
    edges (the Common-Crawl-style host graph), self-loops dropped, rows with
    an unparseable side dropped.  One hash-distinct shuffle at host grain —
    cardinality is hosts², not pages², so this is the cheap graph to rank
    first at 10^12-page scale."""
    src = url_host(F.col("src_url"))
    dst = url_host(F.col("dst_url"))
    return (
        outlinks.select(src.alias("src"), dst.alias("dst"))
        .filter((F.col("src") != "") & (F.col("dst") != "") & (F.col("src") != F.col("dst")))
        .distinct()
    )
