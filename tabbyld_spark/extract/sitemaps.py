"""Sitemap parsing and crawl-frontier derivation.

Sitemaps are the publisher-declared crawl frontier: ``urlset`` files list
page URLs with optional ``lastmod`` stamps, ``sitemapindex`` files list
more sitemaps.  A recrawl pipeline joins them against what it already
holds (the pages table's ``warc_ts``) to decide what to fetch — the
counterpart of `operators.urls.crawl_diff`, which diffs what *was*
fetched.

Same extraction discipline as `extract/links.py`: lenient binary→string
cast, block-grain ``regexp_extract_all``, per-element field extraction
inside one ``transform`` whose lambda touches only its own element (the
HOF re-evaluation trap documented repo-wide).  XML namespaces are
irrelevant to the regex shape; CDATA is not handled (sitemap ``loc``
values are plain text in practice and the spec requires entity-escaping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_sitemaps", "crawl_frontier"]

# one <url>…</url> or <sitemap>…</sitemap> block, dot-matches-newline
_URL_BLOCK = r"(?s)<url>.*?</url>"
_SMAP_BLOCK = r"(?s)<sitemap>.*?</sitemap>"


def _entries(html_s, block_re: str, kind: str):
    blocks = F.regexp_extract_all(html_s, F.lit(block_re), 0)
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(F.regexp_extract(b, r"(?s)<loc>\s*([^<]*?)\s*</loc>", 1)).alias(
                "loc"
            ),
            F.trim(
                F.regexp_extract(b, r"(?s)<lastmod>\s*([^<]*?)\s*</lastmod>", 1)
            ).alias("lastmod_raw"),
            F.lit(kind).alias("kind"),
        ),
    )


def parse_sitemaps(
    sitemaps: DataFrame, url_col: str = "url", xml_col: str = "body"
) -> DataFrame:
    """(url, body) → (sitemap_url, loc, lastmod, kind): one row per
    ``urlset`` page entry (kind 'url') or nested ``sitemapindex`` entry
    (kind 'sitemap').  ``lastmod`` is parsed from the W3C datetime subset
    sitemaps use (date-only or full timestamp; unparseable/absent → NULL,
    never a task failure)."""
    html_s = F.col(xml_col).cast("string")
    both = F.concat(
        _entries(html_s, _URL_BLOCK, "url"),
        _entries(html_s, _SMAP_BLOCK, "sitemap"),
    )
    out = (
        sitemaps.select(
            F.col(url_col).alias("sitemap_url"), F.explode(both).alias("e")
        )
        .select(
            "sitemap_url",
            F.col("e.loc").alias("loc"),
            F.col("e.lastmod_raw").alias("_lm"),
            F.col("e.kind").alias("kind"),
        )
        .filter(F.col("loc") != "")
    )
    lastmod = F.coalesce(
        F.try_to_timestamp(F.col("_lm")),
        F.try_to_timestamp(F.col("_lm"), F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(F.col("_lm"), F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    )
    return out.select("sitemap_url", "loc", lastmod.alias("lastmod"), "kind")


def crawl_frontier(
    entries: DataFrame,
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Declared-frontier diff: one row per sitemap page URL we should fetch,
    with ``reason`` ∈ {new, stale} — ``new`` = never captured, ``stale`` =
    publisher's ``lastmod`` is newer than our latest capture.  URLs with no
    ``lastmod`` and an existing capture are NOT refetched (no evidence of
    change — the conservative frontier).

    One co-partitioned join on the URL against the capture-timestamp
    summary (an aggregate of the pages table at URL grain, tiny next to
    page bodies)."""
    locs = (
        entries.filter(F.col("kind") == "url")
        .groupBy(F.col("loc").alias(url_col))
        .agg(F.max("lastmod").alias("lastmod"))
    )
    captured = pages.groupBy(url_col).agg(F.max(ts_col).alias("_captured"))
    j = locs.join(captured, url_col, "left")
    reason = (
        F.when(F.col("_captured").isNull(), F.lit("new"))
        .when(
            F.col("lastmod").isNotNull() & (F.col("lastmod") > F.col("_captured")),
            F.lit("stale"),
        )
    )
    return (
        j.select(url_col, "lastmod", F.col("_captured").alias("captured_ts"),
                 reason.alias("reason"))
        .filter(F.col("reason").isNotNull())
    )
