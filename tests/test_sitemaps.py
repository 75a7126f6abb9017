"""Sitemap parsing + crawl-frontier derivation (extract/sitemaps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabbyld_spark.extract.sitemaps import crawl_frontier, parse_sitemaps


URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.com/p/1</loc>
    <lastmod>2024-02-01</lastmod>
  </url>
  <url><loc> https://a.com/p/2 </loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap>
    <loc>https://a.com/sitemap-2.xml</loc>
    <lastmod>2024-03-05T10:00:00+00:00</lastmod>
  </sitemap>
</sitemapindex>"""


def _sm(spark, rows):
    return spark.createDataFrame(rows, "url string, body binary")


def test_parse_urlset_and_index(spark):
    got = parse_sitemaps(
        _sm(spark, [("https://a.com/sitemap.xml", URLSET),
                    ("https://a.com/sitemap_index.xml", INDEX)])
    ).collect()
    by_loc = {r["loc"]: r for r in got}
    # entry without <loc> dropped
    assert set(by_loc) == {
        "https://a.com/p/1", "https://a.com/p/2", "https://a.com/sitemap-2.xml"
    }
    assert str(by_loc["https://a.com/p/1"]["lastmod"]).startswith("2024-02-01")
    assert by_loc["https://a.com/p/2"]["lastmod"] is None
    assert by_loc["https://a.com/sitemap-2.xml"]["kind"] == "sitemap"
    assert by_loc["https://a.com/p/1"]["kind"] == "url"


def test_parse_survives_garbage_bytes(spark):
    body = bytes([0xFF, 0x80]) + b"<url><loc>https://g.com/x</loc></url>"
    got = parse_sitemaps(_sm(spark, [("s", body)])).collect()
    assert [r["loc"] for r in got] == ["https://g.com/x"]


def test_crawl_frontier_new_stale_and_conservative(spark):
    entries = parse_sitemaps(
        _sm(
            spark,
            [(
                "https://a.com/sitemap.xml",
                b"<urlset>"
                b"<url><loc>https://a.com/new</loc></url>"
                b"<url><loc>https://a.com/stale</loc>"
                b"<lastmod>2024-06-01</lastmod></url>"
                b"<url><loc>https://a.com/fresh</loc>"
                b"<lastmod>2024-01-01</lastmod></url>"
                b"<url><loc>https://a.com/nolastmod</loc></url>"
                b"</urlset>",
            )],
        )
    )
    pages = spark.createDataFrame(
        [
            ("https://a.com/stale", "2024-05-01 00:00:00"),
            ("https://a.com/fresh", "2024-05-01 00:00:00"),
            ("https://a.com/nolastmod", "2024-05-01 00:00:00"),
        ],
        "url string, warc_ts string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = {r["url"]: r["reason"] for r in crawl_frontier(entries, pages).collect()}
    # never-captured → new; lastmod past capture → stale; captured with older
    # or missing lastmod → not refetched
    assert got == {"https://a.com/new": "new", "https://a.com/stale": "stale"}
