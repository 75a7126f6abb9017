"""URL/domain filtering: suffix-blocking semantics, allow mode, a DuckDB
twin for the host+suffix derivation, and plan hygiene (blocklist broadcast,
no text column in any exchange)."""

from __future__ import annotations

import duckdb

from tabbyld_spark.operators.webfilter import host_suffixes, url_filter, url_host

URLS = [
    (0, "https://fixture.example.org/page/0"),
    (1, "https://sub.a.spam.example.com/x?q=1"),
    (2, "http://spam.example.com/y"),
    (3, "https://example.com/z"),
    (4, "https://notspam.example.net/ok"),
    (5, "https://SPAM.example.COM/upper"),
    (6, "not a url at all"),
]


def _pages(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_block_suffix_semantics(spark):
    bl = spark.createDataFrame([("spam.example.com",)], ["domain"])
    kept = sorted(r["doc_id"] for r in url_filter(_pages(spark), bl).collect())
    # 1, 2, 5 blocked (exact + subdomain + case); 3 survives (parent domain
    # is NOT blocked by a child entry); 6 survives (unparseable host '')
    assert kept == [0, 3, 4, 6]


def test_allow_mode(spark):
    al = spark.createDataFrame([("example.org",)], ["domain"])
    kept = sorted(
        r["doc_id"] for r in url_filter(_pages(spark), al, mode="allow").collect()
    )
    assert kept == [0]


def test_host_and_suffixes_match_duckdb(spark):
    got = sorted(
        (r["doc_id"], r["host"], tuple(r["sfx"]))
        for r in _pages(spark)
        .select("doc_id", url_host("url").alias("host"))
        .withColumn("sfx", host_suffixes("host"))
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", URLS)
    want = sorted(
        (r[0], r[1], tuple(r[2]))
        for r in con.execute(
            r"""
        WITH h AS (
            SELECT doc_id,
                   coalesce(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]+)', 1)), '') AS host
            FROM pages
        )
        SELECT doc_id, host,
               list_transform(range(1, len(string_split(host, '.')) + 1),
                   i -> array_to_string(string_split(host, '.')[i:], '.')) AS sfx
        FROM h
        """
        ).fetchall()
    )
    assert got == want


def test_plan_broadcasts_blocklist(spark):
    bl = spark.createDataFrame([("spam.example.com",)], ["domain"])
    p = url_filter(_pages(spark), bl)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "EvalPython" not in p and "MapInPandas" not in p


def test_robots_noindex_directive_paths(spark):
    from tabbyld_spark.operators.webfilter import drop_noindex

    rows = [
        ("keep-plain", b"<html><head></head><body>x</body></html>"),
        ("drop-noindex", b'<meta name="robots" content="noindex, follow">'),
        ("drop-none", b"<meta name='robots' content='none'>"),
        ("drop-rev-attrs", b'<meta content="NOINDEX" name="robots">'),
        ("keep-nofollow-only", b'<meta name="robots" content="nofollow">'),
        ("keep-other-meta", b'<meta name="description" content="noindex here">'),
        # substring must not match inside another token
        ("keep-token-bound", b'<meta name="robots" content="nonoindexy">'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    kept = {r["url"] for r in drop_noindex(pages).collect()}
    assert kept == {"keep-plain", "keep-nofollow-only", "keep-other-meta",
                    "keep-token-bound"}
