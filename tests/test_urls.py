"""URL canonicalization + alias dedup: canonical-form semantics, a DuckDB
twin (independent regex formulation), winner determinism under re-sharding,
and plan hygiene (canonical_url zero-shuffle; dedup exactly one exchange)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tabbyld_spark.operators.urls import canonical_url, url_dedup, with_canonical_url

URLS = [
    (0, "HTTPS://WWW.Example.COM:443/Path/page?utm_source=x&b=2&a=1&fbclid=z#frag"),
    (1, "http://example.com:80/a?b=1"),
    (2, "https://example.com"),
    (3, "https://example.com/"),
    (4, "http://sub.example.com:8080/x/?a=1&a=0"),
    (5, "not a url at all"),
    (6, "https://example.com/p?"),
    (7, "https://example.com/p?utm_campaign=only"),
    (8, "https://example.com/a?z=1&y=2&UTM_SOURCE=case"),
]


def _pages(spark):
    return spark.createDataFrame(URLS, "doc_id long, url string")


def test_canonical_form(spark):
    got = {
        r["doc_id"]: r["c"]
        for r in _pages(spark).select("doc_id", canonical_url("url").alias("c")).collect()
    }
    assert got == {
        0: "https://www.example.com/Path/page?a=1&b=2",  # case, :443, utm, sort, #frag
        1: "http://example.com/a?b=1",                   # :80 dropped
        2: "https://example.com/",                       # empty path -> '/'
        3: "https://example.com/",                       # 2 and 3 now alias
        4: "http://sub.example.com:8080/x/?a=0&a=1",     # non-default port kept
        5: None,                                         # junk -> NULL
        6: "https://example.com/p",                      # empty query drops '?'
        7: "https://example.com/p",                      # fully-tracking query drops '?'
        8: "https://example.com/a?y=2&z=1",              # tracking match is case-insensitive
    }


def test_strip_www_option(spark):
    got = (
        _pages(spark)
        .filter(F.col("doc_id") == 0)
        .select(canonical_url("url", strip_www=True).alias("c"))
        .collect()[0]["c"]
    )
    assert got == "https://example.com/Path/page?a=1&b=2"


def test_canonical_matches_duckdb_twin(spark):
    """Independent DuckDB formulation: regex part extraction + list_filter/
    list_sort vs Spark's try_parse_url pieces."""
    got = sorted(
        (r["doc_id"], r["c"])
        for r in _pages(spark).select("doc_id", canonical_url("url").alias("c")).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", URLS)
    want = sorted(
        (r[0], r[1])
        for r in con.execute(
            r"""
        WITH p AS (
            SELECT doc_id,
                coalesce(lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\-]*)://', 1)), '') AS proto,
                coalesce(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:@]+)', 1)), '') AS host,
                coalesce(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*:(\d+)', 1), '') AS port,
                coalesce(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)', 1), '') AS path,
                CASE WHEN url LIKE '%?%'
                     THEN regexp_extract(url, '\?([^#]*)', 1) ELSE '' END AS query
            FROM pages
        ), q AS (
            SELECT doc_id, proto, host, port,
                CASE WHEN path = '' THEN '/' ELSE path END AS path,
                coalesce(array_to_string(list_sort(list_filter(string_split(query, '&'),
                    x -> x <> '' AND NOT lower(string_split(x, '=')[1]) IN (
                        'utm_source','utm_medium','utm_campaign','utm_term',
                        'utm_content','utm_id','gclid','dclid','fbclid','msclkid',
                        'twclid','igshid','mc_cid','mc_eid','_hsenc','_hsmi',
                        'oly_enc_id','oly_anon_id'))), '&'), '') AS qs
            FROM p
        )
        SELECT doc_id,
            CASE WHEN proto = '' OR host = '' THEN NULL
                 ELSE proto || '://' || host ||
                      CASE WHEN port = '' OR (proto, port) IN
                                (('http','80'),('https','443'),('ftp','21'),
                                 ('ws','80'),('wss','443'))
                           THEN '' ELSE ':' || port END ||
                      path ||
                      CASE WHEN qs = '' THEN '' ELSE '?' || qs END
            END AS c
        FROM q
        """
        ).fetchall()
    )
    assert got == want


def test_url_dedup_collapses_aliases(spark):
    pages = spark.createDataFrame(
        [
            ("https://example.com", "body-root-A"),
            ("HTTPS://example.COM:443/?utm_source=x", "body-root-B"),
            ("https://example.com/", "body-root-C"),
            ("https://example.com/p?b=2&a=1", "body-p-A"),
            ("https://example.com/p?a=1&b=2#x", "body-p-B"),
            ("junk", "body-junk-1"),
            ("junk", "body-junk-2"),
        ],
        "url string, text string",
    )
    out = url_dedup(pages)
    rows = {r["url"]: r for r in out.collect()}
    # 3 root aliases -> one canonical row; winner = lexicographic min raw url
    assert rows["https://example.com/"]["n_aliases"] == 3
    assert rows["https://example.com/"]["source_url"] == "HTTPS://example.COM:443/?utm_source=x"
    assert rows["https://example.com/"]["text"] == "body-root-B"
    assert rows["https://example.com/p?a=1&b=2"]["n_aliases"] == 2
    # junk rows pass through unmerged (NULL keys never collapse)
    assert out.filter(F.col("url") == "junk").count() == 2
    assert url_dedup(pages, keep_unparseable=False).filter(
        F.col("url") == "junk"
    ).count() == 0


def test_url_dedup_deterministic_under_resharding(spark):
    pages = spark.range(200).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 19).cast("string"),
            F.lit(".example.com/p?utm_source=s"), F.col("id").cast("string"),
            F.lit("&k="), (F.col("id") % 3).cast("string"),
        ).alias("url"),
        F.col("id").cast("string").alias("text"),
    )
    a = sorted(map(tuple, url_dedup(pages).collect()))
    b = sorted(map(tuple, url_dedup(pages.repartition(17)).collect()))
    assert a == b and len(a) == 19 * 3


def test_plan_hygiene(spark):
    pages = _pages(spark)
    # with_canonical_url: pure projection — no exchange, no Python, and the
    # two-projection shape evaluates each of the five parse_url pieces
    # exactly ONCE (the single-expression form re-parses pieces 2-3x/row;
    # CollapseProject must keep the staging projection because the pieces
    # are non-cheap and multiply-referenced)
    plan = (
        with_canonical_url(pages)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("ParseUrlEvaluator(") == 5
    # url_dedup: exactly one exchange grain (the canonical-key hash agg);
    # the junk-passthrough union side adds none
    plan2 = url_dedup(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_latest_capture_newest_wins_and_counts(spark):
    import pyspark.sql.functions as F

    from tabbyld_spark.operators.urls import latest_capture

    p = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00", b"old"),
            ("u1", "2024-03-01 00:00:00", b"new"),
            ("u1", "2024-02-01 00:00:00", b"mid"),
            ("u2", "2024-01-01 00:00:00", b"only"),
        ],
        "url string, warc_ts string, html binary",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    got = {r["url"]: (bytes(r["html"]), r["n_captures"]) for r in latest_capture(p).collect()}
    assert got == {"u1": (b"new", 3), "u2": (b"only", 1)}


def test_latest_capture_equal_ts_tie_is_deterministic(spark):
    import pyspark.sql.functions as F

    from tabbyld_spark.operators.urls import latest_capture

    rows = [("u1", "2024-01-01 00:00:00", c.encode()) for c in ("aaa", "bbb", "ccc")]
    p = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary"
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    a = bytes(latest_capture(p).collect()[0]["html"])
    b = bytes(latest_capture(p.repartition(7)).collect()[0]["html"])
    import hashlib

    want = max(rows, key=lambda r: hashlib.md5(r[2]).hexdigest())[2]
    assert a == b == want


def test_crawl_diff_statuses(spark):
    from tabbyld_spark.operators.urls import crawl_diff

    old = spark.createDataFrame(
        [("u-keep", b"same"), ("u-edit", b"v1"), ("u-gone", b"x")],
        "url string, html binary",
    )
    new = spark.createDataFrame(
        [("u-keep", b"same"), ("u-edit", b"v2"), ("u-new", b"y")],
        "url string, html binary",
    )
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {
        "u-keep": "unchanged",
        "u-edit": "changed",
        "u-gone": "removed",
        "u-new": "added",
    }


def test_crawl_diff_shuffle_carries_digests_not_bodies(spark):
    from tabbyld_spark.operators.urls import crawl_diff

    old = spark.createDataFrame([("u", b"a" * 1000)], "url string, html binary")
    new = spark.createDataFrame([("u", b"b" * 1000)], "url string, html binary")
    plan = (
        crawl_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    )
    # each join input projects the md5 digest directly beneath its exchange,
    # so the shuffle payload is (url, digest) — raw html never crosses
    import re

    below_exchange = re.findall(
        r"Exchange hashpartitioning\(url[^\n]*\n[^\n]*Project \[url[^\n]*md5\(html",
        plan,
    )
    assert len(below_exchange) == 2, plan
