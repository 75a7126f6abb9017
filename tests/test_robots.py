"""robots.txt parsing + REP longest-match filtering (operators/robots.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tabbyld_spark.operators.robots import parse_robots, robots_filter, url_path


ROBOTS_A = """# crawl policy
User-agent: googlebot
Disallow: /google-only/

User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp
Disallow:
Disallow: /wild*card

User-agent: otherbot
Disallow: /
"""

ROBOTS_B = """User-agent: a
User-agent: *
Disallow: /shared/
"""


def _rules(spark, bodies):
    return parse_robots(
        spark.createDataFrame(bodies, "host string, robots_txt string")
    )


def test_parse_groups_comments_empties_wildcards(spark):
    got = {
        (r["rule_path"], r["allow"])
        for r in _rules(spark, [("a.com", ROBOTS_A)]).collect()
    }
    # googlebot and otherbot groups excluded; empty + wildcard rules dropped
    assert got == {
        ("/private/", False),
        ("/private/ok/", True),
        ("/tmp", False),
    }


def test_parse_consecutive_agent_lines_share_group(spark):
    got = {
        (r["rule_path"], r["allow"])
        for r in _rules(spark, [("b.com", ROBOTS_B)]).collect()
    }
    assert got == {("/shared/", False)}


def test_filter_longest_match_and_ties(spark):
    rules = _rules(spark, [("a.com", ROBOTS_A)])
    pages = spark.createDataFrame(
        [
            ("https://a.com/",),                      # no rule matches → allow
            ("https://a.com/private/x",),             # /private/ → deny
            ("https://a.com/private/ok/x",),          # longer allow wins
            ("https://a.com/tmp/file",),              # prefix match → deny
            ("https://a.com/tmpX",),                  # '/tmp' is a prefix → deny (REP literal prefix)
            ("https://other.com/private/x",),         # no rules for host → allow
        ],
        "url string",
    )
    kept = {r["url"] for r in robots_filter(pages, rules).collect()}
    assert kept == {
        "https://a.com/",
        "https://a.com/private/ok/x",
        "https://other.com/private/x",
    }


def test_filter_equal_length_tie_allow_wins(spark):
    rules = parse_robots(
        spark.createDataFrame(
            [("t.com", "User-agent: *\nAllow: /p/\nDisallow: /p/")],
            "host string, robots_txt string",
        )
    )
    pages = spark.createDataFrame([("https://t.com/p/x",)], "url string")
    assert robots_filter(pages, rules).count() == 1


def test_url_path_component(spark):
    df = spark.createDataFrame(
        [
            ("https://h.com",),
            ("https://h.com/",),
            ("https://h.com/a/b?q=1#f",),
        ],
        "url string",
    ).select(url_path("url").alias("p"))
    assert [r["p"] for r in df.collect()] == ["/", "/", "/a/b"]


def test_filter_plan_stays_jvm_side(spark):
    rules = _rules(spark, [("a.com", ROBOTS_A)])
    pages = spark.createDataFrame([("https://a.com/x",)], "url string")
    plan = (
        robots_filter(pages, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
