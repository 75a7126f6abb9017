"""robots.txt parsing and URL filtering — the fetch-side politeness gate.

A crawl pipeline holds a small host-grain table of fetched robots.txt
bodies next to the huge pages table.  This module turns those bodies into
per-host prefix rules and filters URLs against them with REP longest-match
semantics (RFC 9309 / Google's reference parser, restricted to the literal
prefix subset — see `parse_robots`).

Everything is columnar and order-aware without Python:

* robots.txt grammar is LINE-ORDER-SENSITIVE (rules belong to the
  *preceding* ``User-agent`` group; consecutive ``User-agent`` lines share
  one group).  The parser reproduces that with ``posexplode`` + two window
  passes over (host, line_no): a ``lag`` marks group starts, a running sum
  assigns group ids — shuffle grain is robots *files*, which are KBs per
  host, never pages.
* matching is a host-grain equi-join (rule tables are dimension-sized:
  tens of rules per host — broadcast-gated) followed by an in-row argmax
  over the matched rules: longest rule wins; on a length tie ``Allow``
  wins (RFC 9309 §2.2.2).  URLs on hosts with no rules pass.

Restrictions, documented on purpose: rule paths are treated as literal
prefixes (`*` wildcards and `$` anchors — a Google extension RFC 9309
adopted — are not expanded; rules containing `*` are dropped rather than
mis-applied as literals), and agent matching is exact on the lowercased
product token.  Both keep the operator entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["parse_robots", "robots_filter", "url_path"]

_DIRECTIVE = r"(?i)^\s*(user-agent|allow|disallow)\s*:\s*([^#]*)"


def url_path(col: Column | str) -> Column:
    """Path component of an absolute http(s) URL ('' query/fragment cut,
    empty path → '/') — the string REP rules match against."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    txt_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) → (host, rule_path, allow) for the given agent's
    group(s).  Comments stripped, rules attributed to their preceding
    ``User-agent`` group (consecutive agent lines share a group), empty-path
    rules dropped (an empty ``Disallow:`` means "no restriction", RFC 9309
    §2.2.2), wildcard rules dropped (literal-prefix subset, see module
    docstring)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), r"\r?\n")).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(F.regexp_extract("line", _DIRECTIVE, 1)).alias("directive"),
        F.trim(F.regexp_extract("line", _DIRECTIVE, 2)).alias("value"),
    ).filter(F.col("directive") != "")

    w = Window.partitionBy("host").orderBy("line_no")
    is_agent = (F.col("directive") == "user-agent").cast("int")
    prev_agent = F.lag(is_agent, 1, 0).over(w)
    # a user-agent line NOT preceded by another user-agent line opens a group
    starts = lines.withColumn(
        "_new_group", (is_agent == 1) & (prev_agent == 0)
    ).withColumn(
        "group_id",
        F.sum(F.col("_new_group").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    my_groups = (
        starts.filter(
            (F.col("directive") == "user-agent")
            & (F.lower("value") == agent.lower())
        )
        .select("host", "group_id")
        .distinct()
    )
    return (
        starts.filter(F.col("directive").isin("allow", "disallow"))
        .join(my_groups, ["host", "group_id"], "left_semi")
        .filter((F.col("value") != "") & (~F.col("value").contains("*")))
        .select(
            "host",
            F.col("value").alias("rule_path"),
            (F.col("directive") == "allow").alias("allow"),
        )
        .distinct()
    )


def robots_filter(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Keep pages the rules allow for their host (longest matching rule
    wins; equal-length tie → Allow; no matching rule or no rules for the
    host → allowed).  One host-grain join against the broadcast-gated rule
    table + one URL-grain argmax aggregate."""
    from tabbyld_spark.functions.joins import adaptive_broadcast
    from tabbyld_spark.operators.webfilter import url_host

    keyed = pages.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path", url_path(F.col(url_col))
    )
    r = adaptive_broadcast(
        rules.select(
            F.col("host").alias("_host"), "rule_path", F.col("allow").alias("_allow")
        ),
        assume_small=True,
    )
    joined = keyed.select(url_col, "_host", "_path").join(r, "_host", "left")
    # every URL keeps >= 1 row: non-matching rules (and the null row of a
    # rule-less host) contribute an allow sentinel at length -1, so "no rule
    # matched" correctly resolves to allowed instead of vanishing pre-agg
    m = F.col("rule_path").isNotNull() & F.col("_path").startswith(
        F.col("rule_path")
    )
    eff_len = F.when(m, F.length("rule_path")).otherwise(F.lit(-1))
    eff_allow = F.when(m, F.col("_allow")).otherwise(F.lit(True))
    verdict = joined.groupBy(url_col).agg(
        F.max_by(
            eff_allow, F.struct(eff_len.alias("l"), eff_allow.alias("a"))
        ).alias("_verdict")
    )
    allowed = verdict.filter(F.col("_verdict")).select(url_col)
    return keyed.join(allowed, url_col, "left_semi").drop("_host", "_path")
