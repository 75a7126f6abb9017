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

# whole <a ...> tag (for rel= inspection), double-/single-quoted href
_A_TAG_DQ = r'<[aA]\s[^>]*href\s*=\s*"[^"]*"[^>]*>'
_A_TAG_SQ = r"<[aA]\s[^>]*href\s*=\s*'[^']*'[^>]*>"


def extract_outlinks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_nofollow: bool = False,
) -> DataFrame:
    """pages(url, html:binary, ...) → (src_url, dst_url), one row per
    absolute http(s) outlink, de-duplicated per page.  Fragment-only and
    relative links are dropped (host-graph consumers resolve nothing);
    self-links survive — PageRank treats them as ordinary edges.

    ``drop_nofollow=True`` excludes links whose <a> tag carries
    ``rel=nofollow`` (incl. rel lists like "ugc nofollow") — the crawl-graph
    semantic PageRank was amended for: nofollow links must not confer rank.
    The default keeps them (cheaper single-pass href extraction; a corpus
    profile usually wants all links, a ranking graph wants them dropped).
    """
    # NOT decode(html, 'UTF-8'): Spark 4 raises MALFORMED_CHARACTER_CODING on
    # the first invalid byte sequence — guaranteed in crawl HTML.  The binary→
    # string cast wraps the bytes leniently (replacement-character semantics
    # at read time), never fails a task.
    html_s = F.col(html_col).cast("string")
    if drop_nofollow:
        # tag-grain extraction so rel can be inspected; per-element regexes
        # reference only the lambda's own element (HOF re-evaluation trap)
        tags = F.concat(
            F.regexp_extract_all(html_s, F.lit(_A_TAG_DQ), 0),
            F.regexp_extract_all(html_s, F.lit(_A_TAG_SQ), 0),
        )
        followed = F.filter(
            tags,
            lambda t: ~t.rlike(r'(?i)\srel\s*=\s*["\']?[^"\'>]*\bnofollow\b'),
        )
        hrefs = F.transform(
            followed,
            lambda t: F.coalesce(
                F.nullif(F.regexp_extract(t, _HREF_DQ, 1), F.lit("")),
                F.regexp_extract(t, _HREF_SQ, 1),
            ),
        )
    else:
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


# full <a ...> tag with its leading anchor-text run, double-/single-quoted
# href; anchor text is read up to the first '<' (nested markup truncates —
# the surface-form consumer wants the leading text, not the subtree)
_A_DQ = r'<[aA]\s[^>]*href\s*=\s*"[^"]*"[^>]*>[^<]*'
_A_SQ = r"<[aA]\s[^>]*href\s*=\s*'[^']*'[^>]*>[^<]*"


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html:binary, …) → (src_url, dst_url, anchor), one row per
    <a> occurrence with non-empty anchor text and an absolute http(s)
    target.  The anchor text of inbound links is the classic web-KG
    surface-form signal (how the web *names* the link target — feeds the
    candidate-generation dictionary the same way KG labels do).

    Occurrence grain is kept (not per-page distinct): anchor-text mining is
    a frequency signal, and the downstream aggregate decides the grain.
    Same codegen-only shape as `extract_outlinks` — lenient binary→string
    cast, `regexp_extract_all` over the raw tag, per-element href/text
    split inside one `transform` (lambda references only its own element,
    never a captured computed array — the HOF re-evaluation trap)."""
    html_s = F.col(html_col).cast("string")
    tags = F.concat(
        F.regexp_extract_all(html_s, F.lit(_A_DQ), 0),
        F.regexp_extract_all(html_s, F.lit(_A_SQ), 0),
    )
    pairs = F.transform(
        tags,
        lambda m: F.struct(
            F.coalesce(
                F.nullif(F.regexp_extract(m, _HREF_DQ, 1), F.lit("")),
                F.regexp_extract(m, _HREF_SQ, 1),
            ).alias("dst_url"),
            F.trim(F.regexp_extract(m, r">([^<]*)$", 1)).alias("anchor"),
        ),
    )
    return (
        pages.select(F.col(url_col).alias("src_url"), F.explode(pairs).alias("p"))
        .select("src_url", F.col("p.dst_url").alias("dst_url"), F.col("p.anchor").alias("anchor"))
        .filter(
            (
                F.col("dst_url").startswith("http://")
                | F.col("dst_url").startswith("https://")
            )
            & (F.col("anchor") != "")
        )
    )


def top_anchor_per_host(anchors: DataFrame) -> DataFrame:
    """(src_url, dst_url, anchor) → (node, top_anchor, n_anchor): the most
    frequent anchor text pointing at each target host (ties break
    lexicographically — deterministic across engines and re-shards).  Two
    host-grain exchanges: one (host, anchor) count with map-side combine,
    one host-grain argmax window — cardinality is distinct surface forms,
    never link occurrences."""
    from pyspark.sql import Window

    counts = (
        anchors.select(url_host(F.col("dst_url")).alias("node"), "anchor")
        .filter(F.col("node") != "")
        .groupBy("node", "anchor")
        .agg(F.count(F.lit(1)).alias("n_anchor"))
    )
    w = Window.partitionBy("node").orderBy(
        F.col("n_anchor").desc(), F.col("anchor").asc()
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("node", F.col("anchor").alias("top_anchor"),
                F.col("n_anchor").cast("long").alias("n_anchor"))
    )


def anchor_surface_forms(
    anchors: DataFrame,
    min_count: int = 1,
    max_hosts: int | None = None,
) -> DataFrame:
    """(src_url, dst_url, anchor) → (surface_form, entity, n_links): the
    anchor-text candidate dictionary (TagMe/WAT-style): each normalized
    anchor names the host it points at, weighted by link occurrences.  The
    output is shaped exactly like ``kg_labels(surface_form, entity)``, so it
    plugs straight into ``operators.candidates.exact_candidates`` — the
    crawl bootstraps its own surface-form dictionary.

    Guards, both standard for anchor mining:

    * ``min_count`` — drop (anchor, host) pairs seen fewer times (typo and
      one-off noise).
    * ``max_hosts`` — drop anchors pointing at more than this many distinct
      hosts ("click here", "read more"): the same document-frequency cap the
      dedup inverted indexes use, and for the same reason — a generic key
      explodes the downstream join.

    Normalization is ``normalize_entry`` — the SAME function mentions go
    through, so dictionary keys and probe keys live in one space.  Scale
    shape: one (surface_form, entity) count with map-side combine; the
    max_hosts guard adds one surface_form-grain aggregate + semi join —
    cardinality is distinct surface forms, never link occurrences."""
    from tabbyld_spark.functions.normalize import normalize_entry

    counts = (
        anchors.select(
            normalize_entry(F.col("anchor")).alias("surface_form"),
            url_host(F.col("dst_url")).alias("entity"),
        )
        .filter((F.col("surface_form") != "") & (F.col("entity") != ""))
        .groupBy("surface_form", "entity")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("n_links") >= min_count)
    if max_hosts is not None:
        specific = (
            counts.groupBy("surface_form")
            .agg(F.countDistinct("entity").alias("_nh"))
            .filter(F.col("_nh") <= max_hosts)
            .select("surface_form")
        )
        counts = counts.join(specific, "surface_form", "left_semi")
    return counts.select(
        "surface_form", "entity", F.col("n_links").cast("long").alias("n_links")
    )
