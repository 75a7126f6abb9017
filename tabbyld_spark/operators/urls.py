"""URL canonicalization + alias dedup — stage W0 of a web-corpus pipeline.

Common-Crawl-style corpora carry the SAME page under many raw URL spellings
(scheme/host case, explicit default ports, tracking query parameters, query
parameter order, fragments).  Canonicalizing before anything else collapses
those aliases at the cheapest possible grain — the URL string — so the
expensive stages (Arrow HTML decode, line dedup, near-dup) never see the
duplicate copies at all.  The same trick the reference plays with its
file-name-keyed dataset scan (it never re-parses a workbook it has already
seen — `commands/SpreadsheetController.php:61-77`), lifted to crawl scale.

Canonical form (documented, deliberately conservative):

* scheme and host lowercased; fragment dropped;
* explicit DEFAULT ports dropped (``http://h:80`` → ``http://h``,
  ``https://h:443`` → ``https://h``); non-default ports kept;
* empty path → ``/`` (``https://h`` ≡ ``https://h/``); otherwise the path
  is kept byte-for-byte (NO trailing-slash or %-encoding rewriting —
  ``/a/`` and ``/a`` can be different resources, so merging them is a
  correctness call the caller must opt into upstream);
* query: split on ``&``, drop empty params and tracking params
  (``utm_*`` etc. — :data:`TRACKING_PARAMS`, override per corpus), sort
  the rest lexicographically (param order never changes the resource),
  re-join; an emptied query drops its ``?``;
* unparseable URLs (no scheme/host) canonicalize to NULL — the caller
  decides whether junk rows are filtered or passed through.

Scale shape: :func:`canonical_url` is one whole-stage-codegen projection —
zero shuffle, zero UDF.  :func:`url_dedup` is ONE aggregation keyed on the
canonical string with map-side partial combine (``min_by``), so a page
duplicated across N raw spellings sends one survivor per map partition
into the exchange, not N copies of its HTML.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Query parameters that identify a click, not a resource (Google Analytics
# utm_*, ad-click ids, mail-campaign ids).  Public knowledge: these are the
# standard strip lists shipped by browser "remove tracking" features.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "dclid", "fbclid", "msclkid", "twclid", "igshid",
    "mc_cid", "mc_eid", "_hsenc", "_hsmi", "oly_enc_id", "oly_anon_id",
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def _url_pieces(c: Column, strip_www: bool) -> dict[str, Column]:
    """The five ``try_parse_url`` pieces (the try_ variant, because crawl
    URL columns always contain junk and the ANSI ``parse_url`` fails the
    whole task on the first bad row).  Port lives in AUTHORITY — HOST
    strips it."""
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return {
        "proto": F.lower(F.try_parse_url(c, F.lit("PROTOCOL"))),
        "host": host,
        "port": F.regexp_extract(
            F.coalesce(F.try_parse_url(c, F.lit("AUTHORITY")), F.lit("")),
            r":(\d+)$", 1,
        ),
        "path": F.coalesce(F.try_parse_url(c, F.lit("PATH")), F.lit("")),
        "query": F.coalesce(F.try_parse_url(c, F.lit("QUERY")), F.lit("")),
    }


def _assemble(
    proto: Column, host: Column, port: Column, path: Column, query: Column,
    tracking_params: tuple[str, ...],
) -> Column:
    """Canonical string from the five pieces.  Meant to be fed ATTRIBUTE
    references (see :func:`with_canonical_url`): every piece is used 2-3
    times, and attribute refs are free where re-inlined ``parse_url`` calls
    re-parse the URL on every use."""
    default_port = F.coalesce(
        *[F.when(proto == k, F.lit(v)) for k, v in _DEFAULT_PORTS.items()],
        F.lit(""),
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    norm_path = F.when(path == "", F.lit("/")).otherwise(path)
    # tracking params match on the NAME (before '='), case-insensitive —
    # the literal name array folds into the plan as a constant
    tracked = F.array(*[F.lit(p) for p in tracking_params])
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~F.array_contains(tracked, F.lower(F.split_part(p, F.lit("="), F.lit(1)))),
        )
    )
    q_part = F.when(F.size(kept) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(kept, "&"))
    )
    return F.when(
        proto.isNull() | host.isNull() | (host == ""), F.lit(None).cast("string")
    ).otherwise(F.concat(proto, F.lit("://"), host, port_part, norm_path, q_part))


def canonical_url(
    col: Column | str,
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
    strip_www: bool = False,
) -> Column:
    """Canonical form of a URL column (NULL when unparseable) as ONE column
    expression — convenient for ad-hoc use and oracle SQL mirroring, but it
    inlines each ``parse_url`` piece at every use site (pieces are re-parsed
    2-3× per row).  The hot path is :func:`with_canonical_url`, which
    evaluates each piece exactly once."""
    c = F.col(col) if isinstance(col, str) else col
    p = _url_pieces(c, strip_www)
    return _assemble(
        p["proto"], p["host"], p["port"], p["path"], p["query"], tracking_params
    )


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
    strip_www: bool = False,
) -> DataFrame:
    """``df`` plus ``out_col`` = canonical form of ``url_col`` — the hot-path
    shape: a first projection materializes the five URL pieces ONCE per row,
    a second assembles the canonical string from attribute references.
    Catalyst's CollapseProject keeps the two projections apart exactly
    because the pieces are non-cheap and multiply-referenced (collapsing
    would duplicate them) — the same per-row cost as one URL parse, vs ~7
    parses for the single-expression form.  Still zero shuffle, zero UDF."""
    pieces = _url_pieces(
        F.col(url_col) if isinstance(url_col, str) else url_col, strip_www
    )
    tmp = {k: f"_cu_{k}" for k in pieces}
    staged = df.select("*", *[v.alias(tmp[k]) for k, v in pieces.items()])
    return staged.select(
        *df.columns,
        _assemble(
            *[F.col(tmp[k]) for k in ("proto", "host", "port", "path", "query")],
            tracking_params,
        ).alias(out_col),
    )


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    tracking_params: tuple[str, ...] = TRACKING_PARAMS,
    strip_www: bool = False,
    keep_unparseable: bool = True,
) -> DataFrame:
    """One row per canonical URL: ``url_col`` is REPLACED by the canonical
    form, the winning raw spelling is kept as ``source_url``, and the alias
    count as ``n_aliases``.  The winner is the row whose raw URL string is
    lexicographically smallest — a pure function of the key set, so the
    output is deterministic under any partitioning, re-sharding, or retry.

    Unparseable URLs (canonical NULL) are passed through untouched one-row-
    per-row by default (``keep_unparseable=False`` drops them): junk rows
    must never be MERGED just because they share a NULL key.

    Scale shape: one exchange keyed on the canonical string; ``min_by``
    partial-aggregates map-side, so N aliases of a page cost one payload
    per map partition through the shuffle, never N.
    """
    rest = [f.name for f in pages.schema.fields if f.name != url_col]
    canon = with_canonical_url(
        pages, url_col, "_canon",
        tracking_params=tracking_params, strip_www=strip_www,
    )
    good = canon.filter(F.col("_canon").isNotNull())
    payload = F.struct(F.col(url_col).alias("source_url"), *rest)
    winners = good.groupBy("_canon").agg(
        F.min_by(payload, F.col(url_col)).alias("_w"),
        F.count(F.lit(1)).alias("n_aliases"),
    )
    dedup = winners.select(
        F.col("_canon").alias(url_col),
        F.col("_w.source_url").alias("source_url"),
        *[F.col(f"_w.{c}").alias(c) for c in rest], "n_aliases",
    )
    if not keep_unparseable:
        return dedup
    junk = canon.filter(F.col("_canon").isNull()).select(
        url_col, F.col(url_col).alias("source_url"), *rest,
        F.lit(1).cast("long").alias("n_aliases"),
    )
    return dedup.unionByName(junk)


def latest_capture(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak_col: str = "html",
) -> DataFrame:
    """One row per URL: the NEWEST capture wins (max ``ts_col``), with
    ``n_captures`` counting how many snapshots collapsed.  Common-Crawl-style
    inputs carry many captures of the same page across crawls (the input
    schema has ``warc_ts`` for exactly this reason); re-processing stale
    snapshots double-counts their lines through every downstream dedup and
    hash, so a crawl pipeline collapses to the latest capture first.

    Equal-timestamp ties break on ``md5(tiebreak_col)`` (largest wins) — a
    pure function of row content, so the winner is deterministic under any
    partitioning, re-sharding, or retry, the same contract as ``url_dedup``.

    Scale shape: one exchange keyed on the URL; ``max_by`` partial-aggregates
    map-side, so N captures of a page cost one payload per map partition
    through the shuffle, never N."""
    rest = [f.name for f in pages.schema.fields if f.name != url_col]
    payload = F.struct(*[F.col(c) for c in rest])
    order = F.struct(
        F.col(ts_col), F.md5(F.col(tiebreak_col).cast("binary")).alias("_tb")
    )
    winners = pages.groupBy(url_col).agg(
        F.max_by(payload, order).alias("_w"),
        F.count(F.lit(1)).alias("n_captures"),
    )
    return winners.select(
        url_col,
        *[F.col(f"_w.{c}").alias(c) for c in rest],
        F.col("n_captures").cast("long").alias("n_captures"),
    )


def crawl_diff(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    content_col: str = "html",
) -> DataFrame:
    """Snapshot delta between two crawls of the pages table: one row per URL
    present in either snapshot with ``status`` ∈ {added, removed, changed,
    unchanged} and both content digests.  A 10^12-page recrawl reprocesses
    only added ∪ changed — this is the operator that turns full recrawls
    into incremental pipeline runs (the pipeline's catalog resume handles
    *job* restarts; this handles *input* deltas).

    One co-partitioned full-outer join on the URL; content equality is
    md5-digest equality computed map-side, so the shuffle carries two
    16-byte digests per URL, never page bodies."""
    o = old.select(
        F.col(url_col).alias(url_col),
        F.md5(F.col(content_col).cast("binary")).alias("old_digest"),
    )
    n = new.select(
        F.col(url_col).alias(url_col),
        F.md5(F.col(content_col).cast("binary")).alias("new_digest"),
    )
    j = o.join(n, url_col, "full_outer")
    status = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") == F.col("new_digest"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(url_col, status.alias("status"), "old_digest", "new_digest")
