"""URL / domain filtering — the first stage of every web-corpus pipeline
(FineWeb, RefinedWeb, C4 all start by dropping pages from blocklisted
domains before any content work runs, because it prunes at the cheapest
possible grain: the URL string, no HTML decode, no tokenization).

Blocking is by REGISTRABLE-SUFFIX semantics: blocking ``example.com`` also
blocks ``sub.a.example.com`` — implemented by expanding each host into its
domain-suffix chain and semi/anti-joining the (tiny, broadcast) blocklist
against the exploded suffixes.  All column expressions; the suffix chain is
bounded by the host's label count (≤ ~10), so the per-row transform is
constant work.

Scale shape: one projection to derive the host, one explode bounded by the
label count, one broadcast join against the blocklist (a blocklist is KBs —
if yours is 100M rows use the un-hinted join and let the size gate demote),
then a doc-grain distinct on the pre-existing id — no text column ever
enters an exchange."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_host(col: Column | str) -> Column:
    """Lowercased hostname of a URL (empty string when unparseable —
    ``try_parse_url``, because crawl URL columns always contain junk and the
    ANSI ``parse_url`` fails the whole task on the first bad row)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.coalesce(F.try_parse_url(c, F.lit("HOST")), F.lit("")))


def host_suffixes(host: Column | str) -> Column:
    """['a.b.example.com', 'b.example.com', 'example.com', 'com'] — every
    dot-suffix of the host, most-specific first."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    # slice() referencing the outer `parts` inside transform re-evaluates it
    # per element (the HOF re-eval trap) — harmless here because the element
    # count is the host's LABEL count (≤ ~10), not data-sized
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def url_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Filter ``pages`` against a one-column ``blocklist`` of domains
    (column name ``domain``): ``mode='block'`` drops pages whose host has
    any blocklisted dot-suffix, ``mode='allow'`` keeps only those.  Returns
    the input columns plus the derived ``host``."""
    if mode not in ("block", "allow"):
        raise ValueError("mode must be 'block' or 'allow'")
    bl = F.broadcast(
        blocklist.select(F.lower(F.trim("domain")).alias("_blocked")).distinct()
    )
    with_host = pages.withColumn("host", url_host(url_col))
    sfx = with_host.select(
        url_col, F.explode(host_suffixes("host")).alias("_sfx")
    )
    hit = sfx.join(bl, sfx._sfx == bl._blocked, "left_semi").select(url_col).distinct()
    join_type = "left_anti" if mode == "block" else "left_semi"
    return with_host.join(hit, url_col, join_type)


# <meta name="robots" ... content="..."> (or name after content — attribute
# order varies in the wild); directive scan is a substring match inside the
# captured content value.  Java-regex, case-insensitive via (?i).
_META_ROBOTS_NC = (
    r'(?i)<meta\s[^>]*name\s*=\s*["\']?robots["\']?[^>]*'
    r'content\s*=\s*["\']([^"\']*)["\']'
)
_META_ROBOTS_CN = (
    r'(?i)<meta\s[^>]*content\s*=\s*["\']([^"\']*)["\'][^>]*'
    r'name\s*=\s*["\']?robots["\']?'
)


def robots_noindex(html_col: str = "html") -> Column:
    """Boolean column: the page's HTML carries a robots meta directive with
    ``noindex`` (or ``none``, which implies it).  Publishing pipelines must
    respect this before emitting a page's content — the standard crawl
    politeness gate after robots.txt (which gates fetching, not indexing;
    fetch-side exclusion happens upstream of this table).

    Pure codegen: lenient binary→string cast + two `regexp_extract` passes
    (attribute order varies in the wild), no Python, no shuffle — a
    zero-cost predicate to push down before any content work."""
    html_s = F.col(html_col).cast("string")
    content = F.concat_ws(
        ",",
        F.regexp_extract(html_s, _META_ROBOTS_NC, 1),
        F.regexp_extract(html_s, _META_ROBOTS_CN, 1),
    )
    c = F.lower(content)
    return c.rlike(r"(^|[,\s])(noindex|none)([,\s]|$)")


def drop_noindex(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Keep only pages without a robots ``noindex``/``none`` directive."""
    return pages.filter(~robots_noindex(html_col))
