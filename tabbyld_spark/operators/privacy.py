"""PII detection + scrubbing for a training-data pipeline: emails, IPv4
addresses and phone numbers are counted and replaced with typed placeholder
tokens, entirely as native column expressions (one whole-stage-codegen
projection per document batch — no Python in the hot path, no shuffle).

The patterns are deliberately restricted to syntax with identical semantics
in Java regex (Spark) and RE2 (DuckDB) — character classes, bounded repeats,
``\\d``/``\\b`` — so the DuckDB twin in ``__spark_entry__.oracle_sql`` is an
exact cross-engine check, not an approximation.

Scrub order is part of the contract: emails first, then IPv4, then phones,
each pass counting on the text as left by the previous pass, so the reported
counts are exactly the number of replacements made.  (Counting every class
on the raw text instead would double-count digit runs that sit inside an
already-scrubbed span.)

Scale shape: zero shuffle — the operator is a projection, so it rides
whatever partitioning the corpus already has and survives any scale-up that
the scan itself survives.  At 100 TB the cost is one regex automaton pass
per pattern per document, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared with the SQL oracle (interpolated into the DuckDB twin verbatim) —
# keep to the Java∩RE2 common subset: no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d{1,3}[-. ]\d{3}[-. ]\d{4}\b"

# (output column stem, pattern, replacement token) in scrub order
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", PII_EMAIL_RE, "<EMAIL>"),
    ("ip", PII_IPV4_RE, "<IP>"),
    ("phone", PII_PHONE_RE, "<PHONE>"),
]


def scrub_text(col: Column | str) -> Column:
    """The scrubbed text alone (chained regexp_replace, all JVM-side).
    NULL reads as '' — the same contract as ``pii_profile``."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    for _, pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def pii_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, n_emails, n_ips, n_phones, scrubbed) — per-class
    replacement counts plus the scrubbed text.  Counts are computed on the
    progressively-scrubbed text (see module docstring), so
    ``n_<class> == number of <CLASS> tokens inserted`` holds exactly."""
    # NULL text reads as '' — counts 0, scrubbed '' (regexp_count/replace
    # would otherwise propagate NULL through every output column)
    cur = F.coalesce(F.col(text_col), F.lit(""))
    out: list[Column] = [F.col(id_col).alias("doc_id")]
    for stem, pat, tok in PII_PATTERNS:
        out.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{stem}s"))
        cur = F.regexp_replace(cur, pat, tok)
    out.append(cur.alias("scrubbed"))
    return docs.select(*out)
