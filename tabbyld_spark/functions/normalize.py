"""Cell-value normalization — TabbyLD ``getNormalizedEntry`` semantics as
native column expressions (whole-stage-codegen friendly, no Python UDF).

Reference: /root/reference/components/CanonicalTableAnnotator.php:121-137
  1. drop every char except Latin letters, Cyrillic а-яА-Я, digits, whitespace
  2. collapse runs of non-newline whitespace to a single space
  3. trim
  4. mb_strtolower then byte-wise ucfirst (so a leading Cyrillic letter stays
     lowercase — PHP's ucfirst only uppercases a single leading ASCII byte)
  5. replace spaces with underscores

Multi-valued cells are packed with ``" | "`` in the reference
(CanonicalTableAnnotator.php:888,1046) — :func:`split_multivalue` undoes that.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# PHP pattern /[^a-zA-Zа-яА-Я0-9\s]/si — keep Latin, Cyrillic а-я (ё excluded,
# exactly as the reference's class does), digits, whitespace.
_DROP_RE = r"[^a-zA-Zа-яА-Я0-9\s]"
_WS_RE = r"[^\S\r\n]+"

DBPEDIA_ONTOLOGY = "http://dbpedia.org/ontology/"
DBPEDIA_RESOURCE = "http://dbpedia.org/resource/"
DBPEDIA_PROPERTY = "http://dbpedia.org/property/"
_PREFIX_RE = r"^http://dbpedia\.org/(ontology|resource|property)/"


def normalize_entry(col: Column | str) -> Column:
    """getNormalizedEntry as a chain of built-in expressions."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _DROP_RE, "")
    c = F.regexp_replace(c, _WS_RE, " ")
    c = F.trim(c)
    c = F.lower(c)
    first = F.substring(c, 1, 1)
    rest = F.substring(c, 2, 2**31 - 1)
    # byte-wise ucfirst: only an ASCII a-z first char is uppercased
    c = F.concat(F.when(first.rlike("^[a-z]$"), F.upper(first)).otherwise(first), rest)
    return F.translate(c, " ", "_")


def normalize_entry_py(entry: str) -> str:
    """Pure-Python twin of :func:`normalize_entry` (fixture generators + oracles)."""
    s = re.sub(_DROP_RE, "", entry)
    s = re.sub(_WS_RE, " ", s).strip().lower()
    if s and "a" <= s[0] <= "z":
        s = s[0].upper() + s[1:]
    return s.replace(" ", "_")


def normalize_entry_sql(expr: str) -> str:
    """DuckDB-SQL twin (ANSI-ish) for the driver's oracle compare."""
    inner = (
        f"trim(regexp_replace(regexp_replace({expr}, "
        f"'[^a-zA-Zа-яА-Я0-9\\s]', '', 'g'), '[^\\S\\r\\n]+', ' ', 'g'))"
    )
    low = f"lower({inner})"
    return (
        f"replace(CASE WHEN substr({low},1,1) BETWEEN 'a' AND 'z' "
        f"THEN upper(substr({low},1,1)) || substr({low},2) ELSE {low} END, ' ', '_')"
    )


def split_multivalue(col: Column | str) -> Column:
    """Packed multi-value cell → array (reference packs with ``" | "``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, r" \| ")


def entity_localname(col: Column | str) -> Column:
    """Strip the dbo:/dbr:/dbp: URI prefix — reference str_replace of the three
    section constants (CanonicalTableAnnotator.php:230-233)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _PREFIX_RE, "")


def entity_localname_sql(expr: str) -> str:
    return (
        f"regexp_replace({expr}, "
        f"'^http://dbpedia\\.org/(ontology|resource|property)/', '')"
    )
