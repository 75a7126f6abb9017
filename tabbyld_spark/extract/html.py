"""HTML → text + relational-table-region extraction.

This is the single Python stage of the pipeline (everything downstream is
native DataFrame ops), implemented as an Arrow-vectorized pandas UDF per
BASELINE.json input_hint ("no per-row Python" = no row-at-a-time Python UDF;
Arrow batches only).

Extraction spec (deterministic, dependency-free — the fixture generator
serializes its content model with :func:`serialize_blocks` and this parser
must reproduce it byte-identically from the rendered HTML):

  * content elements, in document order: ``<h1>``, ``<p>``, ``<table>``
  * ``<script>``/``<style>``/comments are dropped; all other markup ignored
  * inline tags inside a content element are stripped
  * entities ``&lt; &gt; &amp;`` are unescaped (amp last)
  * a table serializes as rows joined by ``\\n``, cells joined by ``\\t``
  * blocks join with ``\\n``

Replaces the reference's XLSX ingest (P1,
/root/reference/commands/SpreadsheetController.php:522-538) — the reference
receives canonical tables directly; at web scale we mine them from HTML.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_SCRIPT_RE = re.compile(r"<script\b.*?</script>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b.*?</style>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_BLOCK_RE = re.compile(
    r"<h1\b[^>]*>(.*?)</h1>|<p\b[^>]*>(.*?)</p>|<table\b[^>]*>(.*?)</table>",
    re.S | re.I,
)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr>", re.S | re.I)
_CELL_RE = re.compile(r"<t[hd]\b[^>]*>(.*?)</t[hd]>", re.S | re.I)
_TAG_RE = re.compile(r"<[^>]+>")


def _clean(fragment: str) -> str:
    s = _TAG_RE.sub("", fragment)
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    return s


def serialize_blocks(title: str, paras: list[str], tables: list[tuple[list[str], list[list[str]]]]) -> str:
    """Canonical text serialization shared by generator and extractor."""
    blocks = [title] + list(paras)
    for headers, rows in tables:
        blocks.append("\n".join("\t".join(r) for r in [headers] + rows))
    return "\n".join(blocks)


def extract_content(html: bytes | str) -> tuple[str, list[tuple[list[str], list[list[str]]]]]:
    """Pure-Python extraction: (text, [(headers, rows), ...])."""
    # lossy decode: a real crawl always contains non-UTF-8 payloads; they must
    # degrade to replacement chars, never kill the task
    h = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    h = _SCRIPT_RE.sub("", h)
    h = _STYLE_RE.sub("", h)
    h = _COMMENT_RE.sub("", h)
    blocks: list[str] = []
    tables: list[tuple[list[str], list[list[str]]]] = []
    for m in _BLOCK_RE.finditer(h):
        if m.group(1) is not None:
            blocks.append(_clean(m.group(1)))
        elif m.group(2) is not None:
            blocks.append(_clean(m.group(2)))
        else:
            rows = [
                [_clean(c.group(1)) for c in _CELL_RE.finditer(tr.group(1))]
                for tr in _TR_RE.finditer(m.group(3))
            ]
            rows = [r for r in rows if r]
            if rows:
                tables.append((rows[0], rows[1:]))
                blocks.append("\n".join("\t".join(r) for r in rows))
    return "\n".join(blocks), tables


_EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField(
            "tables",
            ArrayType(
                StructType(
                    [
                        StructField("table_idx", IntegerType()),
                        StructField("headers", ArrayType(StringType())),
                        StructField("rows", ArrayType(ArrayType(StringType()))),
                    ]
                )
            ),
        ),
    ]
)


def extract_pages(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) → + extracted(text, tables).

    One Arrow batch per partition slice; pure function of the html bytes, so
    the stage is deterministic and safely re-computable on task retry.
    """

    @F.pandas_udf(_EXTRACT_SCHEMA)
    def _extract(html: pd.Series) -> pd.DataFrame:
        texts, tabs = [], []
        for payload in html:
            text, tables = extract_content(payload)
            texts.append(text)
            tabs.append(
                [
                    {"table_idx": i, "headers": hd, "rows": rws}
                    for i, (hd, rws) in enumerate(tables)
                ]
            )
        return pd.DataFrame({"text": texts, "tables": tabs})

    ex = pages.withColumn("_ex", _extract(F.col(html_col)))
    return ex.withColumn("extracted_text", F.col("_ex.text")).withColumn(
        "tables", F.col("_ex.tables")
    ).drop("_ex")
