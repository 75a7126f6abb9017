"""Mention extraction (P4/P5/P6/P12) — distinct annotatable values per table.

Faithful to the reference's grain and quirks
(/root/reference/components/CanonicalTableAnnotator.php:1019-1055, 876-906):

  * DATA cells are taken WHOLE (no " | " split — only headings split, :1046)
  * one mention per distinct raw value per (table, role); the *last* row
    containing the value wins for NER label and heading-label context
    (PHP assoc-array overwrite)
  * heading cells split on " | "; each part's NER label is the LAST part of
    its row's packed NER value (reference foreach-overwrite quirk, :894-898)
  * heading labels used for the heading-rank feature are the *normalized*
    row+column heading parts of the winning row (:1049-1051)
  * entry context (P12, :632-681): for each row holding the value, every
    row in the table sharing a non-empty row_heading OR column_heading
    contributes its DATA value — with multiplicity, self included

Everything is exploded/joined/windowed native DataFrame ops; the "last row
wins" scans become one window per (table, value) instead of the reference's
O(rows²) loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabbyld_spark.functions.normalize import normalize_entry, split_multivalue

ROLE_DATA, ROLE_ROW, ROLE_COL = "DATA", "ROW", "COL"
_ROLE_COLUMN = {ROLE_ROW: "row_heading", ROLE_COL: "column_heading"}


def data_mentions(canonical: DataFrame, provided_ner: bool = False) -> DataFrame:
    """(table_id, col_role=DATA, mention, mention_norm[, ner], heading_labels)"""
    w = Window.partitionBy("table_id", "data").orderBy(
        F.desc("row_idx"), F.desc("col_idx")
    )
    labels = F.concat(
        F.transform(split_multivalue("row_heading"), normalize_entry),
        F.transform(split_multivalue("column_heading"), normalize_entry),
    )
    cols = [
        F.col("table_id"),
        F.lit(ROLE_DATA).alias("col_role"),
        F.col("data").alias("mention"),
        normalize_entry("data").alias("mention_norm"),
        F.filter(labels, lambda x: x != "").alias("heading_labels"),
    ]
    if provided_ner:
        cols.append(F.col("data_ner").alias("ner"))
    return (
        canonical.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("data") != "") & (normalize_entry("data") != ""))
        .select(*cols)
    )


def heading_mentions(canonical: DataFrame, role: str, provided_ner: bool = False) -> DataFrame:
    """(table_id, col_role, mention, mention_norm[, ner]) for ROW / COL."""
    col = _ROLE_COLUMN[role]
    parts = canonical.select(
        "table_id",
        "row_idx",
        "col_idx",
        F.explode(split_multivalue(col)).alias("mention"),
        *(
            [F.element_at(split_multivalue(f"{col}_ner"), -1).alias("ner")]
            if provided_ner
            else []
        ),
    ).withColumn("mention_norm", normalize_entry("mention"))
    parts = parts.filter(F.col("mention_norm") != "")
    w = Window.partitionBy("table_id", "mention").orderBy(
        F.desc("row_idx"), F.desc("col_idx")
    )
    out_cols = [
        F.col("table_id"),
        F.lit(role).alias("col_role"),
        "mention",
        "mention_norm",
    ] + (["ner"] if provided_ner else [])
    return (
        parts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*out_cols)
    )


def all_mentions(canonical: DataFrame, provided_ner: bool = False) -> DataFrame:
    """Union of the three roles with a uniform schema (heading roles carry an
    empty heading_labels array)."""
    d = data_mentions(canonical, provided_ner)
    hs = [
        heading_mentions(canonical, r, provided_ner).withColumn(
            "heading_labels", F.array().cast("array<string>")
        )
        for r in (ROLE_ROW, ROLE_COL)
    ]
    out = d
    for h in hs:
        out = out.unionByName(h)
    return out


def entry_context(canonical: DataFrame) -> DataFrame:
    """P12: (table_id, mention, ctx_value, n) — multiset of neighbouring DATA
    values per DATA mention, aggregated to counts (n) so the downstream
    similarity join moves counts, not rows.

    Reference getEntryContext (CanonicalTableAnnotator.php:632-681): a row
    matches if it shares a non-empty row_heading OR column_heading with a row
    holding the mention; each matching row contributes once per holder row.
    """
    rows = canonical.select(
        "table_id", "row_idx", "col_idx", "data", "row_heading", "column_heading"
    )
    left = rows.select(
        "table_id",
        F.col("row_idx").alias("l_r"),
        F.col("col_idx").alias("l_c"),
        F.col("data").alias("mention"),
        F.col("row_heading").alias("l_rh"),
        F.col("column_heading").alias("l_ch"),
    )
    right = rows.select(
        "table_id",
        F.col("row_idx").alias("r_r"),
        F.col("col_idx").alias("r_c"),
        F.col("data").alias("ctx_value"),
        F.col("row_heading").alias("r_rh"),
        F.col("column_heading").alias("r_ch"),
    )
    # OR-join decomposed into two equi-joins + pair-level dedup: hash joins on
    # (table_id, heading) instead of a per-table nested loop; a pair matching
    # on both headings must count once (reference's single `if`).
    on_rh = left.filter(F.col("l_rh") != "").join(
        right.filter(F.col("r_rh") != ""),
        (left.table_id == right.table_id) & (F.col("l_rh") == F.col("r_rh")),
    ).select(left.table_id, "l_r", "l_c", "mention", "r_r", "r_c", "ctx_value")
    on_ch = left.filter(F.col("l_ch") != "").join(
        right.filter(F.col("r_ch") != ""),
        (left.table_id == right.table_id) & (F.col("l_ch") == F.col("r_ch")),
    ).select(left.table_id, "l_r", "l_c", "mention", "r_r", "r_c", "ctx_value")
    pairs = on_rh.unionByName(on_ch).dropDuplicates(
        ["table_id", "l_r", "l_c", "r_r", "r_c"]
    )
    return pairs.groupBy("table_id", "mention", "ctx_value").agg(
        F.count(F.lit(1)).alias("n")
    )
