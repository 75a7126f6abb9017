"""CTA/CPA gold ingest — SemTab-style positional CSV gold targets.

The reference ships only cell-grain (CEA) gold inside its workbooks
(`/root/reference/commands/SpreadsheetController.php:453-494` compares cells;
there are no CTA/CPA gold sheets), so column-type and column-relation gold
arrives from external benchmark suites (SemTab / T2Dv2 "CTA_*_gt.csv" /
"CPA_*_gt.csv") as positional CSVs keyed by table id + 0-based column
position, where position 0 is the key (subject) column and data columns
follow at 1..N.  Our CTA/CPA grain is the *heading value* (`cta_vote` /
`cpa_vote` group by the column_heading string, mirroring the reference's
assoc-array keying) and the canonical frame's `col_idx` counts data columns
only — so the readers shift positions by one and resolve them through a
heading map derived from canonical; CSV position 0 resolves to the literal
role key "RowHeading" (the `cpa_vote` subject convention).

Scale shape: gold files are tiny next to the corpus — the heading map is a
distinct-aggregate of canonical (one shuffle, output bounded by #tables ×
#columns, not #rows) and the gold side broadcasts into it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CTA_GOLD_SCHEMA = "table_id string, col_pos int, class string"
CPA_GOLD_SCHEMA = "table_id string, col_a_pos int, col_b_pos int, pred string"

ROW_KEY = "RowHeading"


def column_heading_map(canonical: DataFrame) -> DataFrame:
    """(table_id, col_pos) → column_heading, distinct, in whole-table
    position space (data col_idx k sits at position k+1).  Bounded by the
    table-column grain; the reference's packed multi-part headings stay
    packed — gold suites key the whole column, not heading parts."""
    return canonical.select(
        "table_id",
        (F.col("col_idx") + F.lit(1)).alias("col_pos"),
        "column_heading",
    ).distinct()


def read_gold_cta(
    spark: SparkSession, path_glob: str, canonical: DataFrame
) -> DataFrame:
    """CTA gold CSV (table_id, col_pos, class) → (table_id, column, class),
    the `evaluate_cta` grain.  Headerless CSV, SemTab column order.  Rows
    targeting position 0 (the key column) drop out of the heading join —
    the pipeline types data columns only, like the reference."""
    gold = spark.read.schema(CTA_GOLD_SCHEMA).csv(path_glob)
    return (
        column_heading_map(canonical)
        .join(F.broadcast(gold), ["table_id", "col_pos"])
        .select("table_id", F.col("column_heading").alias("column"), "class")
        .distinct()
    )


def read_gold_cpa(
    spark: SparkSession, path_glob: str, canonical: DataFrame
) -> DataFrame:
    """CPA gold CSV (table_id, col_a_pos, col_b_pos, pred) →
    (table_id, col_a, col_b, pred), the `evaluate_cpa` grain.  Subject
    position 0 becomes the literal "RowHeading" role key (`cpa_vote`'s
    col_a convention); object positions resolve through the heading map."""
    gold = spark.read.schema(CPA_GOLD_SCHEMA).csv(path_glob)
    cmap = column_heading_map(canonical)
    mid = ["table_id", "col_a_pos", "col_b_pos", "pred", "col_a"]
    # subject side: position 0 is the role key, no lookup needed; other
    # positions resolve through the heading map with the TINY gold side as
    # the broadcast build (cmap is bounded by tables × columns — still
    # corpus-sized at 10^12 docs, never the build side)
    subj_key = gold.filter(F.col("col_a_pos") == 0).withColumn(
        "col_a", F.lit(ROW_KEY)
    )
    subj_col = cmap.withColumnsRenamed(
        {"col_pos": "col_a_pos", "column_heading": "col_a"}
    ).join(F.broadcast(gold.filter(F.col("col_a_pos") != 0)), ["table_id", "col_a_pos"])
    resolved = subj_key.select(*mid).unionByName(subj_col.select(*mid))
    # object side: same shape — resolved is still gold-sized, so it stays
    # the broadcast build against the heading map
    out = cmap.withColumnsRenamed(
        {"col_pos": "col_b_pos", "column_heading": "col_b"}
    ).join(F.broadcast(resolved), ["table_id", "col_b_pos"])
    return out.select("table_id", "col_a", "col_b", "pred").distinct()
