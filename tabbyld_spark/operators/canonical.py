"""Table-region → canonical-form conversion.

The reference receives spreadsheets already in canonical form
(DATA | RowHeading | ColumnHeading, /root/reference/components/
CanonicalTableAnnotator.php:56-58).  At web scale we mine table regions out
of HTML and canonicalize them here: for an extracted table with a key column
(column 0) and data columns 1..k, every data cell becomes one canonical row.

All native expressions — explode/posexplode, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tables_to_canonical(extracted: DataFrame) -> DataFrame:
    """extracted(url, tables:array<struct<table_idx,headers,rows>>) →
    canonical(table_id, row_idx, col_idx, data, row_heading, column_heading).
    """
    t = extracted.select("url", F.explode("tables").alias("t")).select(
        F.concat_ws("#t", F.col("url"), F.col("t.table_idx")).alias("table_id"),
        F.col("t.headers").alias("headers"),
        F.posexplode(F.col("t.rows")).alias("row_idx", "cells"),
    )
    c = t.select(
        "table_id",
        "row_idx",
        F.element_at("cells", 1).alias("row_heading"),
        "headers",
        F.posexplode(F.slice("cells", 2, 2**31 - 1)).alias("col_idx", "data"),
    )
    return c.withColumn(
        "column_heading", F.element_at("headers", F.col("col_idx") + 2)
    ).drop("headers")
