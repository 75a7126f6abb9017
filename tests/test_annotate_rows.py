"""P21 annotated-row materialization: winning URIs substituted in place,
multi-valued headings re-packed with " | " preserving part order
(/root/reference/commands/SpreadsheetController.php:569-684)."""

from tabbyld_spark.operators.triples import annotate_rows


def test_annotate_rows_substitution_and_packing(spark):
    canonical = spark.createDataFrame(
        [
            ("t", 0, 0, "Paris", "France | Europe", "Capital"),
            ("t", 1, 0, "Berlin", "Germany", "Capital"),
            ("t", 2, 0, "42", "Germany", "Count"),
        ],
        "table_id string, row_idx long, col_idx long, data string, row_heading string, column_heading string",
    )
    cea = spark.createDataFrame(
        [
            ("t", "DATA", "Paris", "Paris", "dbr:Paris"),
            ("t", "ROW", "France", "France", "dbr:France"),
            ("t", "ROW", "Europe", "Europe", "dbr:Europe"),
            ("t", "COL", "Capital", "Capital", "dbr:Capital"),
        ],
        "table_id string, col_role string, mention string, mention_norm string, entity string",
    )
    rows = {r["row_idx"]: r for r in annotate_rows(canonical, cea).collect()}
    # DATA substituted where annotated, original kept otherwise
    assert rows[0]["data"] == "dbr:Paris"
    assert rows[1]["data"] == "Berlin"
    assert rows[2]["data"] == "42"
    # multi-value heading re-packed in original part order, each part mapped
    assert rows[0]["row_heading"] == "dbr:France | dbr:Europe"
    assert rows[1]["row_heading"] == "Germany"
    assert rows[0]["column_heading"] == "dbr:Capital"
    assert rows[2]["column_heading"] == "Count"
