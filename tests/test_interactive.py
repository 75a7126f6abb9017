"""Single-table interactive path (web-upload analogue): one workbook in,
per-cell render model out — identical annotations to the batch chain on the
same table."""

import os

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.plans.interactive import annotate_workbook
from tabbyld_spark.plans.pipeline import annotate_canonical
from tabbyld_spark.sources.xlsx import (
    SHEET_CANONICAL,
    SHEET_NER,
    write_workbook,
)


@pytest.fixture(scope="module")
def workbook_bytes(tmp_path_factory, kg, pages_fx):
    fx = pages_fx
    t = sorted(fx.canonical["table_id"].unique())[0]
    sub = fx.canonical[fx.canonical.table_id == t].sort_values(["row_idx", "col_idx"])
    canon = [["DATA", "RowHeading", "ColumnHeading"]]
    ner = [["DATA", "RowHeading", "ColumnHeading"]]
    for r in sub.itertuples():
        canon.append([r.data, r.row_heading, r.column_heading])
        ner.append([r.data_ner, r.row_heading_ner, r.column_heading_ner])
    path = str(tmp_path_factory.mktemp("up") / "uploaded-table.xlsx")
    write_workbook(path, {SHEET_CANONICAL: canon, SHEET_NER: ner})
    with open(path, "rb") as f:
        return f.read(), t, sub


def test_upload_matches_batch_chain(spark, kg_spark, workbook_bytes):
    data, t, sub = workbook_bytes
    res = annotate_workbook(spark, data, kg_spark, table_id="uploaded-table")
    got = {
        (r["col_role"], r["mention"]): r["entity"]
        for r in res.cell_entities.collect()
    }
    canonical = spark.createDataFrame(
        sub.assign(table_id="uploaded-table")[
            ["table_id", "row_idx", "col_idx", "data", "row_heading",
             "column_heading", "data_ner", "row_heading_ner", "column_heading_ner"]
        ]
    )
    batch = annotate_canonical(canonical, kg_spark, provided_ner=True, fuzzy_enabled=False)
    want = {
        (r["col_role"], r["mention"]): r["entity"] for r in batch.cea.collect()
    }
    assert got == want and len(got) > 0


def test_render_model_shapes(spark, kg_spark, workbook_bytes):
    data, _, sub = workbook_bytes
    res = annotate_workbook(spark, data, kg_spark)
    # annotated table mirrors the canonical grain
    assert res.annotated.count() == len(sub)
    # candidate query results carry the feature ranks the page renders
    cand_cols = set(res.candidate_results.columns)
    assert {"col_role", "mention", "entity", "agg_rank"} <= cand_cols
    # every ENTITY-linked cell also appears in the candidate list; literal
    # cells (P7 shortcut) link straight to a datatype instance and render
    # without query results, exactly like the reference page
    from tabbyld_spark.fixtures.kg import NER_INSTANCE

    linked = (
        res.cell_entities.filter(~F.col("entity").isin(list(NER_INSTANCE.values())))
        .select("col_role", "mention")
        .distinct()
    )
    cands = res.candidate_results.select("col_role", "mention").distinct()
    assert linked.join(cands, ["col_role", "mention"], "left_anti").count() == 0
    assert res.triples.count() > 0
