"""XLSX ingest: reference 3-sheet workbook layout → canonical DataFrame →
annotation → evaluation vs the workbook's own DBPEDIA TAGS gold sheet."""

import os

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.fixtures.pages import gen_pages_pd
from tabbyld_spark.operators.evaluate import evaluate_cea
from tabbyld_spark.plans.pipeline import annotate_canonical
from tabbyld_spark.sources.xlsx import (
    SHEET_CANONICAL,
    SHEET_GOLD,
    SHEET_NER,
    read_workbook,
    write_workbook,
    xlsx_dataset_gold_cea,
    xlsx_dataset_to_canonical,
)


@pytest.fixture(scope="module")
def workbook_dir(tmp_path_factory, kg):
    """One workbook per fixture table: CANONICAL FORM + NER TAGS (headed,
    DATA|RowHeading|ColumnHeading) + T2Dv2-packed DBPEDIA TAGS."""
    fx = gen_pages_pd(kg, n_pages=15, seed=7, typo_rate=0.0)
    out = tmp_path_factory.mktemp("xlsx_ds")
    gold_by_tm = {
        (r.table_id, r.mention): r.entity
        for r in fx.gold_cea.itertuples()
        if r.col_role == "DATA"
    }
    tables = sorted(fx.canonical["table_id"].unique())[:4]
    for t in tables:
        sub = fx.canonical[fx.canonical.table_id == t].sort_values(["row_idx", "col_idx"])
        canon = [["DATA", "RowHeading", "ColumnHeading"]]
        ner = [["DATA", "RowHeading", "ColumnHeading"]]
        gold = []
        for r in sub.itertuples():
            canon.append([r.data, r.row_heading, r.column_heading])
            ner.append([r.data_ner, r.row_heading_ner, r.column_heading_ner])
            uri = gold_by_tm.get((t, r.data), "")
            gold.append([f'{uri},"{r.data}"' if uri else ""])
        stem = t.replace("/", "_").replace(":", "_").replace("#", "_")
        write_workbook(
            os.path.join(out, f"{stem}.xlsx"),
            {SHEET_CANONICAL: canon, SHEET_NER: ner, SHEET_GOLD: gold},
        )
    return str(out), tables, fx


def test_workbook_round_trip(workbook_dir):
    out, tables, fx = workbook_dir
    path = os.path.join(out, sorted(os.listdir(out))[0])
    with open(path, "rb") as f:
        sheets = read_workbook(f.read())
    assert set(sheets) == {SHEET_CANONICAL, SHEET_NER, SHEET_GOLD}
    assert sheets[SHEET_CANONICAL][0] == ["DATA", "RowHeading", "ColumnHeading"]
    assert len(sheets[SHEET_CANONICAL]) == len(sheets[SHEET_NER])


def test_sparse_rows_keep_positions(tmp_path):
    """Excel omits fully-empty rows from sheetData; the reader must honor the
    row 'r' attribute so CANONICAL/NER sheets with different sparsity stay
    positionally aligned (ADVICE r2)."""
    import re
    import zipfile

    path = str(tmp_path / "sparse.xlsx")
    write_workbook(
        path,
        {SHEET_CANONICAL: [["h"], ["a"], [""], ["c"]], SHEET_NER: [["h"], ["NONE"], ["NONE"], ["NONE"]]},
    )
    # simulate Excel dropping the empty row 3 from the CANONICAL sheet only
    with zipfile.ZipFile(path) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    sheet1 = parts["xl/worksheets/sheet1.xml"].decode()
    parts["xl/worksheets/sheet1.xml"] = re.sub(
        r'<row r="3">.*?</row>', "", sheet1
    ).encode()
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in parts.items():
            zf.writestr(n, b)
    sheets = read_workbook(open(path, "rb").read())
    assert sheets[SHEET_CANONICAL] == [["h"], ["a"], [""], ["c"]]
    assert len(sheets[SHEET_CANONICAL]) == len(sheets[SHEET_NER])


def test_sparse_tail_rows_keep_heights(tmp_path):
    """Trailing empty rows Excel dropped from ONE sheet must not leave the
    parallel sheets with different heights (ADVICE r3): sheets are padded to
    the workbook max row count, and a declared <dimension> extent restores
    a sheet's own dropped tail even when every sheet dropped it."""
    import re
    import zipfile

    path = str(tmp_path / "tail.xlsx")
    write_workbook(
        path,
        {
            SHEET_CANONICAL: [["h"], ["a"], [""], [""]],
            SHEET_NER: [["h"], ["NONE"], ["NONE"], ["NONE"]],
        },
    )
    # simulate Excel dropping the two trailing empty rows (r=3, r=4) from
    # the CANONICAL sheet only — no later row 'r' triggers a backfill
    with zipfile.ZipFile(path) as zf:
        parts = {n: zf.read(n) for n in zf.namelist()}
    sheet1 = parts["xl/worksheets/sheet1.xml"].decode()
    sheet1 = re.sub(r'<row r="[34]">.*?</row>', "", sheet1)
    # also collapse any declared dimension so the workbook-max padding path
    # (not the dimension path) is what must restore alignment
    sheet1 = re.sub(r'<dimension ref="[^"]*"/>', "", sheet1)
    parts["xl/worksheets/sheet1.xml"] = sheet1.encode()
    with zipfile.ZipFile(path, "w") as zf:
        for n, b in parts.items():
            zf.writestr(n, b)
    sheets = read_workbook(open(path, "rb").read())
    assert len(sheets[SHEET_CANONICAL]) == len(sheets[SHEET_NER]) == 4
    assert sheets[SHEET_CANONICAL] == [["h"], ["a"], [""], [""]]


def test_xlsx_to_canonical_values(spark, workbook_dir):
    out, tables, fx = workbook_dir
    canon = xlsx_dataset_to_canonical(spark, out + "/*.xlsx")
    got = canon.orderBy("table_id", "row_idx").collect()
    n_expected = len(fx.canonical[fx.canonical.table_id.isin(tables)])
    assert len(got) == n_expected
    # cell contents survive the zip/XML round trip byte-identically,
    # including values with XML-special characters from the fixture
    vals = {(r["table_id"].rsplit("_", 1)[0], r["data"], r["row_heading"]) for r in got}
    src = {
        (t.rsplit("#", 1)[0].replace("/", "_").replace(":", "_"), r.data, r.row_heading)
        for t in tables
        for r in fx.canonical[fx.canonical.table_id == t].itertuples()
    }
    assert {(a.rsplit("_", 1)[0], b, c) for a, b, c in vals} == {
        (a.rsplit("_", 1)[0], b, c) for a, b, c in src
    }


def test_xlsx_end_to_end_evaluation(spark, workbook_dir, kg_spark):
    out, tables, fx = workbook_dir
    canon = xlsx_dataset_to_canonical(spark, out + "/*.xlsx")
    gold = xlsx_dataset_gold_cea(spark, out + "/*.xlsx")
    assert gold.count() > 0
    res = annotate_canonical(canon, kg_spark, provided_ner=True, fuzzy_enabled=False)
    m = evaluate_cea(res.cea.filter(F.col("col_role") == "DATA"), gold)
    # typo-free fixture + provided NER + exact candidates: the reference-gate
    # threshold applies (north rule P/R >= 0.95)
    assert m["precision"] >= 0.95
    assert m["recall"] >= 0.95
