"""CTA/CPA gold ingest: positional SemTab-style CSVs round-trip to the
fixture's heading-grain gold frames, and the ingested frames drive the
existing evaluators."""

import csv
import os

import pytest

from tabbyld_spark.operators.evaluate import evaluate_cpa, evaluate_cta
from tabbyld_spark.sources.gold import ROW_KEY, read_gold_cpa, read_gold_cta


@pytest.fixture(scope="module")
def gold_csvs(tmp_path_factory, pages_fx):
    fx = pages_fx
    # invert heading -> whole-table position (data col_idx k at position k+1)
    pos = {
        (r.table_id, r.column_heading): r.col_idx + 1
        for r in fx.canonical[["table_id", "col_idx", "column_heading"]]
        .drop_duplicates()
        .itertuples()
    }
    d = tmp_path_factory.mktemp("gold")
    with open(os.path.join(d, "cta_gt.csv"), "w", newline="") as f:
        w = csv.writer(f)
        for table_id, column, cls in fx.gold_cta[
            ["table_id", "column", "class"]
        ].itertuples(index=False, name=None):
            w.writerow([table_id, pos[(table_id, column)], cls])
    with open(os.path.join(d, "cpa_gt.csv"), "w", newline="") as f:
        w = csv.writer(f)
        for r in fx.gold_cpa.itertuples():
            a = 0 if r.col_a == ROW_KEY else pos[(r.table_id, r.col_a)]
            w.writerow([r.table_id, a, pos[(r.table_id, r.col_b)], r.pred])
    return str(d)


@pytest.fixture(scope="module")
def canonical_df(spark, pages_fx):
    return spark.createDataFrame(pages_fx.canonical)


def test_cta_gold_roundtrip(spark, pages_fx, gold_csvs, canonical_df):
    got = read_gold_cta(spark, os.path.join(gold_csvs, "cta_gt.csv"), canonical_df)
    want = {tuple(r) for r in pages_fx.gold_cta.itertuples(index=False)}
    assert {tuple(r) for r in got.collect()} == want and len(want) > 0


def test_cpa_gold_roundtrip(spark, pages_fx, gold_csvs, canonical_df):
    got = read_gold_cpa(spark, os.path.join(gold_csvs, "cpa_gt.csv"), canonical_df)
    want = {tuple(r) for r in pages_fx.gold_cpa.itertuples(index=False)}
    assert {tuple(r) for r in got.collect()} == want and len(want) > 0


def test_ingested_gold_drives_evaluators(spark, pages_fx, gold_csvs, canonical_df):
    # perfect predictions against the ingested gold score 1.0 across the board
    gcta = read_gold_cta(spark, os.path.join(gold_csvs, "cta_gt.csv"), canonical_df)
    gcpa = read_gold_cpa(spark, os.path.join(gold_csvs, "cpa_gt.csv"), canonical_df)
    m_cta = evaluate_cta(gcta, gcta)
    m_cpa = evaluate_cpa(gcpa, gcpa)
    assert m_cta["f1"] == 1.0 and m_cpa["f1"] == 1.0
