"""Materialized CTA/CPA gold-CSV fixture for the gold-ingest oracle queries.

The gold readers (`sources/gold.py`) consume SemTab-style positional CSVs;
to drive them through the driver's two-engine correctness harness we need
deterministic CSVs on disk that both Spark and DuckDB can read.  They are a
pure function of the page fixture (same SEED / N_PAGES as the STI fixture,
whose ``canonical.parquet`` supplies the heading map): the heading-grain
gold frames from `fixtures.pages.gen_pages_pd` are inverted into position
space (data col_idx k at position k+1; ROW_KEY subjects at position 0) —
exactly the transform a benchmark suite's ground-truth files encode.
"""

from __future__ import annotations

import csv
import os
import shutil

from tabbyld_spark.fixtures.sti_fixture import N_PAGES, SEED, fixture_dir

GOLD_VERSION = 1


def gold_dir() -> str:
    return os.path.join(
        os.path.dirname(fixture_dir()), f"gold_v{GOLD_VERSION}"
    )


def ensure_gold_fixture() -> str:
    """Materialize cta_gt.csv / cpa_gt.csv if absent; returns the dir."""
    out = gold_dir()
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out

    from tabbyld_spark.fixtures.kg import build_kg
    from tabbyld_spark.fixtures.pages import gen_pages_pd
    from tabbyld_spark.sources.gold import ROW_KEY

    kg = build_kg(seed=SEED)
    fx = gen_pages_pd(kg, n_pages=N_PAGES, seed=SEED)
    pos = {
        (r.table_id, r.column_heading): r.col_idx + 1
        for r in fx.canonical[["table_id", "col_idx", "column_heading"]]
        .drop_duplicates()
        .itertuples()
    }
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "cta_gt.csv"), "w", newline="") as f:
        w = csv.writer(f)
        # named projection + positional unpack: 'class' is a Python keyword,
        # so attribute access would depend on itertuples' positional rename
        for table_id, column, cls in fx.gold_cta[
            ["table_id", "column", "class"]
        ].itertuples(index=False, name=None):
            w.writerow([table_id, pos[(table_id, column)], cls])
    with open(os.path.join(tmp, "cpa_gt.csv"), "w", newline="") as f:
        w = csv.writer(f)
        for r in fx.gold_cpa.itertuples():
            a = 0 if r.col_a == ROW_KEY else pos[(r.table_id, r.col_a)]
            w.writerow([r.table_id, a, pos[(r.table_id, r.col_b)], r.pred])
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out
