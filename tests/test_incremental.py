"""Incremental re-annotation (plans/incremental.py): delta-only recompute
must equal full recompute of the new snapshot, set-exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.fixtures.pages import gen_pages_df
from tabbyld_spark.plans.incremental import refresh_annotations
from tabbyld_spark.plans.pipeline import annotate_pages


@pytest.fixture(scope="module")
def snapshots(spark, kg):
    a = gen_pages_df(spark, kg, n_pages=60, seed=42).cache()
    b = gen_pages_df(spark, kg, n_pages=60, seed=43).cache()
    a.count(), b.count()
    # same url universe across seeds is required for "changed" semantics
    assert a.select("url").subtract(b.select("url")).count() == 0
    idx = F.regexp_extract("url", r"(\d+)$", 1).cast("int")
    old = a.filter(idx < 50)
    new = (
        a.filter((idx >= 10) & (idx < 55))        # 10-49 unchanged, 50-54 added
        .unionByName(b.filter(idx < 5))           # 0-4 changed content
    )                                             # 5-9 removed
    return old, new


def _sets(df):
    return {tuple(str(v) for v in r) for r in df.collect()}


def test_incremental_equals_full_recompute(spark, kg, kg_spark, snapshots):
    old, new = snapshots
    prev = annotate_pages(old, kg_spark, fuzzy_enabled=False)
    cea, cta, cpa, triples = refresh_annotations(
        old, new, prev.cea, prev.cta, prev.cpa, kg_spark, fuzzy_enabled=False
    )
    full = annotate_pages(new, kg_spark, fuzzy_enabled=False)
    assert _sets(triples) == _sets(full.triples)
    assert _sets(cea.select(*full.cea.columns)) == _sets(full.cea)
    assert _sets(cta.select(*full.cta.columns)) == _sets(full.cta)
    assert _sets(cpa.select(*full.cpa.columns)) == _sets(full.cpa)
    assert triples.count() > 0


def test_incremental_reprocesses_only_the_delta(spark, kg, kg_spark, snapshots):
    """The expensive path must touch added+changed pages only: with an empty
    delta the redo input is empty and prev tables pass through untouched."""
    old, _ = snapshots
    prev = annotate_pages(old, kg_spark, fuzzy_enabled=False)
    cea, _, _, triples = refresh_annotations(
        old, old, prev.cea, prev.cta, prev.cpa, kg_spark, fuzzy_enabled=False
    )
    assert _sets(cea.select(*prev.cea.columns)) == _sets(prev.cea)
    assert _sets(triples) == _sets(prev.triples)
