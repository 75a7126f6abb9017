"""Snapshot catalog: atomic commits, stage resume, kill-and-resume identity."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.plans.pipeline import run_pipeline_resumable
from tabbyld_spark.sources.catalog import SnapshotCatalog


def test_write_read_roundtrip(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    snap = cat.write(df, "t")
    assert snap == "snap-000000"
    got = cat.read(spark, "t")
    assert got.count() == 10
    # second write = new snapshot, current pointer advances
    cat.write(df.limit(3), "t")
    assert cat.read(spark, "t").count() == 3
    assert cat.manifest("t")["current"] == "snap-000001"
    assert [h["rows"] for h in cat.manifest("t")["history"]] == [10, 3]


def test_run_stage_resumes_without_recompute(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5)

    a = cat.run_stage(spark, "s1", compute)
    b = cat.run_stage(spark, "s1", compute)
    assert len(calls) == 1
    assert a.count() == b.count() == 5


def test_read_uncommitted_raises(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "nope")


def test_pipeline_kill_and_resume_identical_triples(spark, kg_spark, pages_fx, tmp_path):
    """Run S1 only (simulated kill after the first commit), then resume the
    full pipeline: final triples must equal an uninterrupted run's."""
    pages = spark.createDataFrame(pages_fx.pages.head(20))

    cat1 = SnapshotCatalog(str(tmp_path / "a"))
    full = run_pipeline_resumable(spark, pages, kg_spark, cat1)
    want = sorted(map(tuple, full.collect()))

    cat2 = SnapshotCatalog(str(tmp_path / "b"))
    # stage 1 commits canonical, then we "die" before annotation
    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.operators.canonical import tables_to_canonical

    cat2.run_stage(spark, "canonical", lambda: tables_to_canonical(extract_pages(pages)))
    assert cat2.exists("canonical") and not cat2.exists("triples")
    # resume: canonical must NOT be recomputed (poison the input to prove it)
    poisoned = spark.createDataFrame(
        [], "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    resumed = run_pipeline_resumable(spark, poisoned, kg_spark, cat2)
    got = sorted(map(tuple, resumed.collect()))
    assert got == want
