"""Incremental cross-snapshot dedup (plans/incdedup.py): in-batch + ledger
dedup, idempotent resubmission, dry-run mode, and ledger provenance."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.plans.incdedup import dedup_against_ledger
from tabbyld_spark.sources.catalog import SnapshotCatalog


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_first_batch_in_batch_dedup_only(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    b1 = _batch(spark, [("a", "x"), ("b", "x"), ("c", "y")])  # a,b duplicate
    r = dedup_against_ledger(spark, cat, b1, "batch-1")
    assert (r.n_batch, r.n_in_batch_dupes, r.n_ledger_dupes) == (3, 1, 0)
    assert {x.doc_id for x in r.accepted.collect()} == {"a", "c"}
    led = cat.read(spark, "content_ledger")
    assert led.count() == 2
    assert {x.batch_id for x in led.collect()} == {"batch-1"}


def test_second_batch_dedups_against_ledger(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    dedup_against_ledger(spark, cat, _batch(spark, [("a", "x"), ("c", "y")]), "b1")
    b2 = _batch(spark, [("d", "x"), ("e", "z"), ("f", "z")])
    r = dedup_against_ledger(spark, cat, b2, "b2")
    # d duplicates ledger content "x"; e,f collapse in-batch then e survives
    assert (r.n_in_batch_dupes, r.n_ledger_dupes) == (1, 1)
    assert {x.doc_id for x in r.accepted.collect()} == {"e"}
    led = {(x.fp, x.doc_id, x.batch_id) for x in cat.read(spark, "content_ledger").collect()}
    assert len(led) == 3  # x, y from b1 + z from b2
    assert {b for _, _, b in led} == {"b1", "b2"}


def test_resubmitting_a_batch_accepts_nothing(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    b = _batch(spark, [("a", "x"), ("c", "y")])
    dedup_against_ledger(spark, cat, b, "b1")
    r = dedup_against_ledger(spark, cat, b, "b1-retry")
    assert r.accepted.count() == 0 and r.n_ledger_dupes == 2
    # ledger unchanged in content (two snapshots, same fingerprints)
    assert cat.read(spark, "content_ledger").select("fp").distinct().count() == 2


def test_dry_run_commits_nothing(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    r = dedup_against_ledger(
        spark, cat, _batch(spark, [("a", "x")]), "b1", commit=False
    )
    assert r.ledger_snapshot is None
    assert not cat.exists("content_ledger")
    assert r.accepted.count() == 1


def test_normalization_matches_exact_dedup(spark, tmp_path):
    # whitespace/case variants are the SAME content (exact_dedup's norm)
    cat = SnapshotCatalog(str(tmp_path))
    dedup_against_ledger(spark, cat, _batch(spark, [("a", "Hello  World")]), "b1")
    r = dedup_against_ledger(
        spark, cat, _batch(spark, [("b", "hello world")]), "b2"
    )
    assert r.accepted.count() == 0 and r.n_ledger_dupes == 1


def test_output_can_be_written_before_ledger_commit(spark, tmp_path):
    # crash-ordering contract (plans/incdedup.py): job.py writes the
    # accepted rows FIRST, then commits the ledger as the final atomic
    # step via commit_ledger — a crash in between leaves the batch fully
    # re-runnable (ledger still at the prior snapshot)
    from tabbyld_spark.plans.incdedup import commit_ledger

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    b = _batch(spark, [("a", "x"), ("b", "x"), ("c", "y")])
    r = dedup_against_ledger(spark, cat, b, "b1", commit=False)
    out = str(tmp_path / "out.parquet")
    r.accepted.write.mode("overwrite").parquet(out)
    # simulated crash HERE: ledger untouched, batch re-runs cleanly
    assert not cat.exists("content_ledger")
    r2 = dedup_against_ledger(spark, cat, b, "b1", commit=False)
    assert {x.doc_id for x in r2.accepted.collect()} == {"a", "c"}
    # the completed run commits last; a resubmit then accepts nothing
    snap = commit_ledger(spark, cat, r2)
    assert snap is not None and r2.ledger_snapshot == snap
    assert {x.doc_id for x in spark.read.parquet(out).collect()} == {"a", "c"}
    r3 = dedup_against_ledger(spark, cat, b, "b1-retry")
    assert r3.accepted.count() == 0


def test_ledger_commits_are_append_snapshots(spark, tmp_path):
    # each batch commit must write O(batch) — an append snapshot
    # referencing the prior dirs — not a full ledger rewrite
    cat = SnapshotCatalog(str(tmp_path))
    dedup_against_ledger(spark, cat, _batch(spark, [("a", "x")]), "b1")
    r = dedup_against_ledger(spark, cat, _batch(spark, [("b", "y")]), "b2")
    man = cat.manifest("content_ledger")
    cur = next(h for h in man["history"] if h["snapshot"] == r.ledger_snapshot)
    assert len(cur["dirs"]) == 2  # prior snapshot's dir + this batch's delta
    assert cur["lineage"]["append_rows"] == 1
