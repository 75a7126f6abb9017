"""Churn-tolerant lineage cuts (VERDICT r3 #4).

Default ``cut()`` is ``localCheckpoint`` — executor-stored blocks, fastest,
but unrecoverable on executor loss.  With SPARK_GRAFT_RELIABLE_CHECKPOINT=true
the same seam routes through reliable ``checkpoint()`` files, so a run that
loses every cached block (the local-mode analogue of losing an executor)
still reproduces identical triples WITHOUT a full-job restart: the frames
re-materialize from checkpoint files, not from recomputing the chain.
"""

import os

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.functions import lineage
from tabbyld_spark.plans.pipeline import annotate_canonical


def _drop_all_executor_blocks(spark):
    """Simulated block loss: unpersist every persistent RDD (this is where
    localCheckpoint data lives) and clear the SQL cache."""
    jsc = spark.sparkContext._jsc.sc()
    prdds = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in prdds.values():
        rdd.unpersist()
    spark.catalog.clearCache()
    return len(prdds)


@pytest.fixture()
def reliable_env(tmp_path, monkeypatch):
    monkeypatch.setenv(lineage.ENV_FLAG, "true")
    monkeypatch.setenv(lineage.ENV_DIR, str(tmp_path / "ckpt"))
    yield str(tmp_path / "ckpt")


def test_cut_default_is_local(spark):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    out = lineage.cut(df)
    assert out.count() == 10
    # localCheckpoint leaves no files anywhere; frame stays usable
    assert sorted(r["x"] for r in out.collect()) == [i * 2 for i in range(10)]


def test_cut_reliable_writes_files_and_survives_block_loss(spark, reliable_env):
    df = spark.range(100).withColumn("x", F.xxhash64("id"))
    out = lineage.cut(df)
    want = sorted(r["x"] for r in out.collect())
    # checkpoint files exist under the configured dir
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir and reliable_env.split("/")[-1] in ckpt_dir or os.path.isdir(
        reliable_env
    )
    _drop_all_executor_blocks(spark)
    assert sorted(r["x"] for r in out.collect()) == want


def test_pipeline_triples_identical_after_block_loss(
    spark, kg_spark, pages_fx, reliable_env
):
    """Flagship chain under the reliable flag: run annotate_canonical, drop
    every executor-stored block mid-flight (after the cuts materialized),
    and the already-returned frames still produce the identical triple set —
    the reliable files, not executor memory, are the recovery source."""
    canonical = spark.createDataFrame(pages_fx.canonical)
    res = annotate_canonical(canonical, kg_spark, provided_ner=True, fuzzy_enabled=False)
    want = sorted(map(tuple, res.triples.collect()))
    assert len(want) > 0
    # under the flag the cuts live as FILES, not executor blocks (that is
    # the point) — so assert the checkpoint dir filled up, then drop every
    # executor-stored block that does exist (other tests' caches, AQE
    # leftovers) and require identical re-materialization from the files
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir and any(os.scandir(ckpt_dir.replace("file:", ""))), ckpt_dir
    _drop_all_executor_blocks(spark)
    got = sorted(map(tuple, res.triples.collect()))
    assert got == want


def test_pipeline_reliable_matches_local(spark, kg_spark, pages_fx, reliable_env, monkeypatch):
    """Flag value must not change results, only the recovery story."""
    canonical = spark.createDataFrame(pages_fx.canonical)
    rel = annotate_canonical(canonical, kg_spark, provided_ner=True, fuzzy_enabled=False)
    rel_t = sorted(map(tuple, rel.triples.collect()))
    monkeypatch.setenv(lineage.ENV_FLAG, "false")
    loc = annotate_canonical(canonical, kg_spark, provided_ner=True, fuzzy_enabled=False)
    loc_t = sorted(map(tuple, loc.triples.collect()))
    assert rel_t == loc_t and len(rel_t) > 0
