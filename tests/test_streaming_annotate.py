"""Incremental streaming annotation: micro-batch STI over newly-arrived
pages produces exactly the batch chain's triples, appends only the delta on
re-run, and is idempotent across replays."""

from pyspark.sql import functions as F

from tabbyld_spark.plans.pipeline import annotate_pages
from tabbyld_spark.streaming.annotate import run_streaming_annotate_once

TRIPLE_COLS = ["subj", "pred", "obj"]


def _triple_set(df):
    return {tuple(r) for r in df.select(*TRIPLE_COLS).collect()}


def test_streaming_annotate_matches_batch(spark, kg_spark, pages_fx, tmp_path):
    in_dir, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    wave1 = spark.createDataFrame(pages_fx.pages.head(20))
    wave2 = spark.createDataFrame(pages_fx.pages.iloc[20:32])

    wave1.write.parquet(in_dir)
    run_streaming_annotate_once(spark, in_dir, ckpt, out, kg_spark)
    got1 = _triple_set(spark.read.parquet(out))
    want1 = _triple_set(annotate_pages(wave1, kg_spark).triples)
    assert got1 == want1 and len(got1) > 0

    # re-run with no new files: checkpoint makes it a no-op
    run_streaming_annotate_once(spark, in_dir, ckpt, out, kg_spark)
    assert _triple_set(spark.read.parquet(out)) == got1

    # new files: only the delta batch is annotated; the union equals the
    # batch chain over all pages (the pipeline is per-table, so batch
    # boundaries cannot change any table's result)
    wave2.write.mode("append").parquet(in_dir)
    run_streaming_annotate_once(spark, in_dir, ckpt, out, kg_spark)
    got_all = _triple_set(spark.read.parquet(out))
    want_all = _triple_set(
        annotate_pages(wave1.unionByName(wave2), kg_spark).triples
    )
    assert got_all == want_all
    # delta really was processed as a separate batch partition
    n_batches = (
        spark.read.parquet(out).select("batch_id").distinct().count()
    )
    assert n_batches == 2
