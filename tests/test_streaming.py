"""Structured-Streaming ingest: drain a directory with AvailableNow, verify
per-page extraction records, exactly-once resume via checkpoint, and
watermarked windowed metrics."""

from pyspark.sql import functions as F

from tabbyld_spark.streaming.ingest import run_ingest_once, run_windowed_metrics_once


def test_streaming_ingest_available_now(spark, pages_fx, tmp_path):
    in_dir, ckpt, out = (str(tmp_path / d) for d in ("in", "ckpt", "out"))
    spark.createDataFrame(pages_fx.pages.head(40)).write.parquet(in_dir)

    run_ingest_once(spark, in_dir, ckpt, out)
    m1 = spark.read.parquet(out)
    assert m1.count() == 40
    # extraction through the stream preserves the byte-identity invariant
    joined = m1.join(
        spark.createDataFrame(pages_fx.pages.head(40)[["url", "text"]]), "url"
    )
    assert joined.filter(F.col("extracted_text") != F.col("text")).count() == 0

    # re-running with the same checkpoint must be a no-op (exactly-once)
    run_ingest_once(spark, in_dir, ckpt, out)
    assert spark.read.parquet(out).count() == 40

    # new files → only the delta is processed
    spark.createDataFrame(pages_fx.pages.iloc[40:60]).write.mode("append").parquet(in_dir)
    run_ingest_once(spark, in_dir, ckpt, out)
    assert spark.read.parquet(out).count() == 60


def test_windowed_metrics(spark, pages_fx, tmp_path):
    in_dir = str(tmp_path / "in")
    spark.createDataFrame(pages_fx.pages.head(50)).write.parquet(in_dir)
    m = run_windowed_metrics_once(spark, in_dir, query_name="t_metrics")
    assert m.agg(F.sum("n_pages")).collect()[0][0] == 50
    # warc_ts fixture ticks 1s/page → 50 pages land in one 5-minute window
    assert m.select("window_start").distinct().count() == 1
    assert m.select("lang").distinct().count() >= 2
