"""Incremental page ingest via Structured Streaming.

The reference is batch-only (its "streaming" is OS-process fan-out with DB
polling barriers, /root/reference/components/CanonicalTableAnnotator.php:
925-949); the web-scale pipeline wants continuous crawl ingest: new page
files land in a directory, the stream extracts text + table regions,
watermarks on warc_ts for late crawl records, and appends windowed ingest
metrics.  The heavyweight annotation stages stay batch (micro-batch
foreachBatch would call plans.pipeline.annotate_canonical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tabbyld_spark.extract.html import extract_pages

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_pages_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def streaming_extract(pages_stream: DataFrame) -> DataFrame:
    """Stream → extracted text + per-page table count."""
    ex = extract_pages(pages_stream)
    return ex.select(
        "url", "warc_ts", "lang", "extracted_text", F.size("tables").alias("n_tables")
    )


def windowed_ingest_metrics(
    pages_stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
) -> DataFrame:
    """Late-data-tolerant ingest metrics: pages + table regions per
    (event-time window, lang)."""
    ex = streaming_extract(pages_stream)
    return (
        ex.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_tables").alias("n_tables"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_tables",
        )
    )


def run_ingest_once(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Drain everything currently in input_dir (Trigger.AvailableNow), append
    per-page extraction records to out_dir, exactly-once via the checkpoint.

    Per-page records (not windowed aggregates) go to the parquet sink: append
    mode emits them immediately, while watermarked windows would only flush on
    a *later* batch — an AvailableNow drain would end with every window still
    open and nothing written."""
    ex = streaming_extract(read_pages_stream(spark, input_dir))
    (
        ex.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_windowed_metrics_once(
    spark: SparkSession, input_dir: str, query_name: str = "ingest_metrics"
) -> DataFrame:
    """Windowed ingest metrics drained to an in-memory table (complete mode —
    every window visible regardless of watermark progress); returns the
    result as a batch DataFrame."""
    metrics = windowed_ingest_metrics(read_pages_stream(spark, input_dir))
    q = (
        metrics.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
