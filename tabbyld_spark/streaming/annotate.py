"""Incremental STI annotation over a page stream — micro-batch S1–S6.

The reference annotates whatever `web/dataset/` holds when the console
command fires (`/root/reference/commands/SpreadsheetController.php:499-538`);
new uploads require re-running the whole command.  The streaming analogue
annotates only the NEW pages each micro-batch and appends their triples
exactly-once: `foreachBatch` runs the identical batch chain
(`plans.pipeline.annotate_pages`) on the micro-batch, so streaming and batch
results agree page-for-page by construction, and the streaming checkpoint
makes the append idempotent across restarts (a replayed batch id is skipped
by the sink transaction log).

Scale shape: each micro-batch is a bounded batch job — every partitioning /
broadcast / salting decision the batch pipeline makes applies unchanged; the
only new state is the sink's transaction log.  Late/duplicate *pages* are
the upstream dedup operators' concern (streaming/stateful.py), not this
path's: the reference likewise annotates whatever rows the sheet holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tabbyld_spark.streaming.ingest import read_pages_stream


def run_streaming_annotate_once(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    kg: dict[str, DataFrame],
    fuzzy_enabled: bool = True,
) -> None:
    """Drain the pages currently in ``input_dir`` (Trigger.AvailableNow),
    annotate each micro-batch with the batch chain, append triples to
    ``out_dir``.  Re-running after new files arrive annotates only the new
    files.  Exactly-once: foreachBatch is at-least-once, so the sink write
    must be idempotent — each batch overwrites its own
    ``batch_id=<id>`` partition directory (a retried batch id replaces its
    partial output instead of appending a duplicate); readers see one
    consistent copy per batch."""
    from tabbyld_spark.plans.pipeline import annotate_pages

    def _annotate_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = annotate_pages(batch_df, kg, fuzzy_enabled=fuzzy_enabled)
        res.triples.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    (
        read_pages_stream(spark, input_dir)
        .writeStream.foreachBatch(_annotate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
