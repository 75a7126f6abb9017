"""The continuous crawl cycle — streaming WARC ingest → content-ledger
dedup → incremental annotation → catalog maintenance, composed
exactly-once.

Each piece exists and is tested on its own (``sources/warc.py`` ingest,
``plans/incdedup.py`` ledger dedup, ``streaming/annotate.py`` micro-batch
annotation, ``sources/catalog.py`` compaction); this plan is their
COMPOSITION: one ``foreachBatch`` loop that, per micro-batch of crawled
pages,

    1. extracts text and dedups the batch in-batch AND against the
       committed content ledger (``dedup_against_ledger``, commit
       deferred);
    2. annotates only the ACCEPTED pages with the batch STI chain and
       overwrites the batch's own ``batch_id=<id>`` partition (the
       idempotent-sink pattern of ``streaming/annotate.py``);
    3. commits the accepted fingerprints to the ledger as the FINAL step
       (append snapshot — O(batch) I/O).

Crash semantics (the reason the ordering matters): ``foreachBatch`` is
at-least-once — a batch whose checkpoint offset never committed REPLAYS
with the same batch id after a restart.  Replays are idempotent by
construction:

* killed before the ledger commit → the replay re-derives the identical
  accepted set against the unchanged ledger, overwrites the same output
  partition, then commits;
* killed after the ledger commit (before the offset commit) → the ledger
  already carries this batch id, which is the completion marker: the
  replay recognizes it and SKIPS — re-running the dedup would read every
  accepted row as a ledger duplicate and overwrite the partition with
  nothing, which is exactly the loss mode the ADVICE crash-ordering fix
  closed for the batch job.  (A batch whose accepted set is empty leaves
  no marker, and replaying it is a no-op anyway.)

Compaction interleaves freely: ``catalog.compact`` folds the ledger's
accreted append deltas into one snapshot between (or after) drains
without changing content, so a maintenance pass can run mid-crawl.

Scale shape: every micro-batch is a bounded batch job — the ledger
anti-join exchanges fingerprints only, annotation keeps the batch chain's
broadcast/salting decisions, and ledger commits stay O(batch) via append
snapshots.  The only cross-batch state is the ledger table and the
stream checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tabbyld_spark.plans.incdedup import commit_ledger, dedup_against_ledger

__all__ = ["run_crawl_cycle_once"]


def run_crawl_cycle_once(
    spark: SparkSession,
    warc_dir: str,
    checkpoint_dir: str,
    out_dir: str,
    catalog,
    kg: dict[str, DataFrame],
    ledger_table: str = "content_ledger",
    max_files_per_trigger: int = 2,
    fuzzy_enabled: bool = True,
    compact_target_rows: int | None = None,
) -> None:
    """Drain the WARC files currently in ``warc_dir`` (AvailableNow) through
    dedup + annotation, then optionally compact the ledger.  Re-running
    after new files arrive processes only the new files; killing the driver
    anywhere mid-stream and re-running converges to the same end state as
    an uninterrupted run (pytest-pinned in tests/test_continuous.py)."""
    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.plans.pipeline import annotate_pages
    from tabbyld_spark.sources.warc import read_warc_stream

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        bid = f"crawl-{batch_id}"
        if batch_df.isEmpty():
            return
        if catalog.exists(ledger_table):
            done = (
                catalog.read(spark, ledger_table)
                .filter(F.col("batch_id") == bid)
                .limit(1)
                .count()
            )
            if done:
                return  # completed replay: ledger carries the batch marker
        ex = extract_pages(batch_df).select("url", "extracted_text")
        res = dedup_against_ledger(
            spark,
            catalog,
            ex,
            bid,
            ledger_table=ledger_table,
            text_col="extracted_text",
            id_col="url",
            commit=False,
        )
        accepted_pages = batch_df.join(res.accepted.select("url"), "url")
        tri = annotate_pages(accepted_pages, kg, fuzzy_enabled=fuzzy_enabled)
        tri.triples.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")
        commit_ledger(spark, catalog, res)

    (
        read_warc_stream(spark, warc_dir, max_files_per_trigger=max_files_per_trigger)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    if compact_target_rows is not None and catalog.exists(ledger_table):
        catalog.compact(spark, ledger_table, target_rows_per_file=int(compact_target_rows))
