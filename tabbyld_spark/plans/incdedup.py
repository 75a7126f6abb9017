"""Incremental cross-snapshot dedup — the production shape of exact dedup.

A crawl pipeline does not see its corpus at once: batches arrive (daily
crawls, recrawl deltas), and each batch must dedup against EVERYTHING
ALREADY ACCEPTED, not just itself.  This plan keeps the accepted-content
fingerprint ledger as a catalog table and processes a batch as:

    1. in-batch exact dedup (``operators/dedup.exact_dedup`` — min-id
       winner per content group, deterministic);
    2. one left-anti join of the batch winners against the committed
       ledger (the only cross-snapshot work — it touches fingerprints,
       never text, so the exchange carries 32-byte keys);
    3. commit ``ledger ∪ new fingerprints`` as the next snapshot of the
       ledger table (each fingerprint recorded with the batch id and the
       surviving doc id — the provenance a takedown/audit needs).

Determinism: survivors are a pure function of (ledger state, batch
content) — re-running a batch against the same ledger snapshot accepts
the identical set, and re-submitting an already-committed batch accepts
NOTHING (the ledger already holds its fingerprints), which is what makes
the plan idempotent under driver retries.  Resume: the ledger commit is
the atomic unit — a crash before commit re-runs the batch cleanly.

Scale: the ledger grows with distinct content, not with crawl volume;
its scan is fingerprint+metadata only.  At 10^12 docs the anti-join is a
shuffle on md5 keys — the same grain ``line_dedup`` already sustains —
and the union commit rewrites only what the catalog's compaction policy
asks for (``catalog.compact`` composes).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tabbyld_spark.operators.dedup import exact_dedup

__all__ = ["dedup_against_ledger", "IncrementalDedupResult"]

LEDGER_SCHEMA = "fp string, doc_id string, batch_id string"


@dataclass
class IncrementalDedupResult:
    accepted: DataFrame          # batch rows that survived (full columns)
    n_batch: int
    n_in_batch_dupes: int
    n_ledger_dupes: int
    ledger_snapshot: str | None  # None on a dry run


def dedup_against_ledger(
    spark: SparkSession,
    catalog,
    batch: DataFrame,
    batch_id: str,
    ledger_table: str = "content_ledger",
    text_col: str = "text",
    id_col: str = "doc_id",
    commit: bool = True,
) -> IncrementalDedupResult:
    """Dedup ``batch`` in-batch AND against the committed ledger; commit the
    accepted fingerprints as the ledger's next snapshot (unless
    ``commit=False`` — the dry-run/audit mode)."""
    n_batch = batch.count()
    groups = exact_dedup(batch, text_col=text_col, id_col=id_col)
    winners = groups.filter(F.col(id_col) == F.col("keep_id")).select(id_col, "fp")
    n_winners = winners.count()

    if catalog.exists(ledger_table):
        ledger = catalog.read(spark, ledger_table).select("fp")
        fresh = winners.join(ledger, "fp", "left_anti")
    else:
        fresh = winners
    n_fresh = fresh.count()

    accepted = batch.join(fresh.select(id_col), id_col)

    snap = None
    if commit:
        addition = fresh.select(
            "fp",
            F.col(id_col).cast("string").alias("doc_id"),
            F.lit(batch_id).alias("batch_id"),
        )
        if catalog.exists(ledger_table):
            merged = catalog.read(spark, ledger_table).unionByName(addition)
        else:
            merged = addition
        snap = catalog.write(
            merged,
            ledger_table,
            lineage={"op": "inc-dedup", "batch_id": batch_id,
                     "n_batch": n_batch, "n_accepted": n_fresh},
        )
    return IncrementalDedupResult(
        accepted=accepted,
        n_batch=n_batch,
        n_in_batch_dupes=n_batch - n_winners,
        n_ledger_dupes=n_winners - n_fresh,
        ledger_snapshot=snap,
    )
