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
    3. APPEND the new fingerprints as the ledger's next snapshot
       (``catalog.append`` — the new snapshot references the prior
       snapshot's data files plus one delta dir, so a batch commit costs
       O(batch) I/O, never O(ledger); each fingerprint is recorded with
       the batch id and the surviving doc id — the provenance a
       takedown/audit needs).

Determinism: survivors are a pure function of (ledger state, batch
content) — re-running a batch against the same ledger snapshot accepts
the identical set, and re-submitting an already-committed batch accepts
NOTHING (the ledger already holds its fingerprints), which is what makes
the plan idempotent under driver retries.

Crash ordering: because a committed ledger makes the batch's rows
unrecoverable from a re-run (they all read as dupes), the ledger commit
must be the LAST durable step of a batch.  Callers that materialize the
accepted rows (``job.py inc-dedup``) run ``commit=False``, write the
accepted output first, then call :func:`commit_ledger` — a crash at any
point re-runs the batch cleanly; a crash after the output write but
before the ledger commit overwrites the same output and commits.

Scale: the ledger grows with distinct content, not with crawl volume;
its scan is fingerprint+metadata only, and the append commit writes only
the batch delta (periodic ``catalog.compact`` folds the accreted delta
files back into large ones — the standard Iceberg maintenance split).
At 10^12 docs the anti-join is a shuffle on md5 keys — the same grain
``line_dedup`` already sustains.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut
from tabbyld_spark.operators.dedup import exact_dedup

__all__ = ["dedup_against_ledger", "commit_ledger", "IncrementalDedupResult"]

LEDGER_SCHEMA = "fp string, doc_id string, batch_id string"


@dataclass
class IncrementalDedupResult:
    accepted: DataFrame          # batch rows that survived (full columns)
    fresh: DataFrame             # (doc_id, fp) of survivors — the ledger delta
    batch_id: str
    ledger_table: str
    id_col: str
    n_batch: int
    n_in_batch_dupes: int
    n_ledger_dupes: int
    ledger_snapshot: str | None  # None until committed


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
    """Dedup ``batch`` in-batch AND against the committed ledger; with
    ``commit=True`` the accepted fingerprints are appended as the ledger's
    next snapshot immediately.  Callers that must durably write the
    accepted rows should pass ``commit=False``, persist the output, then
    call :func:`commit_ledger` (see the crash-ordering note above)."""
    n_batch = batch.count()
    groups = exact_dedup(batch, text_col=text_col, id_col=id_col)
    winners = groups.filter(F.col(id_col) == F.col("keep_id")).select(id_col, "fp")
    n_winners = winners.count()

    if catalog.exists(ledger_table):
        ledger = catalog.read(spark, ledger_table).select("fp")
        fresh = winners.join(ledger, "fp", "left_anti")
    else:
        fresh = winners
    # cut: fresh feeds the accepted join, the count, AND the later ledger
    # commit — without it each consumer re-runs the anti-join
    fresh = cut(fresh)
    n_fresh = fresh.count()

    accepted = batch.join(fresh.select(id_col), id_col)

    res = IncrementalDedupResult(
        accepted=accepted,
        fresh=fresh,
        batch_id=batch_id,
        ledger_table=ledger_table,
        id_col=id_col,
        n_batch=n_batch,
        n_in_batch_dupes=n_batch - n_winners,
        n_ledger_dupes=n_winners - n_fresh,
        ledger_snapshot=None,
    )
    if commit:
        res.ledger_snapshot = commit_ledger(spark, catalog, res)
    return res


def commit_ledger(spark: SparkSession, catalog, res: IncrementalDedupResult) -> str:
    """Append ``res.fresh`` to the ledger as the next snapshot (the final
    atomic step of a batch).  O(delta) I/O via ``catalog.append``; falls
    back to a full union rewrite on catalogs without append."""
    addition = res.fresh.select(
        "fp",
        F.col(res.id_col).cast("string").alias("doc_id"),
        F.lit(res.batch_id).alias("batch_id"),
    )
    lineage = {
        "op": "inc-dedup",
        "batch_id": res.batch_id,
        "n_batch": res.n_batch,
        "n_accepted": res.n_batch - res.n_in_batch_dupes - res.n_ledger_dupes,
    }
    if hasattr(catalog, "append"):
        snap = catalog.append(addition, res.ledger_table, lineage=lineage)
    elif catalog.exists(res.ledger_table):
        merged = catalog.read(spark, res.ledger_table).unionByName(addition)
        snap = catalog.write(merged, res.ledger_table, lineage=lineage)
    else:
        snap = catalog.write(addition, res.ledger_table, lineage=lineage)
    res.ledger_snapshot = snap
    return snap
