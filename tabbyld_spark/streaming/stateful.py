"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming at all (its incremental behavior is the
process fan-out + DB-polling barrier machinery,
/root/reference/components/CanonicalTableAnnotator.php:925-1005); a
continuous-crawl pipeline needs CROSS-BATCH semantics the stateless
operators can't express:

  * streaming exact dedup — a page seen in micro-batch 1 must suppress its
    duplicate arriving in micro-batch 40 000.  ``dropDuplicates`` on a
    stream keys state by the full dedup column; here state per group is one
    boolean ("seen"), keyed by the content fingerprint, with a processing-
    time TTL so state size is bounded by the dedup horizon instead of
    growing forever (the 100 TB requirement — unbounded state OOMs the
    fleet long before the crawl ends).

State shape: grouped by ``fp`` (md5 of normalized text — the exact_dedup
fingerprint, so batch and streaming dedup agree), state = (first_seen_count)
per fingerprint.  Emitted: only rows whose fingerprint was not seen in any
earlier batch (first occurrence within a batch wins by doc_id order for
determinism).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "doc_id long, text string, fp string"
_STATE_SCHEMA = "seen long"


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Same fingerprint as operators.dedup.exact_dedup — one definition of
    'duplicate' across batch and streaming."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.withColumn("fp", F.md5(norm))


def _make_dedup_group(ttl_ms: int | None):
    def _dedup_group(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        if seen == 0 and len(batch) > 0:
            first = batch.sort_values("doc_id").head(1)[["doc_id", "text", "fp"]]
            yield first
        state.update((int(seen + len(batch)),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _dedup_group


def streaming_exact_dedup(
    docs_stream: DataFrame, text_col: str = "text", ttl_ms: int | None = None
) -> DataFrame:
    """First-occurrence filter across micro-batches.  Input stream needs
    (doc_id, text); output is the surviving rows (doc_id, text, fp).

    ``ttl_ms`` bounds state size on a CONTINUOUSLY-running deployment (the
    100 TB requirement: unbounded seen-fingerprint state eventually OOMs;
    a TTL caps it at the dedup horizon).  Leave ``None`` for AvailableNow
    drain jobs — processing-time timeouts schedule extra state-cleanup
    batches after the data is drained, which an AvailableNow trigger keeps
    re-running instead of terminating (measured: the query loops in
    'No new data but cleaning up state' forever)."""
    fp = with_fingerprint(docs_stream, text_col).select("doc_id", "text", "fp")
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return fp.groupBy("fp").applyInPandasWithState(
        _make_dedup_group(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def run_streaming_dedup_once(
    spark, input_dir: str, checkpoint_dir: str, out_dir: str
) -> DataFrame:
    """Drain input_dir (AvailableNow) through the stateful dedup, appending
    survivors to a parquet sink; the checkpoint carries BOTH the source
    offsets and the seen-fingerprint state across separate invocations, so a
    later drain over newly-arrived files suppresses duplicates of earlier
    drains — exactly-once, resumable.  (A memory sink cannot recover from a
    checkpoint; the durable sink is the point of the exercise anyway.)
    Returns the cumulative deduped output."""
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    q = (
        streaming_exact_dedup(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
