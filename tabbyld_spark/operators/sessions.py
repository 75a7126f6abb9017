"""Event sessionization — gap-based session assignment + per-session stats.

The events side of a crawl/analytics pipeline (the reference's nearest
analogue is the per-run timing rows `commands/SpreadsheetController.php`
:702-742 accumulates) needs the classic sessionize operator: group each
user's events into sessions separated by a silence gap.

Implementation is Spark's NATIVE session window —
``groupBy(user, F.session_window(ts, gap))`` — which is one user-grain
shuffle with map-side partial session merging, scales to the streaming
path unchanged (the same expression works under ``readStream`` with a
watermark, giving this operator a batch/streaming-parity story like
``streaming/annotate.py``), and never materializes a per-user ordered
window.  The DuckDB twin deliberately uses the OTHER classic formulation —
gaps-and-islands over ``lag()`` — so the two engines cross-check different
algorithms (same pattern as the Gopher twin).

Session bounds are reported as observed ``min(ts)``/``max(ts)`` (not the
window struct's gap-padded end), which keeps the contract engine-neutral.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(
    events: DataFrame,
    gap: str = "24 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    extra_aggs: list | None = None,
) -> DataFrame:
    """→ (user_id, session_start, session_end, n_events[, sum_value],
    *extra): one row per (user, session) where a session is a maximal run
    of the user's events with inter-event silence ≤ ``gap``.
    ``extra_aggs`` appends caller aggregates (already aliased) to the same
    single session aggregate — stats ride the one shuffle for free."""
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    aggs.extend(extra_aggs or [])
    return (
        events.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), gap).alias("w"),
        )
        .agg(*aggs)
        .drop("w")
    )
