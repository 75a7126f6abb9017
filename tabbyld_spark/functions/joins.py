"""Join-strategy helpers.

``adaptive_broadcast`` is the size-gated broadcast hint the candidate lookup
and gazetteer joins use: the reference resolves each value against a remote
SPARQL endpoint one query at a time (/root/reference/commands/
SpreadsheetController.php:80-125), so it never faces the question — but a
10^12-document pipeline joining mentions against a surface-form dictionary
must pick between broadcast (dictionary fits executor memory) and shuffle
(it does not).  An unconditional ``F.broadcast`` hint OOMs the driver the day
the dictionary outgrows memory; dropping the hint entirely forfeits the
broadcast even when Catalyst's stats under-estimate an in-memory relation.
The gate reads the optimizer's own size estimate (no job is run) and hints
only below the session broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNITS = {"b": 1, "k": 1024, "kb": 1024, "m": 1024**2, "mb": 1024**2,
          "g": 1024**3, "gb": 1024**3, "t": 1024**4, "tb": 1024**4}


def parse_byte_conf(value: str) -> int:
    """Spark size-conf string ('64m', '10485760b', '-1') → bytes."""
    v = value.strip().lower()
    for suffix in sorted(_UNITS, key=len, reverse=True):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)]) * _UNITS[suffix])
    return int(v)


def plan_size_estimate(df: DataFrame) -> int:
    """Catalyst's sizeInBytes statistic for the optimized plan (driver-side
    metadata only — runs no job; parquet sources use file-footer stats,
    in-memory relations use the serialized batch estimate)."""
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    return int(str(stats.sizeInBytes()))


# Above this, a plan-size estimate is treated as NOT CREDIBLE rather than
# large: without CBO column stats Catalyst sizes an aggregate/join subtree by
# multiplying child estimates, which yields astronomically inflated numbers
# (measured 5e30 "bytes" for a 3-join gazetteer whose true size is ~20 KB).
# Gating on such a number silently demotes a tiny dimension to a shuffle join
# — a measured 3x wall-time regression on the pipeline.  1 PiB is far beyond
# any broadcastable relation AND far below the bogus multiplied estimates.
_CREDIBLE_MAX = 1 << 50


def adaptive_broadcast(
    df: DataFrame,
    threshold_bytes: int | None = None,
    proxy: DataFrame | None = None,
) -> DataFrame:
    """Return ``broadcast(df)`` when the plan-size estimate fits under the
    (session) broadcast threshold, else ``df`` unchanged so the join planner
    falls back to a shuffle join.  Threshold -1 (broadcast disabled) always
    returns the un-hinted frame.

    ``proxy``: frame whose (credible) stats bound ``df``'s size — use the
    base dimension scan when ``df`` is an aggregate/join derivation of it,
    since derived plans carry multiplied, non-credible estimates.  When no
    credible estimate exists at all, the hint is KEPT: a genuinely
    planet-sized dictionary arrives via a storage scan whose footer stats are
    credible, so the un-gated case is precisely the small in-memory dim."""
    if threshold_bytes is None:
        conf = df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
        threshold_bytes = parse_byte_conf(conf)
    if threshold_bytes < 0:
        return df
    est = None
    for frame in (df, proxy):
        if frame is None:
            continue
        try:
            cand = plan_size_estimate(frame)
        except Exception:
            continue
        if 0 <= cand <= _CREDIBLE_MAX:
            est = cand
            break
    if est is None:
        return F.broadcast(df)
    return F.broadcast(df) if est <= threshold_bytes else df
