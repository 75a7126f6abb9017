"""Transitive closure of rdfs:subClassOf — the one query the reference
delegates to SPARQL property paths (``rdfs:subClassOf*``,
/root/reference/commands/SpreadsheetController.php:242-246) that Spark has no
built-in for.

Computed once offline by iterative self-join (doubling), then broadcast
everywhere: closure(child, parent, depth) INCLUDING the reflexive depth-0
pairs the SPARQL ``*`` path implies.  Driver-side convergence loop with
localCheckpoint every iteration to keep lineage flat; O(log diameter)
shuffles via path doubling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut


def subclass_closure(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """edges(child, parent) direct edges → closure(child, parent, depth).

    Reflexive pairs (depth 0) are included for every node appearing on either
    side of an edge.
    """
    from tabbyld_spark.functions.joins import loop_shuffle_width

    nodes = (
        edges.select(F.col("child").alias("n"))
        .unionByName(edges.select(F.col("parent").alias("n")))
        .distinct()
    )
    closure = nodes.select(
        F.col("n").alias("child"), F.col("n").alias("parent"), F.lit(0).alias("depth")
    ).unionByName(
        edges.select("child", "parent", F.lit(1).alias("depth"))
    ).distinct().transform(cut)

    def _sig(df: DataFrame) -> int:
        return df.agg(F.sum(F.hash("child", "parent", "depth"))).collect()[0][0] or 0

    sig = _sig(closure)
    # the closure can only grow to |V|² pairs; width sized to the seed
    # relation is an under-estimate bounded by log-diameter doublings —
    # acceptable for the class-hierarchy graphs this serves (see
    # loop_shuffle_width; session width is kept on wide runs and under AQE)
    with loop_shuffle_width(edges.sparkSession, closure.count()):
        for _ in range(max_iters):
            # path doubling (min-plus squaring): join closure with itself,
            # keep the SHORTEST depth per pair — O(log diameter) rounds
            left = closure.select(
                F.col("child"), F.col("parent").alias("mid"), F.col("depth").alias("d1")
            )
            right = closure.select(
                F.col("child").alias("mid"), F.col("parent"), F.col("depth").alias("d2")
            )
            # the fixpoint signature rides the SAME job that materializes
            # the checkpoint (Observation) — no separate aggregate action
            # per round
            obs = Observation()
            stepped = (
                left.join(right, "mid")
                .select("child", "parent", (F.col("d1") + F.col("d2")).alias("depth"))
                .unionByName(closure)
                .groupBy("child", "parent")
                .agg(F.min("depth").alias("depth"))
                .observe(
                    obs, F.sum(F.hash("child", "parent", "depth")).alias("sig")
                )
                .transform(cut)
            )
            new_sig = obs.get["sig"] or 0
            closure = stepped
            if new_sig == sig:  # fixpoint on the full (pair, depth) relation
                break
            sig = new_sig
    return closure
