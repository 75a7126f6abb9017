"""PageRank over directed edges — graph-materialize analytics (S7b).

The north star calls for canonicalization + graph materialization over the
constructed KG; after connected components (``operators/components.py``)
merges duplicate entities, PageRank is the standard next consumer of the
materialized edge set: entity/host salience for curation weighting (the
Common-Crawl host-level web graph is ranked exactly this way) and for
ordering ambiguous-candidate tiebreaks.  The reference has no graph
analytics at all (its graph lives in DBpedia and is only *queried*,
/root/reference/components/CanonicalTableAnnotator.php:49-54); this operator
is part of the web-scale re-targeting, computed per Page et al. 1999 ("The
PageRank citation ranking"), the damped power method with dangling-mass
redistribution:

    r(v) = (1-d)/N + d * ( sum_{u->v} r(u)/outdeg(u) + dang/N )
    dang = sum over dangling u (outdeg 0) of r(u)

which preserves sum(r) = 1 every iteration.  Fixed iteration count (the
usual production choice at web scale — convergence-delta loops add a
per-round driver action), so the result is a pure function of (edges,
damping, iterations) and has an exact unrolled-SQL twin.

Exchange discipline (mirrors connected_components): the edge set is the
BIG, loop-invariant side — hash-partitioned by ``src`` ONCE before the
loop (the lineage cut preserves the partitioning), so each iteration
shuffles only the rank frame (one row per node).  When the exact node
count is small the rank side broadcasts instead (count-gated, never
Catalyst-estimated) and the only per-iteration exchange is the map-side
partial-aggregated groupBy(dst).  The dangling mass each iteration needs
is observed during the SAME job that materializes the previous iteration's
ranks (``Observation`` fused into the eager lineage cut) — no extra
per-round action.  Skewed in-degree (a celebrity page) is absorbed by the
partial aggregation: reducers see one partial sum per map partition, not
one row per in-edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from tabbyld_spark.functions.joins import count_gated_hint, loop_shuffle_width
from tabbyld_spark.functions.lineage import cut


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    round_to: int | None = None,
) -> DataFrame:
    """edges(src, dst) directed → (node, rank) after ``iterations`` damped
    power-method steps from the uniform vector.  Self-loops count as
    ordinary edges; parallel edges collapse (the edge set is distinct'd).

    ``round_to`` rounds the final rank (engine-portable output for
    two-engine value comparison); intermediate math stays full double.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    sess = edges.sparkSession
    e = (
        edges.select("src", "dst")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
    )
    # loop-invariant side: partition by the join key once, cut so the
    # partitioning survives into every iteration's plan
    e = cut(e.repartition(F.col("src")))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("_deg"))
    nodes = cut(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(outdeg.withColumnRenamed("src", "node"), "node", "left")
    )  # (node, _deg) with _deg NULL ⇔ dangling; node set is loop-static
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    n_dang = nodes.filter(F.col("_deg").isNull()).count()

    d = float(damping)
    base = (1.0 - d) / n
    ranks = nodes.select("node", "_deg", F.lit(1.0 / n).alias("rank"))
    dang = n_dang / float(n)  # sum of uniform rank over dangling nodes

    with loop_shuffle_width(sess, n):
        for _ in range(iterations):
            contribs = (
                e.join(
                    count_gated_hint(
                        ranks.filter(F.col("_deg").isNotNull()).select(
                            F.col("node").alias("src"),
                            (F.col("rank") / F.col("_deg")).alias("_w"),
                        ),
                        n,
                    ),
                    "src",
                )
                .groupBy("dst")
                .agg(F.sum("_w").alias("_contrib"))
            )
            obs = Observation()
            ranks = cut(
                nodes.join(
                    contribs.withColumnRenamed("dst", "node"), "node", "left"
                )
                .select(
                    "node",
                    "_deg",
                    (
                        F.lit(base)
                        + F.lit(d)
                        * (F.coalesce(F.col("_contrib"), F.lit(0.0)) + F.lit(dang / n))
                    ).alias("rank"),
                )
                .observe(
                    obs,
                    F.sum(
                        F.when(F.col("_deg").isNull(), F.col("rank")).otherwise(
                            F.lit(0.0)
                        )
                    ).alias("dang"),
                )
            )
            dang = obs.get["dang"] or 0.0

    out = ranks.select("node", "rank")
    if round_to is not None:
        out = out.select("node", F.round("rank", round_to).alias("rank"))
    return out


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_deg: int = 10_000
) -> DataFrame:
    """→ (node, triangles, degree, clustering): per-node triangle count and
    local clustering coefficient over the UNDIRECTED simple graph — the
    community-density signal crawl curation uses beside PageRank (a host
    whose neighbors interlink is a topic cluster; one whose neighbors never
    meet is a link farm hub).

    The standard distributed shape (node-iterator with degree ordering):
    orient every undirected edge from the lower-degree endpoint to the
    higher (ties by node id), join the oriented edge list with itself on
    the source to enumerate each wedge ONCE, then probe the wedge's closing
    edge with one more equi-join — never an all-pairs expansion, and the
    orientation bounds wedge fan-out by sqrt(m)-ish degeneracy instead of
    the max degree.  ``max_deg`` drops hub nodes before wedge generation
    (the same guard as every self-join here; a 10^6-degree hub would
    contribute 10^12 wedges).  Triangles attribute to all three corners;
    clustering = 2·T / (d·(d−1)), 0 for degree < 2."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") <= max_deg)
    )
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    # inner joins double as the hub filter: edges touching a dropped hub go
    dd = und.join(du, "u").join(dv, "v")
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = dd.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
    )
    w1 = oriented.select(F.col("lo"), F.col("hi").alias("x"))
    w2 = oriented.select(F.col("lo"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "lo").filter(F.col("x") < F.col("y"))
    closing = und.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closing, ["x", "y"]).select(
        F.col("lo").alias("n1"), F.col("x").alias("n2"), F.col("y").alias("n3")
    )
    per_node = (
        tris.select(F.explode(F.array("n1", "n2", "n3")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.col("degree").cast("long").alias("degree"),
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def label_propagation(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    cut_every: int = 2,
) -> DataFrame:
    """Community detection by semi-synchronous label propagation →
    (node, community) over the UNDIRECTED simple graph — the third
    curation signal beside PageRank (global salience) and clustering
    coefficients (local density): communities group hosts/entities that
    interlink more among themselves than outward (Raghavan et al. 2007,
    "Near linear time algorithm to detect community structures").

    The repo's determinism contract forces two deviations from the
    classic randomized LPA, both standard:

    * SYNCHRONOUS rounds with a FIXED iteration count — every node
      updates from the same previous-round labels, so the result is a
      pure function of (edges, iterations) with no visit-order
      dependence (the usual Pregel formulation);
    * deterministic vote: a node takes the label with the highest
      neighbor count, ties → smallest label, and the node's OWN current
      label votes once too (self-vote damps the 2-cycle oscillation
      synchronous LPA is known for on bipartite-ish structures).

    Scale shape (mirrors :func:`pagerank`): the symmetrized edge set is
    the big loop-invariant side, hash-partitioned by node once before the
    loop; each iteration joins the (node, label) frame to it, counts
    (node, label) votes with map-side partial aggregation — a celebrity
    node's million votes reach a reducer as one partial per map partition
    — and takes the argmax in-expression via one ``max_by``-style struct
    aggregate (no window, no second exchange).  Lineage cuts every
    ``cut_every`` rounds bound plan depth exactly as the other iterative
    operators do.

    Exact-output equality vs an independent pure-Python reference is
    pinned in tests/test_graph_ops.py (the iterative-op contract)."""
    und = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    labels = und.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    labels = cut(labels)
    n_nodes = labels.count()  # exact; also sizes the loop's stages
    with loop_shuffle_width(und.sparkSession, n_nodes):
        und = cut(und.repartition("a"))
        for i in range(int(iterations)):
            nbr_votes = (
                und.join(labels.withColumnRenamed("node", "b"), "b")
                .groupBy(F.col("a").alias("node"), "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            self_votes = labels.select("node", "label", F.lit(1).alias("n"))
            votes = (
                nbr_votes.unionByName(self_votes)
                .groupBy("node", "label")
                .agg(F.sum("n").alias("n"))
            )
            # argmax by (n desc, label asc) in ONE aggregate: max over a
            # struct whose second field inverts the label order via a
            # monotone-descending sort key is not expressible for arbitrary
            # string labels, so use min over (-n, label) instead
            labels = (
                votes.groupBy("node")
                .agg(
                    F.min(
                        F.struct((-F.col("n")).alias("neg"), F.col("label"))
                    ).alias("w")
                )
                .select("node", F.col("w.label").alias("label"))
            )
            if (i + 1) % int(cut_every) == 0:
                labels = cut(labels)
        labels = cut(labels)  # materialize inside the narrowed width
    return labels.select("node", F.col("label").alias("community"))
