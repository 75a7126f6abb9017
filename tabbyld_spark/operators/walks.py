"""Deterministic random walks over the KG/crawl graph — embedding corpus prep.

DeepWalk (Perozzi et al. 2014) / node2vec (Grover & Leskovec 2016) train
node embeddings on a corpus of short random walks.  At web scale the walk
generator — not the embedding trainer — is the distributed job, and it has
the same determinism obligation as every sampler here: a task retry or a
re-shard must regenerate the IDENTICAL corpus, so the "random" next hop is
a pure function of (seed, walk_id, step, current node), via the same
md5-uniform trick as ``sampling.hash_uniform``.

Shapes:

* adjacency (:func:`adjacency`): one (src)-grain aggregate to a SORTED
  neighbor array (sorting makes index selection order-independent), with
  hub truncation at ``max_deg`` — a 10^6-degree hub would otherwise carry
  its full array through every step join; truncation keeps the
  deterministic lexicographic prefix and is the standard skew guard for
  walk generators.
* stepping (:func:`random_walks`): ``walk_len`` chained equi-joins of the
  walk frontier against the adjacency table, each keyed on the current
  node — the natural pregel-like shape; every join reuses the adjacency
  partitioning, and walks that reach a sink (no out-edges) terminate
  early.  Lineage cut every few steps (chained-join plan depth).
* output: (walk_id, step, node) rows — the skip-gram window generator
  downstream is one explode away; ``walk_paths`` returns the compact
  array form instead.

Verification: iterative + data-dependent ⇒ pinned against an independent
pure-Python reference (``tests/test_walks.py``) per the repo's contract
for ops SQL can't reasonably express; determinism proven under
``repartition``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut
from tabbyld_spark.operators.sampling import hash_uniform

__all__ = [
    "adjacency",
    "random_walks",
    "node2vec_walks",
    "walk_paths",
    "skipgram_pairs",
]


def adjacency(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_deg: int = 10_000
) -> DataFrame:
    """(src, dst) edges → (node, nbrs) with nbrs sorted and truncated to
    the lexicographic ``max_deg`` prefix (hub skew guard)."""
    return (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .distinct()
        .groupBy("node")
        .agg(F.slice(F.array_sort(F.collect_list("nbr")), 1, max_deg).alias("nbrs"))
    )


def random_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    seed: str = "walk",
    max_deg: int = 10_000,
    cut_every: int = 4,
) -> DataFrame:
    """→ (walk_id, step, node): ``walks_per_node`` deterministic walks of
    up to ``walk_len`` hops from every node with out-edges.  Next hop at
    step t of walk w standing on node u is
    ``nbrs(u)[ floor(hash_uniform(seed:w:t:u) * |nbrs(u)|) ]`` — a pure
    function of the inputs, so the corpus is identical under retries,
    re-shards, and re-runs.  Sink nodes end their walk early (rows stop)."""
    adj = cut(adjacency(edges, max_deg=max_deg))
    frontier = adj.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1)),
                lambda k: F.concat_ws("#", F.col("node"), k.cast("string")),
            )
        ).alias("walk_id"),
        F.col("node"),
    )
    out = frontier.select("walk_id", F.lit(0).alias("step"), "node")
    steps = [out]
    for t in range(1, int(walk_len) + 1):
        u = hash_uniform(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(t)), F.col("node")),
            seed=seed,
        )
        nxt = (
            out.join(adj, "node")
            .select(
                "walk_id",
                F.lit(t).alias("step"),
                F.element_at(
                    "nbrs",
                    (F.floor(u * F.size("nbrs")) + 1).cast("int"),
                ).alias("node"),
            )
        )
        if t % cut_every == 0:
            nxt = cut(nxt)
        steps.append(nxt)
        out = nxt
    result = steps[0]
    for s in steps[1:]:
        result = result.unionByName(s)
    return result


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 4,
    walks_per_node: int = 1,
    p: float = 1.0,
    q: float = 1.0,
    seed: str = "n2v",
    max_deg: int = 10_000,
    cut_every: int = 4,
) -> DataFrame:
    """→ (walk_id, step, node): node2vec second-order biased walks with
    return parameter ``p`` and in-out parameter ``q`` (Grover & Leskovec
    2016) — deterministic like :func:`random_walks`.

    Standing on v having arrived from t, neighbor x of v is weighted
    1/p if x == t (return), 1 if x is adjacent to t (BFS-ish), 1/q
    otherwise (DFS-ish); the hop is inverse-CDF selection at
    ``u = hash_uniform(seed:walk:step:v)`` over the weight prefix sums —
    all in-expression (two O(deg) array folds per step), no Python.
    The frontier joins adjacency TWICE per step (current node's neighbor
    list + previous node's, for the distance test) — both equi-joins
    against the same cut adjacency table; p = q = 1 degenerates to
    first-order DeepWalk weights (but a distinct hash stream, so corpora
    are not comparable row-for-row across the two functions)."""
    adj = cut(adjacency(edges, max_deg=max_deg))
    frontier = adj.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(int(walks_per_node) - 1)),
                lambda k: F.concat_ws("#", F.col("node"), k.cast("string")),
            )
        ).alias("walk_id"),
        F.col("node"),
        F.lit(None).cast("string").alias("prev"),
    )
    out = frontier
    rows = [out.select("walk_id", F.lit(0).alias("step"), "node")]
    inv_p, inv_q = F.lit(1.0 / float(p)), F.lit(1.0 / float(q))
    for t in range(1, int(walk_len) + 1):
        u = hash_uniform(
            F.concat_ws(":", F.col("walk_id"), F.lit(str(t)), F.col("node")),
            seed=seed,
        )
        prev_adj = adj.select(
            F.col("node").alias("prev"), F.col("nbrs").alias("prev_nbrs")
        )
        stepped = (
            out.join(adj, "node")
            .join(prev_adj, "prev", "left")
            .withColumn(
                "_w",
                F.transform(
                    "nbrs",
                    lambda x: F.when(x == F.col("prev"), inv_p)
                    .when(
                        F.coalesce(
                            F.array_contains(F.col("prev_nbrs"), x), F.lit(False)
                        ),
                        F.lit(1.0),
                    )
                    .otherwise(F.when(F.col("prev").isNull(), F.lit(1.0)).otherwise(inv_q)),
                ),
            )
            .withColumn(
                "_cum",
                F.aggregate(
                    "_w",
                    F.array().cast("array<double>"),
                    lambda acc, x: F.concat(
                        acc,
                        F.array(F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + x),
                    ),
                ),
            )
        )
        target = u * F.element_at("_cum", -1)
        idx = (
            F.size(F.filter("_cum", lambda c: c < target)) + 1
        ).cast("int")
        nxt = stepped.select(
            "walk_id",
            F.element_at("nbrs", idx).alias("next_node"),
            F.col("node").alias("prev_node"),
        ).select(
            "walk_id",
            F.col("next_node").alias("node"),
            F.col("prev_node").alias("prev"),
        )
        if t % cut_every == 0:
            nxt = cut(nxt)
        rows.append(nxt.select("walk_id", F.lit(t).alias("step"), "node"))
        out = nxt
    result = rows[0]
    for r in rows[1:]:
        result = result.unionByName(r)
    return result


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """(walk_id, step, node) → (center, context, n) skip-gram training
    pairs within ±``window`` steps of the same walk — the word2vec-style
    corpus the embedding trainer consumes.  One self-join keyed on walk_id
    with the bounded step-distance predicate (each walk is ≤ walk_len rows,
    so the join blowup is ≤ 2·window per row), then a (center, context)
    count whose map-side combine collapses the pair multiset."""
    a = walks.select("walk_id", F.col("step").alias("i"), F.col("node").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("j"), F.col("node").alias("context"))
    return (
        a.join(b, "walk_id")
        .filter(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def walk_paths(walks: DataFrame) -> DataFrame:
    """(walk_id, step, node) rows → (walk_id, path) arrays in step order —
    one walk-grain aggregate (sort_array over (step, node) structs keeps
    the order shuffle-safe)."""
    return walks.groupBy("walk_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("step"), F.col("node")))
            ),
            lambda s: s["node"],
        ).alias("path")
    )
