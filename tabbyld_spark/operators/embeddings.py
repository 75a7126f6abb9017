"""Spectral node embeddings from co-occurrence counts — the deterministic
end of the walks → skip-gram → embedding chain.

SGNS word2vec is implicitly factorizing the (shifted) PPMI co-occurrence
matrix (Levy & Goldberg 2014, "Neural Word Embedding as Implicit Matrix
Factorization"), so a pipeline that must be DETERMINISTIC under retries
and re-shards (this repo's standing contract) embeds via the explicit
route instead of hogwild SGD:

1. :func:`ppmi_matrix` — pointwise mutual information over the
   (center, context, n) pair counts of ``walks.skipgram_pairs``:
   ``ppmi = max(0, log(n·N / (n_center·n_context)) − log(shift))``.
   Three aggregations (two marginals + the total riding a broadcast 1-row
   cross join), one sparse matrix out; never densified.

2. :func:`spectral_embedding` — top-``dim`` invariant subspace of the
   symmetrized PPMI matrix by ORTHOGONAL ITERATION: repeat
   ``Y = M·V;  V = Y·R⁻¹`` where ``R`` is the Cholesky factor of the
   k×k Gram ``YᵀY``.  Everything large stays distributed — the matvec is
   one equi-join + node-grain aggregate per iteration (the PageRank
   shape), the Gram is one k²-value aggregation — and only the k×k
   algebra (Cholesky, triangular inverse) runs on the driver via numpy,
   re-broadcast as plan literals.  ``dim`` and ``n_iters`` are fixed, so
   the whole embedding is a pure function of the input graph: no RNG,
   no SGD race, identical under any partitioning (init vectors come from
   the md5-uniform hash of the node id).

Scale shape per iteration: one shuffle keyed on the matrix row id
(co-partitioned with the previous iteration's V), one 64-ish-value
driver collect.  Lineage cut every iteration (driver-loop fixpoint
pattern).  Verification: reference-pinned against numpy (same init, same
algorithm — tolerance-level agreement; subspace alignment against
``numpy.linalg.eigh`` on the dense twin) in ``tests/test_embeddings.py``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut
from tabbyld_spark.operators.sampling import hash_uniform

__all__ = ["ppmi_matrix", "spectral_embedding", "negative_samples"]


def ppmi_matrix(
    pairs: DataFrame, shift: float = 1.0, min_count: int = 1
) -> DataFrame:
    """(center, context, n) co-occurrence counts → (center, context, ppmi)
    with ppmi > 0 rows only (the sparse positive PMI matrix).  ``shift``
    is the SGNS negative-sampling equivalent (log-shift by k); pairs
    below ``min_count`` are dropped before the marginals (noise prune —
    Levy & Goldberg's recommended hygiene)."""
    p = pairs.filter(F.col("n") >= min_count)
    rowm = p.groupBy("center").agg(F.sum("n").alias("n_center"))
    colm = p.groupBy("context").agg(F.sum("n").alias("n_context"))
    total = p.agg(F.sum("n").alias("n_total"))
    ppmi = (
        F.log(
            F.col("n")
            * F.col("n_total")
            / (F.col("n_center") * F.col("n_context"))
        )
        - F.lit(math.log(float(shift)))
    )
    return (
        p.join(rowm, "center")
        .join(colm, "context")
        .crossJoin(F.broadcast(total))
        .select("center", "context", ppmi.alias("ppmi"))
        .filter(F.col("ppmi") > 0)
    )


def _symmetrize(m: DataFrame) -> DataFrame:
    """Max-symmetrize the sparse matrix so orthogonal iteration targets a
    symmetric operator (real eigenvalues, orthogonal invariant subspace)."""
    a = m.select(F.col("center").alias("i"), F.col("context").alias("j"), "ppmi")
    b = m.select(
        F.col("context").alias("i"), F.col("center").alias("j"), F.col("ppmi")
    )
    return (
        a.unionByName(b)
        .groupBy("i", "j")
        .agg(F.max("ppmi").alias("w"))
    )


def spectral_embedding(
    matrix: DataFrame,
    dim: int = 8,
    n_iters: int = 15,
    seed: str = "spectral",
) -> DataFrame:
    """Sparse (center, context, ppmi) matrix → (node, vec: array<double>)
    spanning the top-``dim`` invariant subspace of the symmetrized matrix.

    Orthogonal iteration with deterministic init (md5-uniform of the node
    id per dimension, centered).  Fixed ``n_iters`` (no data-dependent
    stop), so the output is a pure function of the matrix."""
    import numpy as np

    k = int(dim)
    sym = cut(_symmetrize(matrix))
    nodes = sym.select(F.col("i").alias("node")).distinct()
    init_cols = F.array(
        *[
            hash_uniform(F.col("node"), seed=f"{seed}:{j}") - F.lit(0.5)
            for j in range(k)
        ]
    )
    v = cut(nodes.select("node", init_cols.alias("vec")))
    edges = sym.select(F.col("i").alias("dst"), F.col("j").alias("src"), "w")
    for _ in range(int(n_iters)):
        # Y = M·V : join V on the source side, weighted column-wise sums
        y = (
            edges.join(v.select(F.col("node").alias("src"), "vec"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.array(
                    *[
                        F.sum(F.col("w") * F.col("vec")[j]).alias(f"c{j}")
                        for j in range(k)
                    ]
                ).alias("y")
            )
        )
        # isolated nodes (no in-edges in sym) drop out of Y and stay out:
        # the subspace concerns the connected structure
        # Gram = YᵀY (k×k) in ONE aggregation, then driver-side Cholesky
        gram_row = y.agg(
            *[
                F.sum(F.col("y")[a] * F.col("y")[b]).alias(f"g_{a}_{b}")
                for a in range(k)
                for b in range(k)
            ]
        ).collect()[0]
        g = np.array([[gram_row[f"g_{a}_{b}"] for b in range(k)] for a in range(k)])
        # regularize: a rank-deficient Y (graph smaller than k) still factors
        r = np.linalg.cholesky(g + 1e-12 * np.eye(k)).T  # upper-triangular R
        r_inv = np.linalg.inv(r)
        # V = Y · R⁻¹ with R⁻¹ as plan literals (k² floats)
        v = cut(
            y.select(
                "node",
                F.array(
                    *[
                        sum(
                            (F.col("y")[a] * float(r_inv[a, b]) for a in range(k)),
                            F.lit(0.0),
                        ).alias(f"v{b}")
                        for b in range(k)
                    ]
                ).alias("vec"),
            )
        )
    return v

def negative_samples(
    triples: DataFrame,
    k: int = 1,
    n_buckets: int = 65_536,
    seed: str = "neg",
) -> DataFrame:
    """→ (subj, pred, obj, neg_idx): ``k`` corrupted-object negatives per
    positive triple — the training counterpart every link-prediction /
    KG-embedding objective needs (TransE-style corruption), DETERMINISTIC
    like every sampler here: the replacement object is a pure function of
    (seed, triple, j), so retries and re-shards corrupt identically.

    Mechanics: the distinct entity pool is hashed into ``n_buckets``
    buckets, each reduced to its min-entity representative (a bounded,
    broadcastable table); each (triple, j) draws bucket
    ``md5(seed:subj:pred:obj:j) % n_buckets`` and takes that bucket's
    representative.  Draws that collide with the true object — or
    reproduce an actual edge of the graph (false negatives) — are dropped
    via one left-anti join, so the output is guaranteed negative.

    Scale shape: one entity-grain aggregate (the pool), one broadcast
    join, one anti-join keyed on the corrupted triple; never a shuffle of
    the full corpus beyond the anti-join's own key exchange.  The bucket
    count is clamped to the EXACT pool size (one count action — the
    count-gate pattern): with more buckets than entities most draws would
    land in empty buckets and vanish; at the clamp, expected yield per
    draw is the Poisson occupancy ~63% (empty-bucket draws still vanish —
    deterministic yield loss, never bias toward any entity)."""
    ents = (
        triples.select(F.col("subj").alias("e"))
        .unionByName(triples.select(F.col("obj").alias("e")))
        .distinct()
    )
    # ents feeds two actions (the clamp count, then the pool aggregate); the
    # persist is released as soon as the bucketed pool is materialized via an
    # eager lineage cut — a long-lived session calling this repeatedly must
    # not accumulate cached entity pools
    ents = ents.persist()
    try:
        b = max(1, min(int(n_buckets), ents.count()))
        pool = cut(
            ents.select(
                F.pmod(
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit("pool:"), "e")), 1, 8), 16, 10
                    ).cast("long"),
                    F.lit(b),
                ).alias("bucket"),
                F.col("e"),
            )
            .groupBy("bucket")
            .agg(F.min("e").alias("neg_obj"))
        )
    finally:
        ents.unpersist()
    drawn = triples.select(
        "subj",
        "pred",
        F.col("obj").alias("pos_obj"),
        F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("neg_idx"),
    ).withColumn(
        "bucket",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.lit(seed),
                            "subj",
                            "pred",
                            "pos_obj",
                            F.col("neg_idx").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(b),
        ),
    )
    corrupted = (
        drawn.join(F.broadcast(pool), "bucket")
        .filter(F.col("neg_obj") != F.col("pos_obj"))
        .select("subj", "pred", F.col("neg_obj").alias("obj"), "neg_idx")
    )
    # drop corruptions that happen to BE true edges (false negatives)
    return corrupted.join(
        triples.select("subj", "pred", "obj"), ["subj", "pred", "obj"], "left_anti"
    )
