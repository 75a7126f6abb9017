"""Similarity search over an embedding column (array<float>).

  * brute_force_topk — exact cosine top-k (baseline; one shuffle for the
    window, crossJoin bounded by |queries| × |corpus|)
  * lsh_topk         — random-hyperplane (signed projection) bucketing as the
    scale path: candidates share ≥1 band bucket, exact rescoring on the
    shortlist.  Hyperplanes are a deterministic function of (seed, dim) —
    no Date.now/Math.random, reproducible across runs and cluster sizes.

All return (query_id, neighbor_id, rank[, cos]) with rank 1..k and a
deterministic tiebreak (cos desc, neighbor_id asc).  ivf_topk adds the
inverted-file scale path: a deterministic k-means coarse quantizer (Lloyd
iterations as DataFrame ops) partitions the corpus by nearest centroid and
each query probes only its n_probe nearest cells — the partition-pruned scan
shape a billion-vector corpus needs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabbyld_spark.functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-ish hyperplanes via a hash-based LCG
    (no global RNG state — pure function of (seed, plane, coord))."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            x = (seed * 1_000_003 + p * 10_007 + d * 101) % 2_147_483_647
            x = (x * 48271) % 2_147_483_647
            row.append(math.cos(x))  # bounded, sign-balanced
        planes.append(row)
    return planes


def _centroid_array(cents: DataFrame) -> DataFrame:
    """Fold the (tiny by construction) centroid table into ONE row holding
    array<struct<centroid,c_vec>> sorted by centroid id — broadcast-joining
    this single row attaches the whole codebook to every corpus row with no
    shuffle and no row blowup."""
    return cents.agg(
        F.array_sort(F.collect_list(F.struct("centroid", "c_vec"))).alias("_cents")
    )


def _scored_centroids(vec_col: str) -> "F.Column":
    """array<struct<centroid, cos>> — cosine of the row vector against every
    centroid, computed inside whole-stage codegen."""
    return F.transform(
        F.col("_cents"),
        lambda s: F.struct(
            s["centroid"].cast("long").alias("centroid"),
            cosine(F.col(vec_col), s["c_vec"]).alias("cos"),
        ),
    )


def _assign_centroid(df: DataFrame, cents: DataFrame, vec_col: str) -> DataFrame:
    """Nearest centroid per row, entirely in-expression: argmax over the
    broadcast codebook array (ties → lowest centroid id, matching the old
    window's (cos desc, centroid asc) order).  Zero exchanges in the
    assignment subtree — the previous crossJoin+window shape materialized
    |corpus| × n_centroids rows through a hash exchange per Lloyd iteration,
    which at 10^9 vectors × 16 centroids is a 16-billion-row shuffle for a
    per-row argmax."""
    best = F.aggregate(
        _scored_centroids(vec_col),
        F.struct(
            F.lit(-1).cast("long").alias("centroid"), F.lit(-2.0).alias("cos")
        ),
        lambda acc, s: F.when(s["cos"] > acc["cos"], s).otherwise(acc),
    )
    return (
        df.crossJoin(F.broadcast(_centroid_array(cents)))
        .withColumn("centroid", best["centroid"])
        .drop("_cents")
    )


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means → (centroid, c_vec) codebook.  Seeds are
    the first ``n_centroids`` ids in md5 order (pure function of the id
    set); each iteration is one zero-shuffle in-expression assignment plus
    one coordinate-grain mean.  Shared by :func:`ivf_topk` (the index
    coarse quantizer) and ``dedup.semantic_dedup`` (the SemDeDup cluster
    stage)."""
    c = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias(vec_col))
    seeds = (
        c.withColumn("_h", F.md5(F.col("_id").cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy("_h")).alias("centroid"),
            F.col(vec_col).alias("c_vec"),
        )
    )
    cents = seeds
    for _ in range(int(n_iter)):
        assigned = _assign_centroid(c, cents, vec_col)
        # element-wise mean per centroid: posexplode → mean per coordinate →
        # rebuild the array in coordinate order.  The sum runs over an exact
        # DECIMAL cast, not float avg: float addition is order-dependent, so
        # a partitioning change could flip near-tie centroid assignments —
        # decimal sums are associative and the mean is repartition-invariant
        cents = (
            assigned.select("centroid", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("centroid", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(27,12)")) / F.count(F.lit(1))
                )
                .cast("double")
                .alias("m")
            )
            .groupBy("centroid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("m")))
                    ),
                    lambda s: s["m"].cast("float"),
                ).alias("c_vec")
            )
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: Lloyd k-means over the corpus
    (seeded from a deterministic hash order of ids), then each query scores
    only the n_probe nearest cells.  Recall rises with n_probe; n_probe ==
    n_centroids degenerates to exact brute force.

    Scale shape: the expensive rescore join is an equi-join on ``centroid``
    — at 10^9 vectors the corpus side is bucketed/partitioned by centroid on
    disk and each probe reads n_probe/n_centroids of the data, not all of it.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    cents = train_centroids(
        corpus, n_centroids=n_centroids, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    inv = _assign_centroid(
        c.withColumnRenamed("cv", vec_col), cents, vec_col
    ).select("neighbor_id", F.col(vec_col).alias("cv"), "centroid")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    # top-n_probe cells per query, also in-expression: score every centroid,
    # sort by (cos desc, centroid asc) via a (-cos, centroid) sort key, keep
    # the first n_probe — no window exchange on the query side either
    probe_cells = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    _scored_centroids("qv"),
                    lambda s: F.struct(
                        (-s["cos"]).alias("neg"), s["centroid"].alias("centroid")
                    ),
                )
            ),
            1,
            n_probe,
        ),
        lambda s: s["centroid"],
    )
    probes = (
        q.crossJoin(F.broadcast(_centroid_array(cents)))
        .select("query_id", "qv", F.explode(probe_cells).alias("centroid"))
    )
    scored = (
        probes.join(inv, "centroid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    n_bands: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of n_planes projections, split into
    n_bands bands; vectors sharing any band bucket are candidates; exact
    cosine rescoring + window top-k on the shortlist.

    Pass ``dim`` explicitly in production — the fallback probes the corpus
    with a driver-side ``.first()`` (an action inside an operator), fine for
    fixtures but a needless job against a 10^9-vector table."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    planes_df = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in planes]
    )
    per_band = n_planes // n_bands

    def with_buckets(df: DataFrame, idc: str) -> DataFrame:
        sig = F.transform(
            planes_df,
            lambda plane: F.when(dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0")),
        )
        # band indices explode FIRST; buckets derive from the bound _sig in
        # the projection ABOVE the Generate — a bucket lambda referencing
        # _sig would re-evaluate the full n_planes-dot signature per band
        # (CollapseProject inlines aliases into lambda bodies)
        banded = (
            df.withColumn("_sig", sig)
            .select(
                F.col(id_col).alias(idc),
                F.col(vec_col).alias(f"_{idc}_v"),
                "_sig",
                F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
            )
            .select(
                idc,
                f"_{idc}_v",
                "band",
                F.concat_ws(
                    "", F.slice("_sig", F.col("band") * per_band + 1, per_band)
                ).alias("bucket"),
            )
        )
        return banded

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    cand = (
        qb.join(cb, ["band", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "_query_id_v", "neighbor_id", "_neighbor_id_v")
        .distinct()
    )
    scored = cand.withColumn("cos", cosine("_query_id_v", "_neighbor_id_v"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
