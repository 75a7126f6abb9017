"""Blocked entity resolution — attribute-overlap same_as edges.

The canonicalization stage (S7) merges duplicate entities with connected
components over ``same_as`` edges; ``operators/components.py:same_as_edges``
derives edges from mentions that LINK to the same KG entity.  A web-scale
KG build also needs the complementary source: entities that nobody linked
together but whose own descriptions agree — classic blocked entity
resolution (Fellegi–Sunter-style, deduplicated the Dedoop/Magellan way):

1. **block** — a cheap deterministic key (normalized name, sorted-token
   prefix, …) partitions the entity universe; only same-block entities can
   pair, so the quadratic blow-up is bounded per block.  Oversized blocks
   (stop-word-like names) are DROPPED by ``max_block`` before any pair is
   generated — the same df-cap skew guard as ``ngram_jaccard_pairs``; at
   web scale one "unknown"-named block would otherwise dominate the job.
2. **score** — attribute-set Jaccard via the inverted-index shape: explode
   attributes, equi-join on (block, attribute), count shared attributes per
   pair, divide by the union size.  Never an all-pairs cross join; the join
   key (block, attr) keeps skew bounded by the block cap.
3. **edge** — pairs at/above ``threshold`` become canonical (src < dst)
   ``same_as`` edges that feed straight into ``connected_components``.

Scale shape: one entity-grain aggregate (profiles), one block-grain count
(the cap), one (block, attr)-grain self-join whose output is bounded by
``max_block``² per block, one pair-grain count.  All native expressions;
the md5 attribute hashing is engine-portable so the DuckDB twin re-derives
scores bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "er_profiles",
    "blocked_same_as",
    "fuzzy_blocked_same_as",
    "resolve_entities",
]


def er_profiles(
    triples: DataFrame, name_pred: str, max_attrs: int = 10_000
) -> DataFrame:
    """(subj, pred, obj) triples → (entity, block, attrs) profiles.

    The blocking key is the normalized name (lower-cased, whitespace-
    collapsed object of ``name_pred``; entities without a name triple have
    no block and are dropped — nothing to block on).  Attributes are the
    distinct md5(pred|obj) hashes of every NON-name triple, capped at
    ``max_attrs`` per entity (a hub entity's million-edge description would
    otherwise ride the explode; slice keeps the deterministic sort-order
    prefix)."""
    names = (
        triples.filter(F.col("pred") == name_pred)
        .groupBy("subj")
        .agg(F.min(F.col("obj")).alias("name"))  # deterministic if multi-named
        .select(
            F.col("subj").alias("entity"),
            F.lower(F.regexp_replace(F.trim("name"), r"\s+", " ")).alias("block"),
        )
    )
    attrs = (
        triples.filter(F.col("pred") != name_pred)
        .groupBy("subj")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_set(F.md5(F.concat_ws("|", "pred", "obj")))
                ),
                1,
                max_attrs,
            ).alias("attrs")
        )
        .select(F.col("subj").alias("entity"), "attrs")
    )
    return names.join(attrs, "entity")


def blocked_same_as(
    profiles: DataFrame,
    threshold: float = 0.5,
    max_block: int = 1000,
    id_col: str = "entity",
    block_col: str = "block",
    attrs_col: str = "attrs",
) -> DataFrame:
    """(entity, block, attrs:array<string>) profiles → (src, dst, jaccard)
    same_as edges for pairs with attribute-set Jaccard ≥ ``threshold``.

    Blocks larger than ``max_block`` are dropped before pair generation
    (skew guard — a web-scale "no-name" block would dominate the join);
    pairs are canonical (src < dst), each emitted once."""
    ents = profiles.select(
        F.col(id_col).alias("entity"),
        F.col(block_col).alias("block"),
        F.array_distinct(F.col(attrs_col)).alias("attrs"),
    ).filter(F.size("attrs") > 0)
    block_sizes = ents.groupBy("block").agg(F.count(F.lit(1)).alias("bn"))
    kept = ents.join(
        block_sizes.filter(F.col("bn") <= max_block).select("block"), "block"
    )
    sizes = kept.select("entity", F.size("attrs").alias("sz"))
    inv = kept.select("entity", "block", F.explode("attrs").alias("attr"))
    a = inv.select(
        F.col("entity").alias("src"), "block", "attr"
    )
    b = inv.select(F.col("entity").alias("dst"), "block", "attr")
    inter = (
        a.join(b, ["block", "attr"])
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("entity").alias("src"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("entity").alias("dst"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "src")
        .join(sb, "dst")
        .select(
            "src",
            "dst",
            (F.col("i") / (F.col("sz_a") + F.col("sz_b") - F.col("i"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )


def fuzzy_blocked_same_as(
    profiles: DataFrame,
    threshold: float = 0.5,
    num_bands: int = 6,
    max_bucket: int = 1000,
    name_jaccard_min: float = 0.5,
    id_col: str = "entity",
    block_col: str = "block",
    attrs_col: str = "attrs",
) -> DataFrame:
    """Typo-tolerant variant of :func:`blocked_same_as`: instead of exact
    block-key equality, candidate pairs come from MinHash band collisions
    over the block string (the same seeded-xxhash64 2-gram bands as
    ``operators/fuzzy.py`` — "Acme Corp" and "Acme Corpp" now land in a
    shared bucket).  Precision is restored by two exact rescores on the
    bucketed shortlist: char-2-gram Jaccard of the names at/above
    ``name_jaccard_min``, then the usual attribute-set Jaccard at/above
    ``threshold``.

    Scale shape: ``num_bands`` rows per entity into the (band, sig)
    equi-join; buckets over ``max_bucket`` entities are dropped before
    pair generation (the same skew guard as the exact path — a
    stop-word-ish name floods its buckets).  Pairs carry the two gram/attr
    arrays through ONE join each for the in-expression intersects — per
    pair, never per corpus, and bounded by the bucket cap."""
    from tabbyld_spark.operators.fuzzy import _shingle

    ents = profiles.select(
        F.col(id_col).alias("entity"),
        F.col(block_col).alias("block"),
        F.array_distinct(F.col(attrs_col)).alias("attrs"),
    ).filter((F.size("attrs") > 0) & (F.col("block") != ""))
    # same seeded-xxhash64 band construction as fuzzy._band_rows, with the
    # entity id carried through (the shared helper drops non-key columns)
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(
                    f"array_min(transform(_grams, g -> xxhash64(g, {i})))"
                ).alias("sig"),
            )
            for i in range(int(num_bands))
        ]
    )
    banded = (
        _shingle(ents.select("entity", "block"), "block")
        .withColumn("_b", F.explode(bands))
        .select(
            "entity",
            "block",
            "_grams",
            F.col("_b.band").alias("band"),
            F.col("_b.sig").alias("sig"),
        )
    )
    bucket_sizes = banded.groupBy("band", "sig").agg(
        F.count(F.lit(1)).alias("bn")
    )
    kept = banded.join(
        bucket_sizes.filter(F.col("bn") <= max_bucket).select("band", "sig"),
        ["band", "sig"],
    )
    a = kept.select(
        "band", "sig", F.col("entity").alias("src"), F.col("_grams").alias("ga")
    )
    b = kept.select(
        "band", "sig", F.col("entity").alias("dst"), F.col("_grams").alias("gb")
    )
    pairs = (
        a.join(b, ["band", "sig"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", "ga", "gb")
        .dropDuplicates(["src", "dst"])  # a pair colliding in k bands: once
    )
    name_i = F.size(F.array_intersect("ga", "gb"))
    name_j = name_i / (F.size("ga") + F.size("gb") - name_i)
    named = pairs.filter(name_j >= F.lit(float(name_jaccard_min))).select(
        "src", "dst"
    )
    pa = ents.select(F.col("entity").alias("src"), F.col("attrs").alias("aa"))
    pb = ents.select(F.col("entity").alias("dst"), F.col("attrs").alias("ab"))
    i = F.size(F.array_intersect("aa", "ab"))
    return (
        named.join(pa, "src")
        .join(pb, "dst")
        .select(
            "src",
            "dst",
            (i / (F.size("aa") + F.size("ab") - i)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )


def resolve_entities(
    triples: DataFrame,
    name_pred: str,
    threshold: float = 0.5,
    max_block: int = 1000,
) -> DataFrame:
    """triples → (node, component) canonical-entity labels: profile, block,
    score, threshold, then connected components over the resulting
    same_as edges (the full S7 merge for description-level duplicates)."""
    from tabbyld_spark.operators.components import connected_components

    edges = blocked_same_as(
        er_profiles(triples, name_pred), threshold=threshold, max_block=max_block
    ).select("src", "dst")
    return connected_components(edges)
