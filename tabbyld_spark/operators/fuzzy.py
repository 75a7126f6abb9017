"""Fuzzy candidate blocking — MinHash-LSH over character 3-grams.

Replaces the reference's case-insensitive substring/regex scan over all
DBpedia URIs (/root/reference/commands/SpreadsheetController.php:91): that is
an O(mentions × entities) cross product a SPARQL endpoint absorbs at LIMIT
100 but a 10^12-document pipeline cannot.  LSH gives candidate *blocking*
(band-bucketed join), then exact Levenshtein rescoring keeps precision.

Only mentions with no exact surface-form hit enter the fuzzy path (left-anti
join), so the expensive stage sees typo mentions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut

MAX_EDIT_DISTANCE = 3
# character 2-grams + a loose Jaccard-distance cut: one edit in a short name
# wipes out most of its gram set, so the block boundary must be generous —
# the exact Levenshtein post-filter restores precision
JACCARD_DIST_THRESHOLD = 0.8
# OR-amplified blocking: a pair collides when ANY of the NUM_BANDS
# single-minhash signatures matches (P[collide] = 1-(1-s)^12 for Jaccard
# similarity s) — the same amplification shape MLlib's MinHashLSH
# numHashTables=12 used before this was re-expressed as pure columnar
# expressions (hand-rolled minhash stays inside whole-stage codegen; the
# MLlib vector/UDF path cost ~7s of the 12k-page candidates phase by itself)
NUM_BANDS = 12


def _shingle(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(
        "_grams",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({col})-1, 1)),"
            f" i -> substring({col}, i, 2)))"
        ),
    )


def _band_rows(df: DataFrame, col: str, num_bands: int) -> DataFrame:
    """(col, _grams, band, sig): one row per band, sig = the band's minhash
    (min seeded xxhash64 over the string's 2-gram set).  All expressions —
    no vectors, no Python."""
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(
                    f"array_min(transform(_grams, g -> xxhash64(g, {i})))"
                ).alias("sig"),
            )
            for i in range(num_bands)
        ]
    )
    return (
        _shingle(df, col)
        .withColumn("_b", F.explode(bands))
        .select(col, "_grams", F.col("_b.band").alias("band"), F.col("_b.sig").alias("sig"))
    )


def lsh_fuzzy_candidates(
    mentions: DataFrame,
    kg_labels: DataFrame,
    max_edit: int = MAX_EDIT_DISTANCE,
    threshold: float = JACCARD_DIST_THRESHOLD,
) -> DataFrame:
    """→ (mention_key, entity) for typo mentions (surrogate-keyed; the
    mention payload rejoins in generate_candidates).

    Deterministic: fixed minhash seeds (the band index), exact Jaccard +
    Levenshtein post-filters.
    """
    from tabbyld_spark.operators.features import ensure_keys

    missed = (
        ensure_keys(mentions)
        .join(
            kg_labels.select(F.col("surface_form").alias("mention_norm")),
            "mention_norm",
            "left_anti",
        )
        .select("mention_key", "mention_norm")
        .filter(F.length("mention_norm") >= 3)
        # two consumers below (vocabulary + payload rejoin) — materialize
        # once; also bounds the optimizer's tree, which otherwise folds the
        # 12-band expression forest into both consumers (measured 2.5x the
        # whole function's wall time in driver-side planning alone)
        .transform(cut)
    )
    # distinct normalized strings: LSH work scales with vocabulary, not cells
    m_keys = missed.select("mention_norm").distinct()
    labels = kg_labels.select("entity", "surface_form").filter(
        F.length("surface_form") >= 3
    )
    l_keys = labels.select("surface_form").distinct()

    a = _band_rows(m_keys, "mention_norm", NUM_BANDS)
    b = _band_rows(l_keys, "surface_form", NUM_BANDS)
    collided = (
        a.join(b.withColumnRenamed("_grams", "_grams_b"), ["band", "sig"])
        # a pair colliding in k bands appears k times: reduce to one row
        # per pair (carrying each side's gram set) before the exact filters
        .groupBy("mention_norm", "surface_form")
        .agg(F.first("_grams").alias("_ga"), F.first("_grams_b").alias("_gb"))
    )
    jd = 1 - (
        F.size(F.array_intersect("_ga", "_gb"))
        / F.size(F.array_union("_ga", "_gb"))
    )
    pairs = (
        collided.filter(jd <= threshold)
        .filter(F.levenshtein("mention_norm", "surface_form") <= max_edit)
        .select("mention_norm", "surface_form")
        # tiny (surviving typo-pair vocabulary); cutting here keeps the
        # band-join subtree out of the downstream candidate-union plan
        .transform(cut)
    )
    return (
        missed.join(pairs, "mention_norm")
        .join(labels, "surface_form")
        .select("mention_key", "entity")
        .distinct()
    )
