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

from pyspark.ml.feature import HashingTF, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_EDIT_DISTANCE = 3
# character 2-grams + a loose Jaccard-distance cut: one edit in a short name
# wipes out most of its gram set, so the block boundary must be generous —
# the exact Levenshtein post-filter restores precision
JACCARD_DIST_THRESHOLD = 0.8


def _shingle(df: DataFrame, col: str) -> DataFrame:
    return df.withColumn(
        "_grams",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({col})-1, 1)),"
            f" i -> substring({col}, i, 2)))"
        ),
    )


def lsh_fuzzy_candidates(
    mentions: DataFrame,
    kg_labels: DataFrame,
    max_edit: int = MAX_EDIT_DISTANCE,
    threshold: float = JACCARD_DIST_THRESHOLD,
) -> DataFrame:
    """→ (mention_key, entity) for typo mentions (surrogate-keyed; the
    mention payload rejoins in generate_candidates).

    Deterministic: fixed LSH seed, exact Levenshtein post-filter.
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
    )
    # distinct normalized strings: LSH work scales with vocabulary, not cells
    m_keys = missed.select("mention_norm").distinct()
    labels = kg_labels.select("entity", "surface_form").filter(
        F.length("surface_form") >= 3
    )
    l_keys = labels.select("surface_form").distinct()

    tf = HashingTF(inputCol="_grams", outputCol="_vec", numFeatures=1 << 18, binary=True)
    a = tf.transform(_shingle(m_keys, "mention_norm"))
    b = tf.transform(_shingle(l_keys, "surface_form"))
    lsh = MinHashLSH(inputCol="_vec", outputCol="_hashes", numHashTables=12, seed=42)
    model = lsh.fit(b)
    joined = model.approxSimilarityJoin(a, b, threshold, distCol="_jd")
    pairs = joined.select(
        F.col("datasetA.mention_norm").alias("mention_norm"),
        F.col("datasetB.surface_form").alias("surface_form"),
    ).filter(
        F.levenshtein("mention_norm", "surface_form") <= max_edit
    )
    return (
        missed.join(pairs, "mention_norm")
        .join(labels, "surface_form")
        .select("mention_key", "entity")
        .distinct()
    )
