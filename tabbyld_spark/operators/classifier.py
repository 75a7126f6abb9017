"""Trainable text quality classifier — hashed-feature logistic regression.

The quality filters modern corpora ship with are linear classifiers over
bag-of-n-gram features: fastText supervision in CCNet ("looks like
Wikipedia"), the FineWeb-Edu educational-quality scorer, GPT-3's
WebText-vs-CommonCrawl filter.  The repo's DSIR operator covers the
generative (two-LM) route; this module adds the DISCRIMINATIVE one, with
the same determinism contract hogwild SGD cannot give:

* features: the hashed word unigram+bigram counts of
  ``importance.hashed_ngram_counts`` (engine-portable md5 buckets);
* training: FULL-BATCH gradient descent on L2-regularized logistic loss,
  fixed iteration count and learning rate — per iteration one broadcast
  join of the weight vector onto the doc-feature rows, one doc-grain
  aggregate (the margin), one bucket-grain aggregate (the gradient),
  one tiny driver update.  No RNG, no sampling, no race: the trained
  weights are a pure function of (corpus, labels, hyperparameters), so
  retries, re-shards, and re-runs fit the identical model — verified
  against an identical-algorithm numpy reference in
  ``tests/test_classifier.py``;
* scoring: one broadcast join + doc-grain aggregate → per-doc probability;
  the filter is then a zero-shuffle threshold predicate.

Scale shape per iteration: the corpus-side work is two aggregations at
(doc) and (bucket) grain over the cached feature rows; the weight vector
(``n_buckets`` floats) rides a broadcast join each way.  Feature rows are
computed ONCE and cached — iterations never re-tokenize.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.lineage import cut
from tabbyld_spark.operators.importance import hashed_ngram_counts

__all__ = ["train_text_classifier", "score_text_classifier", "TextClassifier"]


class TextClassifier(NamedTuple):
    """(bucket, w) weight table + intercept; n_buckets for feature replay."""

    weights: DataFrame
    intercept: float
    n_buckets: int


def _margins(feats: DataFrame, weights: DataFrame, intercept: float) -> DataFrame:
    """(doc_id, bucket, cnt) × (bucket, w) → (doc_id, margin)."""
    return (
        feats.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            (
                F.sum(F.col("cnt") * F.coalesce(F.col("w"), F.lit(0.0)))
                + F.lit(float(intercept))
            ).alias("margin")
        )
    )


def train_text_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    n_iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> TextClassifier:
    """Fit logistic regression on hashed n-gram counts → TextClassifier.

    ``label_col`` is 0/1.  Feature counts are L1-normalized per document
    (the fastText convention — long documents must not dominate the
    gradient), and the learning rate is scaled by 1/n_docs inside the
    gradient, so ``lr`` transfers across corpus sizes."""
    sess = docs.sparkSession
    labeled = docs.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("y")
    )
    raw = hashed_ngram_counts(docs, n_buckets, text_col, id_col)
    doc_tot = raw.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    feats = cut(
        raw.join(doc_tot, "doc_id").select(
            "doc_id", "bucket", (F.col("cnt") / F.col("tot")).alias("cnt")
        )
    )
    n_docs = labeled.count()
    weights = sess.createDataFrame([], "bucket long, w double")
    intercept = 0.0
    for _ in range(int(n_iters)):
        resid = (
            _margins(feats, weights, intercept)
            .join(labeled, "doc_id")
            .select(
                "doc_id",
                (F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
                .alias("r"),
            )
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg((F.sum(F.col("cnt") * F.col("r")) / F.lit(float(n_docs))).alias("g"))
        )
        b0 = resid.agg((F.sum("r") / F.lit(float(n_docs))).alias("g")).collect()[0]["g"]
        stepped = (
            weights.join(grad, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("w"), F.lit(0.0)) * F.lit(1.0 - lr * l2)
                    + F.lit(float(lr)) * F.coalesce(F.col("g"), F.lit(0.0))
                ).alias("w"),
            )
        )
        weights = cut(stepped)
        intercept = intercept + float(lr) * float(b0 or 0.0)
    return TextClassifier(weights=weights, intercept=intercept, n_buckets=n_buckets)


def score_text_classifier(
    docs: DataFrame,
    model: TextClassifier,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, margin, prob): every doc scored under the model (same
    L1-normalized features as training); feature-less docs score the
    intercept alone.  Filtering is then ``prob >= t`` — zero shuffle."""
    raw = hashed_ngram_counts(docs, model.n_buckets, text_col, id_col)
    doc_tot = raw.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    feats = raw.join(doc_tot, "doc_id").select(
        "doc_id", "bucket", (F.col("cnt") / F.col("tot")).alias("cnt")
    )
    scored = _margins(feats, model.weights, model.intercept)
    base = docs.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("margin", F.lit(float(model.intercept))).alias("margin"),
        )
        .withColumn("prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
    )
