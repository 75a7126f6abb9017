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
  fixed iteration count and learning rate.  The weight vector is
  bucket-sized (thousands of floats), so it lives DRIVER-SIDE and enters
  each iteration's plan as a literal map — no weight join, no per-round
  lineage cut; one iteration is exactly ONE Spark action (the doc-grain
  margin aggregate, the residual join, and the bucket-grain gradient all
  execute inside the single job that collects the ≤``n_buckets``+1
  gradient rows, the intercept gradient riding along as a sentinel row).
  No RNG, no sampling, no race: the trained weights are a pure function
  of (corpus, labels, hyperparameters), so retries, re-shards, and
  re-runs fit the identical model — verified against an
  identical-algorithm numpy reference in ``tests/test_classifier.py``;
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
    from pyspark.sql import Window

    sess = docs.sparkSession
    labeled = docs.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("y")
    )
    raw = hashed_ngram_counts(docs, n_buckets, text_col, id_col)
    doc_tot = raw.groupBy("doc_id").agg(F.sum("cnt").alias("tot"))
    # labels ride the cached feature rows: iterations never join or re-read
    feats = cut(
        raw.join(doc_tot, "doc_id")
        .join(labeled, "doc_id")
        .select(
            "doc_id", "bucket", (F.col("cnt") / F.col("tot")).alias("cnt"), "y"
        )
    )
    n_docs = labeled.count()
    win = Window.partitionBy("doc_id")
    w: dict[int, float] = {}
    intercept = 0.0
    for _ in range(int(n_iters)):
        if w:
            pairs = [x for k, v in sorted(w.items()) for x in (F.lit(k), F.lit(v))]
            wm = F.create_map(*pairs)
            wexpr = F.coalesce(F.try_element_at(wm, F.col("bucket")), F.lit(0.0))
        else:
            wexpr = F.lit(0.0)
        # doc margin via a window over the feature rows (no join), residual
        # per row, then ONE bucket-grain aggregate collects the gradient —
        # the intercept gradient rides as a sentinel bucket, each row
        # contributing its doc's residual divided by the doc's row count
        staged = feats.select(
            "bucket",
            "cnt",
            "y",
            (F.sum(F.col("cnt") * wexpr).over(win) + F.lit(float(intercept))).alias(
                "margin"
            ),
            F.count(F.lit(1)).over(win).alias("nrows"),
        )
        r = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
        contrib = staged.select(
            F.explode(
                F.array(
                    F.struct(F.col("bucket"), (F.col("cnt") * r).alias("v")),
                    F.struct(
                        F.lit(-1).cast("long").alias("bucket"),
                        (r / F.col("nrows")).alias("v"),
                    ),
                )
            ).alias("c")
        )
        rows = (
            contrib.groupBy(F.col("c.bucket").alias("bucket"))
            .agg((F.sum("c.v") / F.lit(float(n_docs))).alias("g"))
            .collect()
        )  # ONE action per iteration
        b0 = 0.0
        g_by_bucket: dict[int, float] = {}
        for r_ in rows:
            if r_["bucket"] == -1:
                b0 = float(r_["g"] or 0.0)
            else:
                g_by_bucket[int(r_["bucket"])] = float(r_["g"] or 0.0)
        decay = 1.0 - lr * l2
        touched = set(w) | set(g_by_bucket)
        w = {
            k: w.get(k, 0.0) * decay + lr * g_by_bucket.get(k, 0.0)
            for k in touched
        }
        intercept = intercept + float(lr) * b0
    weights = sess.createDataFrame(
        sorted(w.items()) or [(None, None)], "bucket long, w double"
    )
    if not w:
        weights = weights.filter(F.col("bucket").isNotNull())
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
