"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) picks raw-corpus documents that look like a small target
corpus: fit two bag-of-hashed-n-grams unigram models — p_target over the
target sample, p_raw over the raw pool — and weight every raw document by
its log importance ratio

    log w(x) = Σ_features  c_f(x) · ( log p_target[f] − log p_raw[f] )

then keep the top slice (or Gumbel-resample, which this module makes
deterministic).  Re-expressed as three aggregations and one broadcast join:

* features (:func:`hashed_ngram_counts`): lower-cased word unigrams +
  bigrams hashed into ``n_buckets`` by the first 8 hex digits of md5 — the
  same engine-portable hash trick as ``sampling.hash_uniform``, so the
  DuckDB twin reproduces buckets bit-identically.  One codegen projection
  (one-pass ``regexp_extract_all`` tokenization, ``zip_with``-of-slices
  bigrams — never per-offset substring) + one explode + one
  (doc, bucket)-grain map-side-combined count.
* fit (:func:`fit_importance_model`): per-bucket counts of each corpus
  aggregated to the bucket table (≤ ``n_buckets`` rows — thousands, always
  broadcastable), densified over ``spark.range(n_buckets)`` with add-alpha
  smoothing so every bucket has both probabilities.  Corpus totals ride a
  broadcast 1-row cross join — the whole fit is lazy, no driver action.
* score (:func:`importance_weights`): doc features joined against the
  BROADCAST bucket table, one doc-grain aggregate.  Docs with no features
  (empty text) come back with weight 0 via the join-back, so the output is
  total over the input.

Scale shape: the raw corpus is touched by exactly two passes (one to fit
p_raw, one to score), each a projection + explode + one combine-heavy
shuffle at (doc, bucket) grain; the model itself never exceeds
``n_buckets`` rows.  Selection at scale is a zero-shuffle threshold filter
(:func:`select_by_weight`) — the threshold comes from a quantile sketch or
a known budget, never a global sort.  The deterministic Gumbel key makes
the paper's resampling reproducible under retries and re-sharding: the
noise is a pure function of (seed, doc_id), so a re-run or a different
partitioning keeps the exact same sample.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.operators.sampling import hash_uniform

__all__ = [
    "hashed_ngram_counts",
    "fit_importance_model",
    "importance_weights",
    "select_by_weight",
    "ImportanceModel",
]

# shared with the SQL twin: lower-cased alnum word runs
WORD_RE = r"[a-z0-9]+"


def _words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(WORD_RE), 0)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """md5-hash a feature string into [0, n_buckets) — engine-portable
    (first 8 hex digits parsed as an int, mod n_buckets)."""
    return F.pmod(
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def hashed_ngram_counts(
    docs: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, bucket, cnt): hashed word unigram+bigram counts per
    document.  One projection builds both gram arrays in-expression; the
    explode is the only row blowup (one row per gram occurrence), and the
    (doc, bucket) count combines map-side before its shuffle."""
    w = _words(text_col)
    n = F.size(w)
    bi = F.zip_with(
        F.slice(w, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(w, bi)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
        .select("doc_id", _bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


class ImportanceModel(NamedTuple):
    """The fitted bucket table: (bucket, log_ratio) for every bucket in
    [0, n_buckets) — dense, tiny, broadcast at scoring time."""

    buckets: DataFrame
    n_buckets: int


def _bucket_totals(counts: DataFrame, name: str) -> DataFrame:
    return counts.groupBy("bucket").agg(F.sum("cnt").alias(name))


def fit_importance_model(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ImportanceModel:
    """Fit p_target / p_raw over hashed n-gram buckets with add-alpha
    smoothing → per-bucket ``log_ratio = log p_t − log p_r``, dense over
    all ``n_buckets`` buckets (unseen buckets get the smoothing-only
    ratio).  Fully lazy: totals ride a broadcast 1-row cross join."""
    sess = target_docs.sparkSession
    tc = _bucket_totals(
        hashed_ngram_counts(target_docs, n_buckets, text_col, id_col), "t_cnt"
    )
    rc = _bucket_totals(
        hashed_ngram_counts(raw_docs, n_buckets, text_col, id_col), "r_cnt"
    )
    totals = (
        tc.agg(F.sum("t_cnt").alias("t_total"))
        .crossJoin(rc.agg(F.sum("r_cnt").alias("r_total")))
        .select(
            F.coalesce("t_total", F.lit(0)).alias("t_total"),
            F.coalesce("r_total", F.lit(0)).alias("r_total"),
        )
    )
    dense = (
        sess.range(n_buckets)
        .select(F.col("id").alias("bucket"))
        .join(tc, "bucket", "left")
        .join(rc, "bucket", "left")
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(float(alpha))
    z = F.lit(float(alpha * n_buckets))
    log_p_t = F.log((F.coalesce("t_cnt", F.lit(0)) + a) / (F.col("t_total") + z))
    log_p_r = F.log((F.coalesce("r_cnt", F.lit(0)) + a) / (F.col("r_total") + z))
    return ImportanceModel(
        dense.select("bucket", (log_p_t - log_p_r).alias("log_ratio")),
        n_buckets,
    )


def importance_weights(
    docs: DataFrame,
    model: ImportanceModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "dsir",
) -> DataFrame:
    """→ (doc_id, n_features, log_weight, sample_key): every input doc's
    log importance ratio under the fitted model, plus the deterministic
    Gumbel resampling key ``log_weight + (−log(−log u))`` with
    ``u = hash_uniform(seed, doc_id)`` — the paper's Gumbel-top-k sampling
    made a pure function of (seed, doc_id), so retries and re-shards draw
    the identical sample.  Feature-less docs score 0 with n_features 0."""
    feats = hashed_ngram_counts(docs, model.n_buckets, text_col, id_col)
    scored = (
        feats.join(F.broadcast(model.buckets), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_features"),
            F.sum(F.col("cnt") * F.col("log_ratio")).alias("log_weight"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )
    gumbel = -F.log(-F.log(hash_uniform(F.col("doc_id"), seed=seed)))
    return out.withColumn("sample_key", F.col("log_weight") + gumbel)


def select_by_weight(
    weighted: DataFrame, threshold: float, key_col: str = "log_weight"
) -> DataFrame:
    """The scale-path selection: keep rows with ``key_col`` ≥ threshold —
    a zero-shuffle filter.  The threshold comes from a budget or a
    quantile sketch (``approxQuantile``), NEVER a global sort; pass
    ``key_col='sample_key'`` for the Gumbel-resampled variant."""
    return weighted.filter(F.col(key_col) >= F.lit(float(threshold)))
