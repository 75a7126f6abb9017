"""Unigram language-model document scoring — the CCNet-style quality signal.

Web-crawl curation pipelines (CCNet, Wenzek et al. 2019; Gopher, Rae et
al. 2021 §A1.2) bucket documents by perplexity under a language model
trained on a trusted reference corpus: pages whose token distribution is
far from the reference (boilerplate, gibberish, SEO spam, wrong-language
residue that survived langid) score a high negative log-likelihood and are
dropped or down-sampled.  The reference PHP pipeline has no LM stage — this
operator extends the engine's webtext-prep inventory (SURVEY §2.3 /
README W-stages) the way `quality_stats` and `gopher_repetition` do.

Design for 100 TB:

* **Training is two aggregations.** Token counting is one shuffle at token
  grain with map-side partial aggregation (`groupBy(token).count()`); the
  corpus totals (N tokens, V vocabulary) are a single global aggregate of
  the *vocabulary-sized* count table, not of the corpus.  The trained model
  is a `(token, logp)` table no larger than the vocabulary — millions of
  rows for a trillion-token corpus, i.e. broadcastable or at worst a cheap
  shuffle-join build side.
* **Scoring is one broadcast join + one doc-grain aggregate.** Documents
  explode to token grain map-side, probe the broadcast probability table,
  and aggregate back to document grain with partial aggregation — exactly
  one shuffle, sized by document count, not token count.  The broadcast is
  gated through `adaptive_broadcast` so an over-large vocabulary falls back
  to a shuffle join instead of OOM-ing the driver.
* **Everything is JVM-side.**  Tokenization is the shared whitespace
  tokenizer (`textstats.tokens`, same as the SQL oracle), smoothing is an
  add-alpha closed form computed in column expressions; no Python runs per
  row.

Smoothing: add-alpha (Lidstone).  With corpus token count N, vocabulary
size V and pseudo-count alpha:

    p(t) = (c_t + alpha) / (N + alpha * (V + 1))        seen token
    p(oov) = alpha / (N + alpha * (V + 1))              unseen token

(the +1 reserves one slot of probability mass for the OOV bucket, so the
model is a proper distribution over V+1 outcomes).

The DuckDB twin in ``__spark_entry__.oracle_sql`` re-derives the same
closed form from the same deterministic training slice, making the
two-engine check cover training *and* scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.joins import adaptive_broadcast
from tabbyld_spark.operators.textstats import tokens

__all__ = ["train_unigram_lm", "lm_score"]


def _token_grain(docs: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """Explode to (keep..., token) grain; tokens are lowercased so the LM is
    case-insensitive (CCNet normalizes case before scoring)."""
    return docs.select(
        *keep, F.explode(tokens(text_col)).alias("_raw")
    ).select(*keep, F.lower(F.col("_raw")).alias("token"))


def train_unigram_lm(
    train_docs: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Train an add-alpha unigram LM on ``train_docs``.

    Returns ``(lm, oov)``:

    * ``lm`` — one row per distinct lowercased token: ``(token, logp)``.
    * ``oov`` — a single row ``(oov_logp, n_train_tokens, train_vocab)``
      carrying the unseen-token log-probability and the training totals
      (useful for lineage/metrics rows).

    ``min_count`` prunes the emitted table to tokens seen at least that
    often (totals are still computed over the full count table, so pruning
    never changes a retained token's probability; pruned tokens score as
    OOV).  Zipf's tail means min_count=2 alone shrinks a web-scale
    vocabulary by ~half, keeping the model broadcastable — the standard
    CCNet/KenLM vocabulary cut.
    """
    counts = (
        _token_grain(train_docs, text_col, [])
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if min_count > 1:
        pruned = counts.filter(F.col("c") >= min_count)
    else:
        pruned = counts
    totals = counts.agg(
        F.sum("c").alias("n_train_tokens"),
        F.count(F.lit(1)).alias("train_vocab"),
    )
    denom = F.col("n_train_tokens") + alpha * (F.col("train_vocab") + 1)
    lm = pruned.join(F.broadcast(totals)).select(
        "token", F.log((F.col("c") + alpha) / denom).alias("logp")
    )
    oov = totals.select(
        F.log(alpha / denom).alias("oov_logp"),
        "n_train_tokens",
        "train_vocab",
    )
    return lm, oov


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    oov: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_rows: int | None = None,
) -> DataFrame:
    """Score each document's mean per-token negative log-likelihood under a
    trained unigram LM.

    Returns one row per document: ``(id_col, lm_nll, n_oov, n_scored)``
    where ``lm_nll`` is the mean negative log-probability (perplexity =
    exp(lm_nll); kept in log space to avoid overflow on adversarial pages),
    ``n_oov`` counts tokens unseen in training, ``n_scored`` the tokens
    scored.  Plan shape: map-side explode → broadcast-gated hash join on
    token → one doc-grain aggregate with map-side combine.

    ``vocab_rows``: exact vocabulary row count when the caller has
    materialized the LM (e.g. after a catalog write) — routes the broadcast
    decision through the exact-count gate instead of Catalyst's derived
    estimate, exactly like the pipeline's CEA join-backs.  Without it the
    vocabulary-sized table is assumed broadcastable (a pruned unigram vocab
    is MBs, not GBs); an over-large un-counted vocab should be materialized
    and counted first.
    """
    if vocab_rows is not None:
        from tabbyld_spark.functions.joins import count_gated_hint

        lm_hinted = count_gated_hint(lm, vocab_rows)
    else:
        lm_hinted = adaptive_broadcast(lm, assume_small=True)
    tok = _token_grain(docs, text_col, [id_col])
    probe = tok.join(lm_hinted, "token", "left")
    scored = probe.join(F.broadcast(oov.select("oov_logp")))
    return scored.groupBy(id_col).agg(
        F.avg(-F.coalesce(F.col("logp"), F.col("oov_logp"))).alias("lm_nll"),
        F.sum(F.col("logp").isNull().cast("long")).alias("n_oov"),
        F.count(F.lit(1)).alias("n_scored"),
    )
