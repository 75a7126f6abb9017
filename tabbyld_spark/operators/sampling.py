"""Deterministic corpus mixture sampling — per-key rates, hash-Bernoulli.

Training-data pipelines re-weight sources before packing ("2 epochs of
wiki, 0.3 of common crawl" — the mixture tables every LLM paper publishes):
each document is kept/dropped/REPEATED according to its group's rate.  At
100 TB this must be a pure function of the document id, never an RNG:

* re-running the job, re-sharding the corpus, or retrying a task must pick
  the SAME documents (an RNG-per-partition sample silently changes the
  corpus under retry, which poisons ablations);
* changing one source's rate must not disturb which documents the OTHER
  sources keep (per-id hashing gives that for free; a global sort-sample
  does not).

Mechanics: ``u = (first 8 hex digits of md5(seed ':' id)) / 2^32`` — a
uniform in [0,1) both engines can compute bit-identically (the same trick
as ``textstats.train_split``, seeded so independent sampling passes draw
independent uniforms).  A rate r keeps ``floor(r)`` copies plus one more
iff ``u < r - floor(r)`` — so r=0.25 is a 25% Bernoulli keep, r=2.5 is
"2 copies always, a 3rd for half the docs", and E[copies] = r exactly.

Scale shape: :func:`sample_decisions` is one whole-stage-codegen projection
(rates fold into the plan as a literal CASE chain — a mixture table is a
handful of sources; pass a DataFrame to get a broadcast join instead);
:func:`sample_corpus` adds one explode at copy grain.  Zero shuffle either
way."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_uniform(col: Column | str, seed: str = "") -> Column:
    """Deterministic uniform in [0,1): md5 of ``seed ':' value``, first 8
    hex digits, divided by 2^32.  Pure function of (seed, value) — identical
    across runs, partitionings, and engines."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), c.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(2**32))


def sample_decisions(
    docs: DataFrame,
    rates: dict[str, float] | DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """``docs`` plus the mixture decision columns — ``rate`` (the key's
    mixture rate), ``u`` (the doc's deterministic uniform), ``n_copies``
    (floor(rate) + (u < frac(rate))) — WITHOUT materializing the copies;
    :func:`sample_corpus` explodes them.  ``rates``: a small dict (folds
    into the plan as a literal CASE chain, zero shuffle) or a DataFrame
    with columns (``key_col``, ``rate``) (broadcast left join; missing
    keys fall back to ``default_rate``)."""
    u = hash_uniform(id_col, seed=seed)
    if isinstance(rates, dict):
        rate: Column = F.lit(float(default_rate))
        for k, r in rates.items():
            rate = F.when(F.col(key_col) == k, F.lit(float(r))).otherwise(rate)
        staged = docs.select("*", rate.alias("rate"))
    else:
        rt = F.broadcast(
            rates.select(
                F.col(key_col).alias("_mix_key"), F.col("rate").cast("double").alias("rate")
            )
        )
        staged = (
            docs.join(rt, docs[key_col] == rt["_mix_key"], "left")
            .drop("_mix_key")
            .withColumn("rate", F.coalesce("rate", F.lit(float(default_rate))))
        )
    return staged.select(
        "*",
        u.alias("u"),
        (
            F.floor("rate")
            + F.when(u < F.col("rate") - F.floor("rate"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("n_copies"),
    )


def sample_corpus(
    docs: DataFrame,
    rates: dict[str, float] | DataFrame,
    key_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    seed: str = "mix",
) -> DataFrame:
    """The mixed corpus: every input row repeated ``n_copies`` times
    (0 drops it), with ``copy_id`` (0-based) distinguishing repeats so
    downstream ids stay unique.  Decision columns are dropped; E[rows per
    input row] = its key's rate, exactly."""
    dec = sample_decisions(
        docs, rates, key_col=key_col, id_col=id_col,
        default_rate=default_rate, seed=seed,
    )
    out_cols = [c for c in docs.columns]
    return (
        dec.filter(F.col("n_copies") > 0)
        .select(
            *out_cols,
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias("copy_id"),
        )
    )
