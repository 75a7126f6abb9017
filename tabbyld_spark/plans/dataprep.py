"""Training-data corpus preparation — the composed LLM-data pipeline.

Chains the individually-oracled document operators into the shape a
web-scale training-data prep job actually runs:

    S1 exact dedup          keep the min-id doc of each byte-identical group
    S2 near-dup collapse    keep the min-id doc of each 32-bit SimHash bucket
                            (identical simhash ⇒ near-identical token bag —
                            deterministic and SQL-twinnable, unlike banded
                            Hamming neighbours which stay on the MinHash/LSH
                            approximate surfaces)
    S3 language filter      heuristic stopword-vote language id == target
    S4 quality gate         token count + punctuation + stopword-ratio cuts

Every stage is columnar (window dedups, no joins wider than doc_id), so the
whole chain is three hash shuffles on doc-grain keys plus the per-doc
expression work — nothing quadratic, nothing driver-side.  The composed
query has a full DuckDB twin built from the same per-operator SQL fragments
(__spark_entry__.oracle_sql: q_dedup_exact / q_simhash / q_langid /
q_quality), so the driver's two-engine check covers the composition, not
just the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabbyld_spark.functions.joins import adaptive_broadcast
from tabbyld_spark.operators.dedup import exact_dedup, simhash
from tabbyld_spark.operators.textstats import language_id, quality_stats


def prep_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.25,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """→ survivors (doc_id, pred_lang, n_chars, n_tokens, punct_ratio,
    stopword_ratio) after S1–S4.  Ratio columns are rounded for the
    cross-engine compare; the gates cut on the raw values."""
    from tabbyld_spark.functions.lineage import cut

    # each stage's survivor set is consumed twice (its own aggregate + the
    # join probe, or two downstream feature scans) — without cuts the input
    # re-evaluates 2x PER STAGE, compounding to 8x on the raw docs
    d1 = exact_dedup(docs)
    s1 = cut(
        docs.join(
            d1.filter(F.col("doc_id") == F.col("keep_id")).select("doc_id"),
            "doc_id",
        )
    )
    sh = simhash(s1)
    s2_keep = (
        sh.withColumn(
            "_keep", F.min("doc_id").over(Window.partitionBy("simhash"))
        )
        .filter(F.col("doc_id") == F.col("_keep"))
        .select("doc_id")
    )
    s2 = cut(s1.join(s2_keep, "doc_id"))
    li = language_id(s2)
    q = quality_stats(s2)
    return (
        q.join(li, "doc_id")
        .filter(F.col("pred_lang") == lang)
        .filter(F.col("n_tokens") >= min_tokens)
        .filter(F.col("punct_ratio") <= max_punct_ratio)
        .filter(F.col("stopword_ratio") >= min_stopword_ratio)
        .select(
            "doc_id",
            "pred_lang",
            "n_chars",
            "n_tokens",
            F.round("punct_ratio", 6).alias("punct_ratio"),
            F.round("stopword_ratio", 6).alias("stopword_ratio"),
        )
    )


def curation_report(
    docs: DataFrame, survivors: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Per-source curation rollup joined back onto the doc-grain survivors:
    every surviving row carries its source's corpus size, survivor count and
    keep rate — the per-domain report a crawl-curation job publishes so
    operators can spot domains the filters are eating (keep_rate ≈ 0) or
    passing wholesale (≈ 1).

    Scale shape: two (source)-grain hash aggregations (map-side partial, so
    the exchanges carry one row per source per task, never doc-grain), one
    source-grain join between them, and a size-gated broadcast join back to
    the survivors — at web scale the rollup is |domains| rows; the gate
    (``adaptive_broadcast``) demotes to a shuffle join when the domain
    dimension outgrows the broadcast threshold instead of OOMing the driver.
    Sources whose docs were all filtered out vanish from the doc-grain
    output by construction (nothing to annotate), so the inner joins lose
    nothing."""
    totals = docs.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_src_docs")
    )
    kept = survivors.join(docs.select("doc_id", source_col), "doc_id")
    stats = kept.groupBy(source_col).agg(
        F.count("*").cast("long").alias("n_src_kept")
    )
    rollup = totals.join(stats, source_col).withColumn(
        "src_keep_rate", F.round(F.col("n_src_kept") / F.col("n_src_docs"), 6)
    )
    return kept.join(adaptive_broadcast(rollup), source_col)


def prep_training_sequences(
    docs: DataFrame,
    lang: str = "en",
    max_tokens: int = 128,
    overlap: int = 16,
    seq_len: int = 2048,
    n_buckets: int = 1024,
) -> DataFrame:
    """The full corpus → model-ready path: prep_corpus (dedup → near-dup →
    language → quality) → chunk_documents (overlapping token windows) →
    pack_sequences (contiguous fill into seq_len token budgets).

    → (seq_key, doc_id, chunk_id, chunk_text, n_chunk_tokens, bucket,
    cum_tokens, pack_id).  ``seq_key`` ('doc_id#chunk_id') is the packing
    order/bucket key — a pure function of ids, so the pack assignment is
    deterministic under any partitioning or re-sharding of the corpus (the
    same property train_split guarantees for the split).  Order within a
    bucket is the string order of seq_key: arbitrary but stable, which is
    what packing needs (training loaders shuffle packs anyway).

    Scale shape: the chain adds ZERO shuffles beyond its parts — survivors
    join text at doc grain, chunking is projection+explode, packing is the
    one bucket exchange + per-bucket window sort."""
    from tabbyld_spark.operators.chunking import chunk_documents, pack_sequences

    surv = prep_corpus(docs, lang=lang).select("doc_id")
    kept = docs.join(surv, "doc_id").select("doc_id", "text")
    chunks = chunk_documents(kept, max_tokens=max_tokens, overlap=overlap)
    keyed = chunks.withColumn(
        "seq_key", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
    )
    return pack_sequences(
        keyed,
        seq_len=seq_len,
        n_buckets=n_buckets,
        id_col="seq_key",
        tokens_col="n_chunk_tokens",
    )
