"""Composed training-data prep chain: gate invariants + stage monotonicity
+ per-source curation rollup consistency."""

from pyspark.sql import functions as F

from tabbyld_spark.plans.dataprep import curation_report, prep_corpus


def _docs(spark, with_source=False):
    sf = "/root/testdata/sf0.001"
    cols = ["doc_id", "text"] + (["source"] if with_source else [])
    return spark.read.parquet(f"{sf}/documents.parquet").select(*cols)


def test_gates_hold(spark):
    out = prep_corpus(_docs(spark)).cache()
    n = out.count()
    assert n > 0
    assert out.filter(F.col("pred_lang") != "en").count() == 0
    assert out.filter(F.col("n_tokens") < 20).count() == 0
    assert out.filter(F.col("punct_ratio") > 0.25).count() == 0
    assert out.filter(F.col("stopword_ratio") < 0.01).count() == 0
    # survivors are unique docs
    assert out.select("doc_id").distinct().count() == n


def test_thresholds_monotone(spark):
    docs = _docs(spark)
    loose = prep_corpus(docs, min_tokens=1, max_punct_ratio=1.0, min_stopword_ratio=0.0)
    tight = prep_corpus(docs, min_tokens=30)
    n_loose, n_tight = loose.count(), tight.count()
    assert n_tight <= n_loose
    # tight survivors are a subset of loose survivors
    assert (
        tight.select("doc_id")
        .join(loose.select("doc_id"), "doc_id", "left_anti")
        .count()
        == 0
    )


def test_training_sequences_end_to_end(spark):
    from tabbyld_spark.plans.dataprep import prep_training_sequences

    docs = _docs(spark)
    out = prep_training_sequences(
        docs, max_tokens=32, overlap=8, seq_len=256, n_buckets=8
    ).cache()
    surv = prep_corpus(docs)
    # every surviving doc produced at least one chunk; no non-survivor leaked
    assert out.select("doc_id").distinct().count() == surv.count()
    assert (
        out.select("doc_id").distinct()
        .join(surv.select("doc_id"), "doc_id", "left_anti")
        .count()
        == 0
    )
    # chunk sizes within bounds, packs within each bucket start at 0
    assert out.filter(F.col("n_chunk_tokens") > 32).count() == 0
    assert out.filter(F.col("n_chunk_tokens") < 1).count() == 0
    assert out.groupBy("bucket").agg(F.min("pack_id").alias("m")).filter(
        F.col("m") != 0
    ).count() == 0
    # deterministic under re-sharding: same (seq_key → pack_id) for any input
    # partitioning (the guarantee the md5 bucket + key order exist to give)
    again = prep_training_sequences(
        docs.repartition(13), max_tokens=32, overlap=8, seq_len=256, n_buckets=8
    )
    assert (
        out.select("seq_key", "bucket", "pack_id")
        .exceptAll(again.select("seq_key", "bucket", "pack_id"))
        .count()
        == 0
    )


def test_curation_report_consistent(spark):
    docs = _docs(spark, with_source=True)
    surv = prep_corpus(docs.select("doc_id", "text"))
    rep = curation_report(docs, surv).cache()
    # doc grain preserved: one row per survivor, none invented or lost
    assert rep.count() == surv.count()
    assert rep.select("doc_id").distinct().count() == surv.count()
    # rollup columns are internally consistent at source grain
    per_src = rep.select("source", "n_src_docs", "n_src_kept", "src_keep_rate").distinct()
    assert per_src.count() == rep.select("source").distinct().count()
    bad = per_src.filter(
        (F.col("n_src_kept") > F.col("n_src_docs"))
        | (F.abs(F.col("src_keep_rate") - F.round(F.col("n_src_kept") / F.col("n_src_docs"), 6)) > 1e-9)
    )
    assert bad.count() == 0
    # n_src_kept really counts the surviving rows of that source
    recount = rep.groupBy("source").count()
    assert (
        per_src.join(recount, "source")
        .filter(F.col("n_src_kept") != F.col("count"))
        .count()
        == 0
    )
    # n_src_docs really counts the corpus rows of that source
    totals = docs.groupBy("source").count()
    assert (
        per_src.join(totals, "source")
        .filter(F.col("n_src_docs") != F.col("count"))
        .count()
        == 0
    )
