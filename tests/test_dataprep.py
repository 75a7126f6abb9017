"""Composed training-data prep chain: gate invariants + stage monotonicity."""

from pyspark.sql import functions as F

from tabbyld_spark.plans.dataprep import prep_corpus


def _docs(spark):
    sf = "/root/testdata/sf0.001"
    return spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")


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
