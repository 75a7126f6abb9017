"""HTML extraction: byte-identical text invariant (BASELINE.json input_hint)
and table-region recovery, through the actual Spark pandas-UDF path."""

from pyspark.sql import functions as F

from tabbyld_spark.extract.html import extract_content, extract_pages


def test_extract_content_pure(pages_fx):
    for _, r in pages_fx.pages.iterrows():
        text, _tables = extract_content(r.html)
        assert text == r.text, r.url


def test_extract_pages_spark_byte_identical(spark, pages_fx):
    df = spark.createDataFrame(pages_fx.pages)
    out = extract_pages(df)
    mismatches = out.filter(F.col("extracted_text") != F.col("text")).count()
    assert mismatches == 0
    assert out.count() == len(pages_fx.pages)


def test_extract_tables_structure(spark, pages_fx):
    df = spark.createDataFrame(pages_fx.pages.head(40))
    out = extract_pages(df).select("url", F.explode("tables").alias("t"))
    rows = out.select(
        "url", "t.table_idx", F.size("t.headers").alias("nh"), F.size("t.rows").alias("nr")
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["nh"] == 3  # all fixture scenarios have 3 columns
        assert r["nr"] >= 1


def test_extraction_deterministic_across_partitions(spark, pages_fx):
    pdf = pages_fx.pages.head(60)
    a = extract_pages(spark.createDataFrame(pdf).repartition(1))
    b = extract_pages(spark.createDataFrame(pdf).repartition(7))
    ha = a.select("url", "extracted_text").orderBy("url").collect()
    hb = b.select("url", "extracted_text").orderBy("url").collect()
    assert ha == hb
