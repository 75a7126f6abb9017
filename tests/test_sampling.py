"""Deterministic mixture sampling: per-key rates, hash-Bernoulli keeps,
upsampling copies, DataFrame-rates path, a DuckDB twin for the decision
columns, determinism under re-sharding, and plan hygiene (dict path is one
zero-shuffle codegen projection)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from tabbyld_spark.operators.sampling import (
    hash_uniform,
    sample_corpus,
    sample_decisions,
)

RATES = {"a": 0.25, "b": 1.0, "c": 2.5, "d": 0.0}


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b"), F.lit("c"), F.lit("d"), F.lit("e")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("source"),
    )


def test_decision_semantics(spark):
    dec = sample_decisions(_docs(spark), RATES, default_rate=0.5).cache()
    rows = dec.groupBy("source").agg(
        F.min("n_copies").alias("lo"), F.max("n_copies").alias("hi"),
        F.avg("n_copies").alias("mean"), F.count(F.lit(1)).alias("n"),
    ).collect()
    got = {r["source"]: r for r in rows}
    assert (got["a"]["lo"], got["a"]["hi"]) == (0, 1)
    assert (got["b"]["lo"], got["b"]["hi"]) == (1, 1)          # rate 1.0: always exactly 1
    assert (got["c"]["lo"], got["c"]["hi"]) == (2, 3)          # rate 2.5: 2 or 3 copies
    assert (got["d"]["lo"], got["d"]["hi"]) == (0, 0)          # rate 0: dropped
    assert (got["e"]["lo"], got["e"]["hi"]) == (0, 1)          # default 0.5
    # E[copies] = rate: loose band (400 docs/key, sd ~ .025)
    assert abs(got["a"]["mean"] - 0.25) < 0.08
    assert abs(got["c"]["mean"] - 2.5) < 0.08
    assert abs(got["e"]["mean"] - 0.5) < 0.09


def test_corpus_explodes_copies_and_stays_deterministic(spark):
    docs = _docs(spark)
    out = sample_corpus(docs, RATES).cache()
    dec = sample_decisions(docs, RATES)
    assert out.count() == dec.agg(F.sum("n_copies")).collect()[0][0]
    # copy_id is 0..n_copies-1 per doc
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_id").alias("mx"),
        F.min("copy_id").alias("mn"),
    )
    assert per_doc.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count() == 0
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, sample_corpus(docs.repartition(17), RATES).collect()))
    assert a == b
    # changing one key's rate must not disturb the others' picks
    other = sample_corpus(docs, {**RATES, "a": 0.9}).filter(F.col("source") != "a")
    assert sorted(map(tuple, other.collect())) == [t for t in a if t[1] != "a"]


def test_rates_dataframe_path_matches_dict(spark):
    docs = _docs(spark, 500)
    rdf = spark.createDataFrame(list(RATES.items()), "source string, rate double")
    a = sorted(map(tuple, sample_decisions(docs, RATES, default_rate=0.5).collect()))
    b = sorted(map(tuple, sample_decisions(docs, rdf, default_rate=0.5).collect()))
    assert a == b


def test_decisions_match_duckdb_twin(spark):
    docs = _docs(spark, 500)
    got = sorted(
        (r["doc_id"], r["rate"], round(r["u"], 6), r["n_copies"])
        for r in sample_decisions(docs, RATES, default_rate=0.5, seed="mix").collect()
    )
    con = duckdb.connect()
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
        WITH docs AS (
            SELECT r.range AS doc_id,
                   ['a','b','c','d','e'][CAST(r.range % 5 AS INT) + 1] AS source
            FROM range(500) r
        ),
        dec AS (
            SELECT doc_id,
                CASE source WHEN 'a' THEN 0.25 WHEN 'b' THEN 1.0
                            WHEN 'c' THEN 2.5 WHEN 'd' THEN 0.0 ELSE 0.5
                END AS rate,
                CAST('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) / 4294967296.0 AS u
            FROM docs
        )
        SELECT doc_id, rate, round(u, 6) AS u,
               CAST(floor(rate) + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END
                    AS BIGINT) AS n_copies
        FROM dec
        """
        ).fetchall()
    )
    assert got == want


def test_plan_hygiene(spark):
    docs = _docs(spark)
    plan = (
        sample_corpus(docs, RATES)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # DataFrame-rates path: the join must be broadcast, never a shuffle
    rdf = spark.createDataFrame(list(RATES.items()), "source string, rate double")
    plan2 = (
        sample_decisions(docs, rdf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan2
    assert "Exchange hashpartitioning" not in plan2
