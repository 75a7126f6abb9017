"""DSIR importance weighting (operators/importance.py): feature extraction,
model fit closed-forms, scoring determinism, and the cross-engine bucket
contract (the q_doc_profile twin re-derives the full fit+score in DuckDB;
here we pin the operator-level math the twin can't isolate)."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.importance import (
    fit_importance_model,
    hashed_ngram_counts,
    importance_weights,
    select_by_weight,
)

N_BUCKETS = 64


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gram_counts_hand_case(spark):
    d = _docs(spark, [(1, "Hello world hello"), (2, ""), (3, None)])
    out = hashed_ngram_counts(d, n_buckets=N_BUCKETS)
    # doc 1: unigrams hello, world, hello + bigrams "hello world", "world hello"
    assert out.agg(F.sum("cnt")).collect()[0][0] == 5
    assert out.filter(F.col("doc_id") != 1).count() == 0  # empty/null ⇒ no rows


def test_buckets_match_duckdb(spark):
    d = _docs(spark, [(1, "The quick brown fox jumps over the lazy dog 42")])
    got = {
        (r.bucket, r.cnt)
        for r in hashedcounts(spark, d).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(f"""
            WITH w AS (SELECT regexp_extract_all(
                'the quick brown fox jumps over the lazy dog 42',
                '[a-z0-9]+') AS ws),
            grams AS (SELECT unnest(list_concat(ws,
                list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]))) AS g
                FROM w)
            SELECT CAST('0x' || substring(md5(g), 1, 8) AS BIGINT) % {N_BUCKETS},
                   CAST(count(*) AS BIGINT)
            FROM grams GROUP BY 1
        """).fetchall()
    }
    assert got == want


def hashedcounts(spark, d):
    return hashed_ngram_counts(d, n_buckets=N_BUCKETS)


def test_model_is_dense_with_smoothing_closed_form(spark):
    target = _docs(spark, [(1, "aa bb")])
    raw = _docs(spark, [(2, "aa aa cc")])
    m = fit_importance_model(target, raw, n_buckets=N_BUCKETS, alpha=0.5)
    rows = {r.bucket: r.log_ratio for r in m.buckets.collect()}
    assert len(rows) == N_BUCKETS
    # target grams: aa, bb, "aa bb" (T_t=3); raw: aa,aa,cc,"aa aa","aa cc" (T_r=5)
    z = 0.5 * N_BUCKETS
    unseen = math.log(0.5 / (3 + z)) - math.log(0.5 / (5 + z))
    seen_vals = [v for v in rows.values() if abs(v - unseen) > 1e-12]
    assert seen_vals, "no bucket carries corpus evidence"
    # every unseen bucket carries exactly the smoothing-only ratio
    n_unseen = sum(1 for v in rows.values() if abs(v - unseen) <= 1e-12)
    assert n_unseen >= N_BUCKETS - 5


def test_weights_prefer_target_like_docs(spark):
    target = _docs(spark, [(i, "climate science report data") for i in range(5)])
    raw = _docs(
        spark,
        [(10 + i, "climate science report data") for i in range(3)]
        + [(20 + i, "casino poker jackpot slots") for i in range(3)],
    )
    m = fit_importance_model(target, raw, n_buckets=N_BUCKETS)
    w = {r.doc_id: r.log_weight for r in importance_weights(raw, m).collect()}
    assert min(w[10 + i] for i in range(3)) > max(w[20 + i] for i in range(3))


def test_featureless_docs_score_zero_and_total_output(spark):
    target = _docs(spark, [(1, "x y")])
    raw = _docs(spark, [(2, "x y"), (3, ""), (4, None)])
    out = importance_weights(raw, fit_importance_model(target, raw)).collect()
    assert {r.doc_id for r in out} == {2, 3, 4}
    by_id = {r.doc_id: r for r in out}
    assert by_id[3].n_features == 0 and by_id[3].log_weight == 0.0
    assert by_id[4].n_features == 0


def test_deterministic_under_resharding_and_seed(spark):
    target = _docs(spark, [(i, f"t{i} common words") for i in range(4)])
    raw = _docs(spark, [(i, f"doc {i} common words here") for i in range(30)])
    m = fit_importance_model(target, raw, n_buckets=N_BUCKETS)
    a = sorted(
        (r.doc_id, r.log_weight, r.sample_key)
        for r in importance_weights(raw, m).collect()
    )
    b = sorted(
        (r.doc_id, r.log_weight, r.sample_key)
        for r in importance_weights(raw.repartition(13), m).collect()
    )
    assert [(i, round(x, 10), round(k, 10)) for i, x, k in a] == [
        (i, round(x, 10), round(k, 10)) for i, x, k in b
    ]
    # different seed ⇒ different Gumbel keys, same weights
    c = importance_weights(raw, m, seed="other").collect()
    assert {r.doc_id: r.log_weight for r in c} == {i: x for i, x, _ in a}
    assert any(
        abs(r.sample_key - k) > 1e-9
        for r in c
        for i, _, k in a
        if i == r.doc_id
    )


def test_select_by_weight_is_a_filter(spark):
    target = _docs(spark, [(1, "a b")])
    raw = _docs(spark, [(2, "a b"), (3, "zz qq")])
    w = importance_weights(raw, fit_importance_model(target, raw))
    kept = select_by_weight(w, threshold=0.0)
    # selection = a predicate over the weighted frame: same schema, a
    # subset of rows, and the target-like doc survives a 0 threshold
    assert kept.schema == w.schema
    ids = {r.doc_id for r in kept.collect()}
    assert 2 in ids and ids <= {2, 3}
    # Gumbel-key variant selects on the resampling key instead
    assert select_by_weight(w, threshold=-1e9, key_col="sample_key").count() == 2
