"""Schema induction (kgstats.infer_predicate_schema) and deterministic
negative sampling (embeddings.negative_samples)."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.embeddings import negative_samples
from tabbyld_spark.operators.kgstats import infer_predicate_schema


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_infer_schema_majority_and_share(spark):
    tri = _tri(
        spark,
        [
            ("c1", "lives_in", "n1"),
            ("c2", "lives_in", "n1"),
            ("c3", "lives_in", "n2"),
            ("s1", "lives_in", "n2"),  # one Supplier subject: 3/4 Customer
        ],
    )
    types = spark.createDataFrame(
        [("c1", "Customer"), ("c2", "Customer"), ("c3", "Customer"),
         ("s1", "Supplier"), ("n1", "Nation"), ("n2", "Nation")],
        "entity string, cls string",
    )
    out = {
        (r.pred, r.end): (r.cls, r.n_typed, r.share, r.confident)
        for r in infer_predicate_schema(tri, types, min_share=0.8).collect()
    }
    cls, n, share, conf = out[("lives_in", "domain")]
    assert cls == "Customer" and n == 4 and share == pytest.approx(0.75)
    assert conf is False  # 0.75 < 0.8 ⇒ polymorphic, flagged
    cls, n, share, conf = out[("lives_in", "range")]
    assert cls == "Nation" and share == pytest.approx(1.0) and conf is True


def test_infer_schema_deterministic_tiebreak_and_untyped(spark):
    tri = _tri(spark, [("a", "p", "b"), ("c", "p", "d")])
    types = spark.createDataFrame(
        [("a", "X"), ("c", "Y")], "entity string, cls string"
    )
    out = {
        (r.pred, r.end): r.cls
        for r in infer_predicate_schema(tri, types).collect()
    }
    # 1-1 tie between X and Y: class-name DESC tiebreak picks Y, always
    assert out[("p", "domain")] == "Y"
    assert ("p", "range") not in out  # b, d untyped ⇒ no range row


def test_negative_samples_are_negative_and_deterministic(spark):
    rows = [(f"e{i}", "p", f"e{(i + 1) % 20}") for i in range(20)]
    tri = _tri(spark, rows)
    neg = negative_samples(tri, k=2, n_buckets=64)
    got = sorted(map(tuple, neg.collect()))
    assert got, "sampler produced nothing"
    pos = {(s, p, o) for s, p, o in rows}
    for s, p, o, _j in got:
        assert (s, p, o) not in pos  # guaranteed negative
    # identical under re-sharding
    again = sorted(map(tuple, negative_samples(tri.repartition(7), k=2, n_buckets=64).collect()))
    assert got == again
    # a different seed draws a different corruption set
    other = sorted(map(tuple, negative_samples(tri, k=2, n_buckets=64, seed="x").collect()))
    assert got != other


def test_negative_samples_k_scaling(spark):
    tri = _tri(spark, [(f"a{i}", "p", f"b{i}") for i in range(30)])
    n1 = negative_samples(tri, k=1, n_buckets=256).count()
    n3 = negative_samples(tri, k=3, n_buckets=256).count()
    assert n3 > n1  # more draws survive the filters as k grows
