"""Similarity search: brute-force exactness + LSH recall, on the embeddings
fixture table."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 10)


def test_brute_force_shape_and_determinism(emb, queries):
    a = brute_force_topk(emb, queries, k=5).collect()
    b = brute_force_topk(emb.repartition(7), queries, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_q = {}
    for r in a:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_brute_force_self_excluded(emb, queries):
    rows = brute_force_topk(emb, queries, k=5).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in rows)


def test_lsh_recall_vs_brute_force(emb, queries):
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5, n_planes=12, n_bands=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall  # blocking path trades recall for scale


def test_lsh_deterministic(emb, queries):
    a = sorted(map(tuple, lsh_topk(emb, queries, k=3).collect()))
    b = sorted(map(tuple, lsh_topk(emb.repartition(5), queries, k=3).collect()))
    assert a == b


def test_ivf_full_probe_equals_brute_force(emb, queries):
    """n_probe == n_centroids means every cell is scanned → exact."""
    small = emb.filter(F.col("vec_id") < 120)
    exact = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in brute_force_topk(small, queries, k=5).collect()
    )
    full = sorted(
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in ivf_topk(
            small, queries, k=5, n_centroids=4, n_probe=4, n_iter=2
        ).collect()
    )
    assert exact == full


def test_ivf_partial_probe_recall(emb, queries):
    small = emb.filter(F.col("vec_id") < 200)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(small, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            small, queries, k=5, n_centroids=8, n_probe=4, n_iter=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, recall


def test_ivf_deterministic(emb, queries):
    small = emb.filter(F.col("vec_id") < 150)
    a = sorted(map(tuple, ivf_topk(small, queries, k=3, n_centroids=6, n_probe=2).collect()))
    b = sorted(
        map(tuple, ivf_topk(small.repartition(5), queries, k=3, n_centroids=6, n_probe=2).collect())
    )
    assert a == b
