"""Hashed-feature logistic regression (operators/classifier.py): pinned
against the identical-algorithm numpy reference (same features, same
normalization, same schedule), separation on held-out docs, reshard
determinism, and edge cases."""

import hashlib
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.classifier import (
    score_text_classifier,
    train_text_classifier,
)

N_BUCKETS = 128


# ---------------------------------------------------------------- reference


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _feats(text):
    ws = re.findall(r"[a-z0-9]+", (text or "").lower())
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    counts = {}
    for g in grams:
        b = _bucket(g)
        counts[b] = counts.get(b, 0) + 1
    tot = sum(counts.values())
    return {b: c / tot for b, c in counts.items()} if tot else {}


def _ref_train(rows, n_iters, lr, l2):
    X = [_feats(t) for t, _ in rows]
    y = [float(l) for _, l in rows]
    n = len(rows)
    w = np.zeros(N_BUCKETS)
    b = 0.0
    for _ in range(n_iters):
        r = []
        for xd, yd in zip(X, y):
            m = b + sum(c * w[k] for k, c in xd.items())
            r.append(yd - 1.0 / (1.0 + math.exp(-m)))
        g = np.zeros(N_BUCKETS)
        for xd, rd in zip(X, r):
            for k, c in xd.items():
                g[k] += c * rd / n
        w = w * (1.0 - lr * l2) + lr * g
        b = b + lr * (sum(r) / n)
    return w, b


POS = [f"the quick study of science volume {i}" for i in range(8)]
NEG = [f"win casino jackpot bonus spins now {i}" for i in range(8)]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(POS)] + [
        (100 + i, t, 0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_training_matches_numpy_reference(spark, labeled):
    model = train_text_classifier(
        labeled, n_buckets=N_BUCKETS, n_iters=10, lr=0.5, l2=1e-3
    )
    w_ref, b_ref = _ref_train(
        [(t, l) for t, l in
         ((r.text, r.label) for r in labeled.collect())],
        n_iters=10, lr=0.5, l2=1e-3,
    )
    got = {r.bucket: r.w for r in model.weights.collect()}
    for k in range(N_BUCKETS):
        assert got.get(k, 0.0) == pytest.approx(w_ref[k], abs=1e-10), k
    assert model.intercept == pytest.approx(b_ref, abs=1e-10)


def test_separates_held_out_docs(spark, labeled):
    model = train_text_classifier(labeled, n_buckets=N_BUCKETS, n_iters=40, lr=1.0)
    held = spark.createDataFrame(
        [(1000, "a careful study of science"), (1001, "casino bonus spins")],
        "doc_id long, text string",
    )
    probs = {r.doc_id: r.prob for r in score_text_classifier(held, model).collect()}
    assert probs[1000] > 0.5 > probs[1001]
    assert probs[1000] - probs[1001] > 0.15


def test_deterministic_under_resharding(spark, labeled):
    a = train_text_classifier(labeled, n_buckets=N_BUCKETS, n_iters=5)
    b = train_text_classifier(
        labeled.repartition(7), n_buckets=N_BUCKETS, n_iters=5
    )
    wa = {r.bucket: r.w for r in a.weights.collect()}
    wb = {r.bucket: r.w for r in b.weights.collect()}
    assert set(wa) == set(wb)
    for k in wa:
        assert wa[k] == pytest.approx(wb[k], abs=1e-12)
    assert a.intercept == pytest.approx(b.intercept, abs=1e-12)


def test_featureless_docs_score_intercept(spark, labeled):
    model = train_text_classifier(labeled, n_buckets=N_BUCKETS, n_iters=5)
    empty = spark.createDataFrame(
        [(1, ""), (2, None)], "doc_id long, text string"
    )
    out = score_text_classifier(empty, model).collect()
    for r in out:
        assert r.margin == pytest.approx(model.intercept)


def test_featureless_docs_enter_intercept_gradient(spark):
    # the numpy reference includes an empty doc's residual in the intercept
    # update (its margin is the bare intercept); the Spark trainer must fit
    # the identical model when the training set contains featureless docs
    rows = (
        [(i, t, 1) for i, t in enumerate(POS[:4])]
        + [(100 + i, t, 0) for i, t in enumerate(NEG[:4])]
        + [(200, "", 0), (201, None, 1), (202, "   ", 0)]
    )
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_text_classifier(
        labeled, n_buckets=N_BUCKETS, n_iters=8, lr=0.5, l2=1e-3
    )
    w_ref, b_ref = _ref_train(
        [(t, l) for _, t, l in rows], n_iters=8, lr=0.5, l2=1e-3
    )
    got = {r.bucket: r.w for r in model.weights.collect()}
    for k in range(N_BUCKETS):
        assert got.get(k, 0.0) == pytest.approx(w_ref[k], abs=1e-10), k
    assert model.intercept == pytest.approx(b_ref, abs=1e-10)


def test_broadcast_join_weight_path_matches_literal_path(spark, labeled):
    # weight_literal_max=0 forces every post-first iteration through the
    # broadcast-join transport; the fitted model must be identical to the
    # literal-map path (and to the numpy reference) to 1e-10
    lit = train_text_classifier(
        labeled, n_buckets=N_BUCKETS, n_iters=10, lr=0.5, l2=1e-3
    )
    join = train_text_classifier(
        labeled, n_buckets=N_BUCKETS, n_iters=10, lr=0.5, l2=1e-3,
        weight_literal_max=0,
    )
    wl = {r.bucket: r.w for r in lit.weights.collect()}
    wj = {r.bucket: r.w for r in join.weights.collect()}
    assert set(wl) == set(wj)
    for k in wl:
        assert wl[k] == pytest.approx(wj[k], abs=1e-10), k
    assert lit.intercept == pytest.approx(join.intercept, abs=1e-10)


def test_gated_path_runs_at_1e5_buckets(spark, labeled):
    # fastText-realistic bucket count: the literal map would be a 10^5-entry
    # plan expression; the gate must route through the broadcast join and
    # still separate held-out docs
    model = train_text_classifier(
        labeled, n_buckets=100_000, n_iters=6, lr=1.0, weight_literal_max=1000
    )
    held = spark.createDataFrame(
        [(1000, "a careful study of science"), (1001, "casino bonus spins")],
        "doc_id long, text string",
    )
    probs = {r.doc_id: r.prob for r in score_text_classifier(held, model).collect()}
    assert probs[1000] > probs[1001]
