from __future__ import annotations

import math

from pyspark.sql import functions as F

from tabbyld_spark.operators.lm import lm_score, train_unigram_lm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lm_probabilities_closed_form(spark):
    """Hand-checkable corpus: train on 'a a b', score 'a b c'."""
    train = _docs(spark, [(0, "a a b")])
    lm, oov = train_unigram_lm(train, alpha=0.5)
    got = {r["token"]: r["logp"] for r in lm.collect()}
    # N=3, V=2, denom = 3 + 0.5*3 = 4.5
    assert math.isclose(got["a"], math.log(2.5 / 4.5), rel_tol=1e-12)
    assert math.isclose(got["b"], math.log(1.5 / 4.5), rel_tol=1e-12)
    o = oov.collect()[0]
    assert math.isclose(o["oov_logp"], math.log(0.5 / 4.5), rel_tol=1e-12)
    assert (o["n_train_tokens"], o["train_vocab"]) == (3, 2)

    scored = lm_score(_docs(spark, [(1, "a b c")]), lm, oov).collect()[0]
    want = -(math.log(2.5 / 4.5) + math.log(1.5 / 4.5) + math.log(0.5 / 4.5)) / 3
    assert math.isclose(scored["lm_nll"], want, rel_tol=1e-12)
    assert scored["n_oov"] == 1 and scored["n_scored"] == 3


def test_lm_is_proper_distribution(spark):
    """Retained + OOV probabilities sum to 1 (V+1-outcome distribution)."""
    train = _docs(spark, [(0, "x y z x q"), (1, "x w")])
    lm, oov = train_unigram_lm(train, alpha=0.25)
    mass = (
        lm.agg(F.sum(F.exp("logp")).alias("m")).collect()[0]["m"]
        + math.exp(oov.collect()[0]["oov_logp"])
    )
    assert math.isclose(mass, 1.0, rel_tol=1e-9)


def test_lm_case_insensitive_and_oov_monotone(spark):
    train = _docs(spark, [(0, "The THE the")])
    lm, oov = train_unigram_lm(train)
    rows = lm.collect()
    assert len(rows) == 1 and rows[0]["token"] == "the"
    # in-vocab doc scores strictly lower NLL than all-OOV doc
    s = {
        r["doc_id"]: r["lm_nll"]
        for r in lm_score(
            _docs(spark, [(1, "the the"), (2, "zz qq")]), lm, oov
        ).collect()
    }
    assert s[1] < s[2]


def test_lm_min_count_prunes_to_oov_without_shifting_kept_probs(spark):
    train = _docs(spark, [(0, "a a a b")])
    lm_full, _ = train_unigram_lm(train, alpha=0.5)
    lm_pruned, oov = train_unigram_lm(train, alpha=0.5, min_count=2)
    kept = {r["token"]: r["logp"] for r in lm_pruned.collect()}
    full = {r["token"]: r["logp"] for r in lm_full.collect()}
    assert set(kept) == {"a"}
    assert math.isclose(kept["a"], full["a"], rel_tol=1e-12)
    # pruned token now scores as OOV
    scored = lm_score(_docs(spark, [(1, "b")]), lm_pruned, oov).collect()[0]
    assert scored["n_oov"] == 1


def test_lm_score_plan_stays_jvm_side(spark):
    """No Python evals anywhere; LM probe side broadcasts."""
    train = _docs(spark, [(0, "a b c d e")])
    lm, oov = train_unigram_lm(train)
    plan = lm_score(
        _docs(spark, [(1, "a b zz")]), lm, oov
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
