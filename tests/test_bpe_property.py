"""Property tests for BPE: for ARBITRARY corpora over a small alphabet, the
Spark training/encoding must equal the independent pure-Python reference
exactly, and encoding must be lossless — the word-type-grain and
vocabulary-grain optimizations are execution strategies, never semantic
variants."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tabbyld_spark.operators.bpe import END_OF_WORD, apply_bpe, train_bpe
from tests.test_bpe import _ref_encode, _ref_train

_word = st.text(alphabet="abc1", min_size=1, max_size=5)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(_doc, min_size=1, max_size=6), n_merges=st.integers(1, 8))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_train_and_encode_match_reference(spark, docs, n_merges):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=n_merges)
    assert merges == _ref_train(docs, n_merges=n_merges)
    got = {r.doc_id: list(r.tokens) for r in apply_bpe(df, merges).collect()}
    for i, text in enumerate(docs):
        want = _ref_encode(text, merges)
        assert got[i] == want, (i, text)
        # lossless: stripping markers reconstructs the word characters
        assert "".join(got[i]).replace(END_OF_WORD, "") == "".join(
            re.findall(r"[a-z0-9]+", text.lower())
        )


@given(docs=st.lists(_doc, min_size=1, max_size=6), n_merges=st.integers(1, 8))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_arrow_greedy_encoder_matches_reference(spark, docs, n_merges):
    # the greedy rank-priority encoder (expr_merges_max=0 forces the Arrow
    # path) must equal the sequential merge replay for ARBITRARY trained
    # merge lists — the equivalence argument on _greedy_encode_word, tested
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    merges = train_bpe(df, n_merges=n_merges)
    got = {
        r.doc_id: list(r.tokens)
        for r in apply_bpe(df, merges, expr_merges_max=0).collect()
    }
    for i, text in enumerate(docs):
        assert got[i] == _ref_encode(text, merges), (i, text)
