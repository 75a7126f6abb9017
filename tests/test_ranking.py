"""TF-IDF / BM25 ranking operator properties on a micro corpus."""

import math

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.ranking import bm25_topk, term_counts, tf_idf


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry durian"),
            (4, "apple banana cherry"),
        ],
        "doc_id long, text string",
    )


def test_term_counts(corpus):
    got = {(r["doc_id"], r["term"]): r["tf"] for r in term_counts(corpus).collect()}
    assert got[(1, "apple")] == 2 and got[(3, "cherry")] == 3
    assert (2, "apple") not in got


def test_tfidf_formula_and_df_cap(corpus):
    rows = {(r["doc_id"], r["term"]): r for r in tf_idf(corpus).collect()}
    r = rows[(1, "apple")]
    assert r["df"] == 2
    assert r["tfidf"] == pytest.approx(2 * (math.log(5 / 3) + 1))
    # df cap: banana/cherry appear in 3 of 4 docs → dropped at ratio 0.5
    capped = {r["term"] for r in tf_idf(corpus, max_df_ratio=0.5).collect()}
    assert "banana" not in capped and "cherry" not in capped
    assert "durian" in capped


def test_bm25_ranks_rare_term_doc_first(corpus):
    top = bm25_topk(corpus, ["durian"], k=2).collect()
    assert top[0]["doc_id"] == 3 and top[0]["rank"] == 1
    assert len(top) == 1  # only one doc contains the term

    # multi-term query: doc with more matching mass outranks a shorter match
    top2 = bm25_topk(corpus, ["cherry", "apple"], k=4).collect()
    assert top2[0]["rank"] == 1
    assert {r["doc_id"] for r in top2} == {1, 2, 3, 4}
    # deterministic order under repartitioning
    again = bm25_topk(corpus.repartition(7), ["cherry", "apple"], k=4).collect()
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in again]
