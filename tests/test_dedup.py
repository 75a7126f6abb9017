"""Dedup operators on planted duplicates over the documents table."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.dedup import (
    embedding_dedup_pairs,
    embedding_dedup_pairs_blocked,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 60
    )
    pdf = base.orderBy("doc_id").toPandas()
    planted = []
    for i, (_, r) in enumerate(pdf.head(6).iterrows()):
        # exact dup (whitespace variant) + near dup (one word changed)
        planted.append((10_000 + i, "  " + r.text + " ", r.lang, "dup", len(r.text)))
        toks = r.text.split()
        toks[len(toks) // 2] = "CHANGEDTOKEN"
        planted.append((20_000 + i, " ".join(toks), r.lang, "near", len(r.text)))
    extra = spark.createDataFrame(
        pd.DataFrame(planted, columns=["doc_id", "text", "lang", "source", "n_chars"])
    )
    return base.unionByName(extra).cache()


def test_exact_dedup_finds_planted(docs):
    groups = exact_dedup(docs)
    dups = groups.filter(F.col("group_size") > 1)
    assert dups.count() == 12  # 6 originals + 6 whitespace-variant copies
    assert groups.filter(F.col("doc_id") >= 20_000).filter(F.col("group_size") > 1).count() == 0


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    near = {p for p in got if p[1] >= 20_000 and p[0] < 10_000}
    # all 6 planted (original, near-dup) pairs recovered; extra pairs are
    # allowed when base docs are genuinely similar to a planted variant
    # (e.g. doc 50 ~ doc 0 in the sf0.001 corpus)
    assert {(i, 20_000 + i) for i in range(6)} <= near
    # exact dups are trivially ≥ threshold too
    assert all(j >= 0.5 for j in [r["jaccard"] for r in pairs.collect()])


def test_minhash_lsh_recovers_jaccard_pairs(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.6).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(docs, threshold=0.4).collect()
    }
    # LSH blocking must recover the high-similarity pairs (recall ≥ 0.9)
    assert len(exact & approx) >= 0.9 * len(exact)


def test_simhash_near_dups_close(spark, docs):
    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}

    def hamming(a, b):
        return bin(a ^ b).count("1")

    import statistics

    originals = sorted(k for k in sh if k < 10_000)[:6]
    # a planted near-dup must be closer to its source than random doc pairs
    rand = [hamming(sh[a], sh[b]) for a in originals for b in originals if a < b]
    med = statistics.median(rand) if rand else 16
    close = sum(
        1
        for i, o in enumerate(originals)
        if 20_000 + i in sh and hamming(sh[o], sh[20_000 + i]) < med
    )
    assert close >= 4


def test_embedding_dedup_planted(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(40)
    dup = emb.limit(5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    pairs = embedding_dedup_pairs(emb.unionByName(dup), threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(i, i + 1000) for i in range(5)} <= got


def test_embedding_dedup_blocked_recall(spark):
    """The LSH-blocked path must recover the brute-force near-dup pairs:
    exact duplicates share every band bucket, so planted-pair recall is 1.0;
    overall recall vs brute force is gated at ≥ 0.9."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    dup = emb.limit(8).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    allv = emb.unionByName(dup)
    brute = {(r["id_a"], r["id_b"]) for r in embedding_dedup_pairs(allv, threshold=0.98).collect()}
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_dedup_pairs_blocked(allv, threshold=0.98, dim=64).collect()
    }
    assert blocked <= brute  # exact rescoring: no false positives
    assert {(i, i + 1000) for i in range(8)} <= blocked
    assert len(blocked & brute) >= 0.9 * len(brute)


def test_decontaminate_flags_overlap_only(spark):
    from tabbyld_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),  # bench itself
            (1, "prefix the quick brown fox suffix words"),  # shares 4-gram
            (2, "quick brown dog fox the jumps nothing shared"),  # shuffled, no 4-gram
            (3, "entirely unrelated content with other tokens"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=4).collect()}
    assert set(out) == {1, 2, 3}, "benchmark doc itself excluded"
    assert out[1]["contaminated"] and out[1]["shared_grams"] == 1
    assert not out[2]["contaminated"] and out[2]["shared_grams"] == 0
    assert not out[3]["contaminated"]


def test_decontaminate_counts_distinct_grams(spark):
    from tabbyld_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    # doc repeats the contaminated 4-gram twice -> still counted once (distinct)
    docs = spark.createDataFrame(
        [(1, "a b c d x a b c d y b c d e")], "doc_id long, text string"
    )
    out = decontaminate(docs, bench, n=4).collect()[0]
    # distinct shared grams: "a b c d" (once, despite 2 occurrences) + "b c d e"
    assert out["shared_grams"] == 2
