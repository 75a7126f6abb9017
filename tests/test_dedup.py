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


# ---------------------------------------------------------------------------
# SemDeDup (cluster-then-prune semantic dedup)
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dedup_collapses_groups_keeps_min_id(spark):
    from tabbyld_spark.operators.dedup import semantic_dedup

    # two tight direction-groups plus an outlier; n_clusters=1 makes the
    # semantics global so the expectation is unambiguous
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),       # ~same direction as 1
        (5, [0.998, 0.02, 0.0]),       # chained near-dup of 2 (transitive)
        (10, [0.0, 1.0, 0.0]),
        (11, [0.01, 0.999, 0.0]),      # ~same direction as 10
        (20, [0.0, 0.0, 1.0]),         # singleton
    ]
    out = {
        r.vec_id: (r.group, r.keep)
        for r in semantic_dedup(
            _vecs(spark, rows), threshold=0.99, n_clusters=1
        ).collect()
    }
    assert out[1] == (1, True) and out[2] == (1, False) and out[5] == (1, False)
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[20] == (20, True)


def test_semantic_dedup_matches_brute_force_union_find(spark):
    from tabbyld_spark.functions.vectors import cosine as _cos
    from tabbyld_spark.operators.dedup import embedding_dedup_pairs, semantic_dedup

    # n_clusters=1 => cluster-scoped == global: survivors must equal a
    # union-find over the brute-force cosine pair set, min-id winners
    import random

    rng = random.Random(9)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    emb = _vecs(spark, [(i, [float(x) for x in v]) for i, v in rows])
    t = 0.8
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_dedup_pairs(emb, threshold=t).collect()
    }
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i, _ in rows}
    got = {
        r.vec_id: r.group
        for r in semantic_dedup(emb, threshold=t, n_clusters=1).collect()
    }
    assert got == want
    keeps = {
        r.vec_id
        for r in semantic_dedup(emb, threshold=t, n_clusters=1).collect()
        if r.keep
    }
    assert keeps == {v for v in want.values()}


def test_semantic_dedup_oversized_cluster_keeps_everything(spark):
    from tabbyld_spark.operators.dedup import semantic_dedup

    rows = [(i, [1.0, float(i) * 1e-4]) for i in range(10)]  # all near-dups
    out = semantic_dedup(
        _vecs(spark, rows), threshold=0.99, n_clusters=1, max_cluster=5
    ).collect()
    # cluster of 10 > cap 5: conservative keep-all, groups are self
    assert all(r.keep for r in out) and all(r.group == r.vec_id for r in out)


def test_semantic_dedup_deterministic_under_resharding(spark):
    from tabbyld_spark.operators.dedup import semantic_dedup

    import random

    rng = random.Random(3)
    emb = _vecs(
        spark,
        [(i, [float(rng.uniform(-1, 1)) for _ in range(6)]) for i in range(80)],
    )
    a = sorted(
        (r.vec_id, r.cluster, r.group, r.keep)
        for r in semantic_dedup(emb, threshold=0.7, n_clusters=4).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.group, r.keep)
        for r in semantic_dedup(
            emb.repartition(13), threshold=0.7, n_clusters=4
        ).collect()
    )
    assert a == b


def test_semantic_decontaminate_flags_paraphrase_leakage(spark):
    from tabbyld_spark.operators.dedup import semantic_decontaminate

    bench = _vecs(spark, [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])])
    corpus = _vecs(
        spark,
        [
            (1, [0.999, 0.01, 0.0]),   # near bench#1 — and SAME numeric id:
                                        # the internal namespacing must not
                                        # drop this as a self-pair
            (7, [0.0, 0.998, 0.02]),   # near bench#2
            (8, [0.0, 0.0, 1.0]),      # clean
        ],
    )
    # n_probe == n_centroids == exact brute force against the benchmark
    out = {
        r.vec_id: (r.nearest_benchmark, r.contaminated)
        for r in semantic_decontaminate(
            corpus, bench, threshold=0.99, n_centroids=2, n_probe=2
        ).collect()
    }
    assert out["1"] == ("1", True)
    assert out["7"] == ("2", True)
    assert out["8"][1] is False


def test_semantic_decontaminate_deterministic_and_cos_exact(spark):
    import math
    import random

    from tabbyld_spark.operators.dedup import semantic_decontaminate

    rng = random.Random(17)
    bench = _vecs(
        spark, [(i, [float(rng.uniform(-1, 1)) for _ in range(6)]) for i in range(5)]
    )
    corpus = _vecs(
        spark,
        [(i, [float(rng.uniform(-1, 1)) for _ in range(6)]) for i in range(40)],
    )
    out = semantic_decontaminate(
        corpus, bench, threshold=0.9, n_centroids=5, n_probe=5
    )
    a = sorted((r.vec_id, r.nearest_benchmark, round(r.max_cos, 9)) for r in out.collect())
    b = sorted(
        (r.vec_id, r.nearest_benchmark, round(r.max_cos, 9))
        for r in semantic_decontaminate(
            corpus.repartition(7), bench, threshold=0.9, n_centroids=5, n_probe=5
        ).collect()
    )
    assert a == b and len(a) == 40
    # exhaustive probe ⇒ max_cos is the exact max cosine to the benchmark
    bv = {r.vec_id: r.embedding for r in bench.collect()}
    cv = {r.vec_id: r.embedding for r in corpus.collect()}

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u)); nv = math.sqrt(sum(x * x for x in v))
        return d / (nu * nv) if nu and nv else 0.0

    for vid, _, got in a:
        want = max(cos(cv[int(vid)], v) for v in bv.values())
        assert abs(got - want) < 1e-6, vid
