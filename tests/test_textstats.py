"""Text-analysis operators on the documents table."""

from pyspark.sql import functions as F

from tabbyld_spark.operators.textstats import (
    fingerprint,
    language_id,
    ngram_language_id,
    quality_stats,
    regex_token_count,
    token_count,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world 42!"), (2, "a  b   c")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["tc"], r["rc"])
        for r in df.select(
            "doc_id",
            token_count("text").alias("tc"),
            regex_token_count("text").alias("rc"),
        ).collect()
    }
    assert rows[1] == (3, 4)  # hello, world, 42, !
    assert rows[2] == (3, 3)


def test_quality_stats_ranges(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    q = quality_stats(docs)
    bad = q.filter(
        (F.col("punct_ratio") < 0) | (F.col("punct_ratio") > 1)
        | (F.col("stopword_ratio") < 0) | (F.col("stopword_ratio") > 1)
        | (F.col("distinct_ratio") <= 0) | (F.col("distinct_ratio") > 1)
        | (F.col("n_tokens") <= 0)
    )
    assert bad.count() == 0


def test_language_id_plain(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and it is warm"),
            (2, "der hund ist nicht mit der katze und das ist gut"),
            (3, "el perro es un animal y la casa es para los gatos"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es"}


def test_ngram_language_id_plain(spark):
    df = spark.createDataFrame(
        [
            (1, "the thing and the other thing are standing in the morning"),
            (2, "der hund und die katze machen nicht dieselbe richtung schnell"),
            (3, "el proceso de la casa es el que los gatos adoraron"),
            (4, "le travail de la maison est ce que nous faisons pour eux"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang_ngram"] for r in ngram_language_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr"}


def test_ngram_language_id_deterministic_tiebreak(spark):
    # no profile hits at all → every lang scores 0 → lang-asc tiebreak: 'de'
    df = spark.createDataFrame([(1, "zzz")], "doc_id long, text string")
    row = ngram_language_id(df).collect()[0]
    assert (row["pred_lang_ngram"], row["tri_hits"]) == ("de", 0)


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, " hello world "), (3, "different")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_winnow_guarantee_and_shape(spark):
    # any shared substring of length >= k + w - 1 (= 8) shares a fingerprint
    from tabbyld_spark.operators.textstats import winnow_fingerprints

    common = "the quick brown fox jumps"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {common} omega"),
            (2, f"zzz {common} qqq entirely different tail here"),
            (3, "no overlap with anything else at all"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs).cache()
    a = {r["fp"] for r in fps.filter("doc_id = 1").collect()}
    b = {r["fp"] for r in fps.filter("doc_id = 2").collect()}
    c = {r["fp"] for r in fps.filter("doc_id = 3").collect()}
    assert a & b, "docs sharing a long substring must share a fingerprint"
    assert not (a & c) or len(a & c) < len(a & b)
    # density: far fewer fingerprints than grams (that's the point)
    n_grams = len("alpha " + common + " omega") - 5 + 1
    assert 0 < fps.filter("doc_id = 1").count() < n_grams


def test_winnow_chunking_identity(spark):
    """Chunked winnowing (bounded per-task memory + linearized substring
    seeks) selects the IDENTICAL (doc_id, pos, fp) set as the single-array
    computation, including at chunk boundaries and for degenerate docs
    (VERDICT r3 #3).  chunk sizes straddle the doc lengths so every
    boundary alignment case (exact multiple, ±1, shorter-than-chunk) runs."""
    import random

    from tabbyld_spark.operators.textstats import winnow_fingerprints

    rng = random.Random(7)
    docs = [(0, ""), (1, "ab"), (2, "abcde")]
    for i, n in enumerate([63, 64, 65, 127, 128, 200, 1000, 20_000]):
        docs.append((10 + i, "".join(rng.choice("abcdef gh") for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    base = winnow_fingerprints(df, chunk_chars=10_000_000).cache()  # 1 chunk
    nb = base.count()
    # density pin: winnowing selects ~2/(w+1) of window positions on random
    # text — a broken sliding-min (e.g. a no-op shift chain, seen when a
    # 2^31-1 slice length overflowed inside zip_with) emits ~1 fp per window
    # and fails this hard
    n20k = base.filter("doc_id = 17").count()  # the 20_000-char doc
    assert n20k < 0.6 * (20_000 - 5 + 1 - 3), n20k
    for cc in (64, 1000):
        ch = winnow_fingerprints(df, chunk_chars=cc)
        assert ch.count() == nb
        assert base.exceptAll(ch).count() == 0
        assert ch.exceptAll(base).count() == 0
    base.unpersist()


def test_winnow_large_doc_bounded(spark):
    """A multi-hundred-KB doc runs through the default-chunked path in
    bounded time/memory: per-task peak is O(chunk_chars), never O(doc).
    (The unchunked form is also O(doc²) CPU — substring seeks — so this
    would hang, not just OOM, without chunking.)"""
    from tabbyld_spark.operators.textstats import winnow_fingerprints

    big = ("lorem ipsum dolor sit amet " * 20_000)[:500_000]
    df = spark.createDataFrame([(1, big)], "doc_id long, text string")
    out = winnow_fingerprints(df, chunk_chars=2048)
    # periodic text → tiny distinct fingerprint set, positions span the doc
    rows = out.groupBy().agg(
        F.count("*").alias("n"), F.max("pos").alias("maxp")
    ).collect()[0]
    assert rows["n"] > 0 and rows["maxp"] > 490_000


def test_winnow_overlap_pairs(spark):
    from tabbyld_spark.operators.textstats import winnow_overlap_pairs

    common = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (1, f"alpha {common} omega"),
            (2, f"zzz {common} qqq entirely different tail here"),
            (3, "no overlap with anything else at all"),
            (4, f"alpha {common} omega"),  # exact duplicate of 1
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): (r["shared"], r["overlap"])
        for r in winnow_overlap_pairs(docs).collect()
    }
    assert (1, 2) in pairs, "docs sharing a long run must pair"
    assert (1, 4) in pairs and pairs[(1, 4)][1] == 1.0, "exact dup => overlap 1.0"
    assert not any(3 in p for p in pairs), "unrelated doc must not pair"
    for shared, overlap in pairs.values():
        assert shared >= 2 and 0.0 < overlap <= 1.0


def test_winnow_overlap_max_df_guard(spark):
    # a fingerprint present in > max_df docs is boilerplate: dropped pre-join
    from tabbyld_spark.operators.textstats import winnow_overlap_pairs

    text = "identical boilerplate text shared by every single document here"
    docs = spark.createDataFrame(
        [(i, text) for i in range(1, 4)], "doc_id long, text string"
    )
    assert winnow_overlap_pairs(docs, max_df=1).count() == 0
    assert winnow_overlap_pairs(docs, max_df=3).count() == 3  # all C(3,2) pairs


def test_gopher_repetition_hand_computed(spark):
    from tabbyld_spark.operators.textstats import gopher_repetition

    docs = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams [a b, b a, a b, b a, a b] -> top "a b" x3;
            # norm len 11; frac = 3*3/11. 3-grams: [a b a, b a b, a b a, b a b]
            # -> 2 distinct of 4 -> dup 0.5
            (1, "a b a b a b"),
            # all distinct: top 2-gram count 1, dup_3gram 0
            (2, "one two three four"),
            # single token: degenerates to whole-text gram, frac 1.0, dup 0
            (3, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert out[1]["top_2gram"] == "a b" and out[1]["top_2gram_count"] == 3
    assert out[1]["top_2gram_frac"] == round(9 / 11, 6)
    assert out[1]["dup_3gram_frac"] == 0.5
    assert out[2]["top_2gram_count"] == 1 and out[2]["dup_3gram_frac"] == 0.0
    # tiebreak: count desc then gram asc -> lexicographically smallest of
    # {"one two", "two three", "three four"}
    assert out[2]["top_2gram"] == "one two"
    assert out[3]["top_2gram"] == "solo" and out[3]["top_2gram_frac"] == 1.0
    assert out[3]["dup_3gram_frac"] == 0.0


def test_train_split_deterministic_and_pure(spark):
    from tabbyld_spark.operators.textstats import train_split

    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"]) for r in train_split(docs).collect()}
    b = {
        r["doc_id"]: (r["bucket"], r["split"])
        for r in train_split(docs.repartition(7)).collect()
    }
    assert a == b, "split must be partitioning-invariant"
    n_val = sum(1 for _, s in a.values() if s == "val")
    assert 0 < n_val < 500
    for bucket, s in a.values():
        assert 0 <= bucket < 100
        assert (s == "val") == (bucket < 10)


def test_lexicon_flags(spark):
    from tabbyld_spark.operators.textstats import lexicon_flags

    docs = spark.createDataFrame(
        [
            (1, "the Quick brown fox"),
            (2, "nothing to see here"),
            (3, "quick quick QUICK slow"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lexicon_flags(docs, ["quick", "slow"]).collect()}
    assert (out[1]["n_hits"], out[1]["flagged"]) == (1, True)
    assert (out[2]["n_hits"], out[2]["flagged"]) == (0, False)
    assert (out[3]["n_hits"], out[3]["flagged"]) == (4, True)
    assert (out[4]["n_hits"], out[4]["flagged"]) == (0, False)


def test_lexicon_flags_duckdb_twin(spark):
    import duckdb

    from tabbyld_spark.operators.textstats import lexicon_flags

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["n_hits"], r["flagged"])
        for r in lexicon_flags(docs, ["table", "spark"]).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
        SELECT doc_id,
               CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> lower(x) IN ('table', 'spark'))) AS BIGINT) AS n_hits,
               len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                    x -> lower(x) IN ('table', 'spark'))) > 0 AS flagged
        FROM documents
        """
        ).fetchall()
    )
    assert got == want


def test_lexicon_flags_plan(spark):
    from tabbyld_spark.operators.textstats import lexicon_flags

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    p = lexicon_flags(docs, ["a"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p and "EvalPython" not in p
