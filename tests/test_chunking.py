"""Chunking + packing: brute-force reference parity, a DuckDB twin for the
window extraction AND the packing arithmetic, overlap/coverage invariants,
and plan hygiene (one regex pass, no Python eval, chunking shuffle-free)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.chunking import chunk_documents, pack_sequences

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _brute_chunks(text, max_tokens, overlap):
    t = text.strip().split()
    stride = max_tokens - overlap
    return [
        (k, " ".join(t[s : s + max_tokens]), min(s + max_tokens, len(t)) - s)
        for k, s in enumerate(range(0, len(t), stride))
    ]


@pytest.mark.parametrize("max_tokens,overlap", [(16, 4), (8, 0), (10, 9)])
def test_chunks_match_bruteforce(spark, max_tokens, overlap):
    rows = _docs(spark).limit(40).collect()
    got = (
        chunk_documents(_docs(spark).limit(40), max_tokens, overlap)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    want = []
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        for k, txt, n in _brute_chunks(r["text"], max_tokens, overlap):
            want.append((r["doc_id"], k, txt, n))
    assert [(g["doc_id"], g["chunk_id"], g["chunk_text"], g["n_chunk_tokens"]) for g in got] == want


def test_chunk_duckdb_twin(spark):
    max_tokens, overlap = 24, 6
    stride = max_tokens - overlap
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(_docs(spark), max_tokens, overlap).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
        WITH norm AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents WHERE length(trim(text)) > 0
        ),
        st AS (
            SELECT doc_id, t, CAST(i AS BIGINT) AS s
            FROM norm, LATERAL unnest(range(0, len(t), {stride})) AS r(i)
        )
        SELECT doc_id,
               CAST(s / {stride} AS INT) AS chunk_id,
               array_to_string(t[s + 1 : least(s + {max_tokens}, len(t))], ' ') AS chunk_text,
               CAST(least(s + {max_tokens}, len(t)) - s AS BIGINT) AS n
        FROM st
        """
        ).fetchall()
    )
    assert got == want


def test_overlap_and_coverage(spark):
    max_tokens, overlap = 12, 3
    ch = chunk_documents(_docs(spark).limit(30), max_tokens, overlap).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(ch, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    docs = {r["doc_id"]: r["text"] for r in _docs(spark).limit(30).collect()}
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id].strip().split()
        # full-length consecutive chunks share exactly `overlap` tokens
        for a, b in zip(rows, rows[1:]):
            if a["n_chunk_tokens"] == max_tokens:
                assert a["chunk_text"].split()[-overlap:] == b["chunk_text"].split()[:overlap]
        # stride prefixes concatenate back to the exact token stream
        stride = max_tokens - overlap
        rebuilt = []
        for r in rows:
            rebuilt.extend(r["chunk_text"].split()[:stride])
        assert rebuilt == toks


def test_degenerate_texts_produce_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   \n  "), (4, "one")],
        "doc_id long, text string",
    )
    got = chunk_documents(docs, 8, 2).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in got] == [(4, "one")]


def test_pack_sequences_twin_and_invariants(spark):
    seq_len = 64
    docs = _docs(spark).withColumn(
        "n_tokens", F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    ).select("doc_id", "n_tokens")
    packed = pack_sequences(docs, seq_len=seq_len, n_buckets=16).collect()
    # DuckDB recomputes the windowed packing from (doc_id, n_tokens, bucket)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rows (doc_id BIGINT, n_tokens BIGINT, bucket BIGINT)"
    )
    con.executemany(
        "INSERT INTO rows VALUES (?, ?, ?)",
        [(r["doc_id"], r["n_tokens"], r["bucket"]) for r in packed],
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"""
        SELECT doc_id,
               CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                    * 1.0 / {seq_len}) AS BIGINT) AS pack_id
        FROM rows
        """
        ).fetchall()
    }
    assert {r["doc_id"]: (r["cum_tokens"], r["pack_id"]) for r in packed} == want
    # pack ids start at 0 and never decrease within a bucket
    by_bucket: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: (r["bucket"], r["doc_id"])):
        by_bucket.setdefault(r["bucket"], []).append(r["pack_id"])
    for pids in by_bucket.values():
        assert pids[0] == 0
        assert all(a <= b for a, b in zip(pids, pids[1:]))


def test_plans_stay_jvm_side(spark):
    ch = chunk_documents(_docs(spark))
    p = ch._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "Exchange" not in p  # chunking is projection + generate only
    pk = pack_sequences(
        _docs(spark).withColumn("n_tokens", F.lit(5)).select("doc_id", "n_tokens")
    )
    p2 = pk._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p2
    assert p2.count("Exchange hashpartitioning") == 1  # one bucket exchange
