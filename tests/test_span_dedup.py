"""Exact-substring duplicate-span dedup (Lee et al. 2021 ExactSubstr,
distributed re-expression): hand-computed span/scrub cases, a DuckDB twin
over the fixture corpus (independent gaps-and-islands formulation vs the
Spark in-expression merge), re-sharding determinism, and plan hygiene."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.dedup import (
    duplicate_span_profile,
    duplicate_spans,
    remove_duplicate_spans,
)

SF_DIR = "/root/testdata/sf0.001"

# k=3 hand corpus: d2 repeats d1's "a b c d e"; d3 self-repeats "p q r";
# d4 is below the window size
HAND = [
    (1, "a b c d e f"),
    (2, "x y a b c d e z"),
    (3, "p q r p q r p q r"),
    (4, "u v"),
]


@pytest.fixture(scope="module")
def hand(spark):
    return spark.createDataFrame(HAND, "doc_id long, text string")


def test_hand_spans(spark, hand):
    rows = sorted(
        tuple(r) for r in duplicate_spans(hand, k=3).collect()
    )
    # d2: windows at pos 2,3,4 duplicate d1 -> one merged span [2, 7)
    # d3: first occurrences pos 0,1,2 kept; pos 3..6 duplicate -> [3, 9)
    assert rows == [(2, 2, 7), (3, 3, 9)]


def test_hand_profile_and_scrub(spark, hand):
    prof = {r["doc_id"]: r for r in duplicate_span_profile(hand, k=3).collect()}
    assert set(prof) == {1, 2, 3, 4}
    assert (prof[1]["n_dup_windows"], prof[1]["n_dup_spans"], prof[1]["n_dup_tokens"]) == (0, 0, 0)
    assert (prof[2]["n_dup_windows"], prof[2]["n_dup_spans"], prof[2]["n_dup_tokens"]) == (3, 1, 5)
    assert (prof[3]["n_dup_windows"], prof[3]["n_dup_spans"], prof[3]["n_dup_tokens"]) == (4, 1, 6)
    assert (prof[4]["n_dup_windows"], prof[4]["n_dup_spans"], prof[4]["n_dup_tokens"]) == (0, 0, 0)

    scrub = {r["doc_id"]: r for r in remove_duplicate_spans(hand, k=3).collect()}
    assert scrub[1]["text"] == "a b c d e f" and scrub[1]["n_removed_tokens"] == 0
    assert scrub[2]["text"] == "x y z" and scrub[2]["n_removed_tokens"] == 5
    assert scrub[3]["text"] == "p q r" and scrub[3]["n_removed_tokens"] == 6
    assert scrub[4]["text"] == "u v" and scrub[4]["n_removed_tokens"] == 0

    # the ExactSubstr goal on this corpus: after the edit, no duplicate
    # window remains anywhere
    clean = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in scrub.values()], "doc_id long, text string"
    )
    again = duplicate_span_profile(clean, k=3)
    assert again.agg(F.sum("n_dup_windows")).collect()[0][0] == 0


def _twin_sql(k: int) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ),
        pos AS (
            SELECT doc_id, t, unnest(range(1, len(t) - {k} + 2)) AS i
            FROM toks WHERE len(t) >= {k}
        ),
        wins AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(t[i : i + {k} - 1], ' ')) AS wh,
                   doc_id * 4294967296 + (i - 1) AS okey
            FROM pos
        ),
        firsts AS (SELECT wh, count(*) AS n_occ, min(okey) AS fk FROM wins GROUP BY wh),
        dup AS (
            SELECT w.doc_id, w.pos FROM wins w JOIN firsts f USING (wh)
            WHERE f.n_occ > 1 AND w.okey <> f.fk
        ),
        marks AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(max(pos + {k}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                   THEN 1 ELSE 0 END AS brk
            FROM dup
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
            FROM marks
        ),
        spans AS (
            SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + {k} AS BIGINT) AS span_end
            FROM isl GROUP BY doc_id, island
        )
    """


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return c


@pytest.mark.parametrize("k", [4, 8])
def test_spans_match_duckdb_twin(spark, con, k):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        tuple(r) for r in duplicate_spans(docs, k=k)
        .select("doc_id", "span_start", "span_end").collect()
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            _twin_sql(k) + "SELECT doc_id, span_start, span_end FROM spans"
        ).fetchall()
    )
    assert got == want and len(got) > 0, f"k={k}: {len(got)} vs {len(want)} spans"


def test_profile_matches_duckdb_twin(spark, con):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(tuple(r) for r in duplicate_span_profile(docs, k=4).collect())
    want = sorted(
        tuple(r)
        for r in con.execute(
            _twin_sql(4)
            + """
            SELECT d.doc_id,
                   CAST(coalesce(dw.nw, 0) AS BIGINT) AS n_dup_windows,
                   CAST(coalesce(sp.ns, 0) AS BIGINT) AS n_dup_spans,
                   CAST(coalesce(sp.cov, 0) AS BIGINT) AS n_dup_tokens
            FROM documents d
            LEFT JOIN (SELECT doc_id, count(*) AS nw FROM dup GROUP BY doc_id) dw
                   USING (doc_id)
            LEFT JOIN (SELECT doc_id, count(*) AS ns,
                              sum(span_end - span_start) AS cov
                       FROM spans GROUP BY doc_id) sp USING (doc_id)
            """
        ).fetchall()
    )
    assert got == want
    # the fixture corpus genuinely exercises the operator
    assert sum(r[1] for r in got) > 0


def test_determinism_under_resharding(spark, hand):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = sorted(tuple(r) for r in duplicate_span_profile(docs, k=4).collect())
    b = sorted(
        tuple(r)
        for r in duplicate_span_profile(docs.repartition(17), k=4).collect()
    )
    assert a == b


def test_plan_hygiene(spark, hand):
    for df in (duplicate_spans(hand, k=3), remove_duplicate_spans(hand, k=3)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
