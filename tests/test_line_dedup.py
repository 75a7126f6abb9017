"""Global line dedup: hand-built multi-line cases, a DuckDB twin over the
fixture corpus, idempotence, and plan hygiene (no Python eval, no
full-text shuffle beyond the two grain exchanges)."""

from __future__ import annotations

import duckdb

from tabbyld_spark.operators.dedup import line_dedup

SF = "/root/testdata/sf0.001"


def test_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha\nbeta\ngamma"),
            (2, "beta\ndelta"),          # beta already seen in doc 1
            (3, "gamma\nalpha\nepsilon"),  # both seen
            (4, "alpha\nbeta\ngamma"),   # fully duplicate doc
            (5, "  \n\nzeta\n"),          # blank lines dropped, zeta kept
            (6, None),                     # NULL text reads as all-blank
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    assert (out[6]["text"], out[6]["n_lines"], out[6]["n_kept"]) == ("", 0, 0)
    assert out[1]["text"] == "alpha\nbeta\ngamma"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text"] == "delta"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["text"] == "epsilon"
    assert out[4]["text"] == "" and out[4]["n_kept"] == 0  # row retained
    assert out[5]["text"] == "zeta" and out[5]["n_lines"] == 1


def test_idempotent(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb"), (2, "b\nc"), (3, "c\na\nd")], "doc_id long, text string"
    )
    once = line_dedup(docs).select("doc_id", "text")
    twice = line_dedup(once).select("doc_id", "text")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_duckdb_twin_on_fixture(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["text"], r["n_lines"], r["n_kept"])
        for r in line_dedup(docs).collect()
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
        WITH lines AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS line_no, parts[i] AS line
            FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents),
                 LATERAL unnest(range(1, len(parts) + 1)) AS r(i)
            WHERE length(trim(parts[i])) > 0
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY line
                        ORDER BY doc_id, line_no) AS rn
            FROM lines
        ),
        rebuilt AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY line_no) AS text,
                   CAST(count(*) AS BIGINT) AS n_kept
            FROM ranked WHERE rn = 1 GROUP BY doc_id
        ),
        totals AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
            FROM lines GROUP BY doc_id
        ),
        base AS (SELECT doc_id FROM documents)
        SELECT base.doc_id,
               coalesce(rebuilt.text, '') AS text,
               coalesce(totals.n_lines, 0) AS n_lines,
               coalesce(rebuilt.n_kept, 0) AS n_kept
        FROM base
        LEFT JOIN totals  USING (doc_id)
        LEFT JOIN rebuilt USING (doc_id)
        """
        ).fetchall()
    )
    assert got == want


def test_plan_stays_jvm_side(spark):
    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    p = line_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p and "MapInPandas" not in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
