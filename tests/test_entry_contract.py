"""Replicates the driver's verify loop: every queries() entry with an
oracle_sql() twin must match DuckDB on row count, column names, and an
order-insensitive value multiset (stringified, so float formatting matters
— queries round where summation order could differ)."""

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# sf0.001 keeps the suite fast; export SPARK_GRAFT_CONTRACT_SF_DIR=/root/
# testdata/sf0.01 to replicate the driver's exact scale before a round ends
SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


def _duck_rows(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    return cols, sorted(tuple(_canon(r[i]) for i in order) for r in rows)


ORACLES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    s_cols, s_rows = _spark_rows(q(spark, SF_DIR))
    d_cols, d_rows = _duck_rows(con, sql)
    assert s_cols == d_cols, f"{name}: columns {s_cols} != {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: {len(s_rows)} vs {len(d_rows)} rows"
    if s_rows != d_rows:
        diff_a = [r for r in s_rows if r not in d_rows][:5]
        diff_b = [r for r in d_rows if r not in s_rows][:5]
        raise AssertionError(f"{name}: value mismatch\nspark-only={diff_a}\nduck-only={diff_b}")


def test_every_query_has_an_oracle_and_fits_the_driver_cap():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    # every registry entry carries a DuckDB twin (approximate surfaces via
    # invariant-contract twins), so the driver hash-checks all of them
    assert os_ == qs, f"missing oracles: {qs - os_}; orphan oracles: {os_ - qs}"
    # the driver records at most 50 CORRECTNESS rows (r3 evidence: 54
    # registry entries → exactly the first 50 recorded); stay under the cap
    # or the tail queries silently lose their correctness rows
    assert len(entry_mod.queries()) <= 50


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subj", "pred", "obj"]
