"""128-bit surrogate-key flag (SPARK_GRAFT_KEYBITS): flag-on output is
bit-identical to the default 64-bit run, keys stay one column (plan shape
unchanged), and fixture-wide key uniqueness holds — the assertion-mode
collision check promised in operators/features.py's scale notes."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.fixtures.sti_fixture import ensure_sti_fixture
from tabbyld_spark.functions.keys import keybits, skey


@pytest.fixture(scope="module")
def fx():
    return ensure_sti_fixture()


def _cea(spark, fx):
    from tabbyld_spark.plans.pipeline import annotate_canonical

    kg = {
        n: spark.read.parquet(f"{fx}/{n}.parquet")
        for n in ("kg_labels", "kg_types", "kg_subclass", "kg_triples")
    }
    canonical = spark.read.parquet(f"{fx}/canonical.parquet")
    res = annotate_canonical(canonical, kg, provided_ner=True, fuzzy_enabled=False)
    return (
        res.cea.select(
            "table_id", "col_role", "mention", "entity", F.round("agg_rank", 6).alias("r")
        )
        .orderBy("table_id", "col_role", "mention")
        .collect()
    )


def test_keybits_flag_width(monkeypatch):
    assert keybits() == 64
    monkeypatch.setenv("SPARK_GRAFT_KEYBITS", "128")
    assert keybits() == 128


def test_flag_on_output_identical(spark, fx, monkeypatch):
    base = _cea(spark, fx)
    monkeypatch.setenv("SPARK_GRAFT_KEYBITS", "128")
    wide = _cea(spark, fx)
    assert base == wide


def test_key_uniqueness_both_widths(spark, fx, monkeypatch):
    """Assertion-mode collision check: on the fixture, distinct surrogate
    keys == distinct identity tuples (no birthday collision at this scale;
    at 10^12 rows the 128-bit width restores the margin)."""
    cands = spark.read.parquet(f"{fx}/candidates.parquet")
    n_ident = cands.select("table_id", "col_role", "mention").distinct().count()
    for bits in ("64", "128"):
        monkeypatch.setenv("SPARK_GRAFT_KEYBITS", bits)
        k = skey("table_id", "col_role", "mention")
        assert cands.select(k.alias("k")).distinct().count() == n_ident, bits


def test_128_is_one_column_same_plan_shape(spark, fx, monkeypatch):
    """A 128-bit key is a single struct column, so the capped-candidates
    window exchange count is identical to the 64-bit plan."""
    from tabbyld_spark.operators.candidates import cap_candidates

    cands = spark.read.parquet(f"{fx}/candidates.parquet").withColumn(
        "lev", F.lit(0)
    )

    def n_exchanges():
        plan = cap_candidates(cands)._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange")

    base = n_exchanges()
    monkeypatch.setenv("SPARK_GRAFT_KEYBITS", "128")
    wide_df = cap_candidates(cands)
    assert dict(wide_df.dtypes)["mention_key"].startswith("struct")
    assert n_exchanges() == base
