from __future__ import annotations

from pyspark.sql import functions as F

from tabbyld_spark.operators.kgstats import (
    annotate_triple_stats,
    degree_stats,
    predicate_stats,
)


def _triples(spark):
    rows = [
        ("a", "p1", "x"),
        ("a", "p1", "y"),
        ("a", "p2", "x"),
        ("b", "p1", "x"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_predicate_stats_hand_case(spark):
    got = {r["pred"]: r for r in predicate_stats(_triples(spark)).collect()}
    assert got["p1"]["n_triples"] == 3
    assert got["p1"]["n_subjects"] == 2
    assert got["p1"]["n_objects"] == 2
    assert got["p2"]["n_triples"] == 1


def test_degree_stats_sink_and_source_get_zero(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], "src string, dst string"
    )
    got = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(edges).collect()}
    assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


def test_annotate_triple_stats_hand_case_and_plan(spark):
    out = annotate_triple_stats(_triples(spark))
    got = {(r["subj"], r["pred"], r["obj"]): r for r in out.collect()}
    assert len(got) == 4  # annotate never changes the grain
    assert got[("a", "p1", "x")]["n_pred"] == 3
    assert got[("a", "p1", "x")]["n_subj_triples"] == 3
    assert got[("b", "p1", "x")]["n_subj_triples"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    # predicate table joins back broadcast; nothing drops to Python
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
