"""Iterative graph operators: subclass closure + connected components."""

from pyspark.sql import functions as F

from tabbyld_spark.fixtures.kg import CLASS_TREE, DBO
from tabbyld_spark.operators.closure import subclass_closure
from tabbyld_spark.operators.components import connected_components, same_as_edges


def test_subclass_closure_matches_fixture(spark, kg):
    """Recomputing the closure from direct edges must reproduce the fixture's
    precomputed dbo-class closure (child, parent, depth)."""
    direct = spark.createDataFrame(
        [(DBO + c, DBO + p) for c, p in CLASS_TREE.items() if p is not None],
        "child string, parent string",
    )
    got = {
        (r["child"], r["parent"]): r["depth"]
        for r in subclass_closure(direct).collect()
    }
    # fixture closure minus its owl:Thing rows (Thing is not a direct edge)
    want = {
        (r.child, r.parent): r.depth
        for r in kg.subclass.itertuples()
        if not r.parent.endswith("owl#Thing") and not r.child.endswith("owl#Thing")
    }
    assert got == want


def test_closure_chain_depths(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "child string, parent string"
    )
    got = {(r["child"], r["parent"]): r["depth"] for r in subclass_closure(edges).collect()}
    assert got[("a", "e")] == 4
    assert got[("a", "c")] == 2
    assert got[("a", "a")] == 0
    assert len(got) == 5 + 4 + 3 + 2 + 1  # all self + all ancestor pairs


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"), ("r", "a")],
        "src string, dst string",
    )
    labels = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert labels["a"] == labels["b"] == labels["c"] == labels["p"] == labels["r"] == "a"
    assert labels["x"] == labels["y"] == "x"


def test_connected_components_star_skew(spark):
    """One hot hub with 500 spokes (the skew shape) converges in few rounds."""
    edges = spark.createDataFrame(
        [("hub", f"n{i:03d}") for i in range(500)], "src string, dst string"
    )
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1


def test_connected_components_salted_identical(spark):
    """Salting is a physical rebalancing only — labels must be identical to
    the unsalted run on a skewed star + chain graph."""
    rows = [("hub", f"n{i:03d}") for i in range(300)] + [
        ("n000", "m1"), ("m1", "m2"), ("x", "y")
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    plain = sorted(map(tuple, connected_components(edges, salt=1).collect()))
    salted = sorted(map(tuple, connected_components(edges, salt=4).collect()))
    assert plain == salted


def test_same_as_edges_star_topology(spark):
    cea = spark.createDataFrame(
        [
            ("t1", "DATA", "Paris", "Paris", "e:P"),
            ("t2", "DATA", "Pariss", "Pariss", "e:P"),
            ("t3", "ROW", "Paris", "Paris", "e:P"),
            ("t1", "DATA", "Rome", "Rome", "e:R"),
        ],
        "table_id string, col_role string, mention string, mention_norm string, entity string",
    )
    edges = same_as_edges(cea)
    # 3 cells for e:P → hub + 2 spokes; single cell for e:R → no edge
    assert edges.count() == 2
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1
