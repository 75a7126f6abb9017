"""RDFS entailment (operators/entailment.py): each ρdf rule on hand-built
graphs, the stratification order (inherited triples feed domain/range,
type triples feed class inheritance), literal guards, and idempotence.
The q_rdfs_entail twin cross-checks the composition against recursive SQL."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.entailment import rdfs_entailment


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _tri(spark, rows):
    return _df(spark, rows, "subj string, pred string, obj string")


def _collect(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_subproperty_inheritance_is_transitive(spark):
    tri = _tri(spark, [("a", "p", "b")])
    sp = _df(spark, [("p", "q"), ("q", "r")], "child string, parent string")
    got = _collect(rdfs_entailment(tri, subproperty=sp))
    assert got == {("a", "q", "b"), ("a", "r", "b")}


def test_domain_and_range_type_subjects_and_objects(spark):
    tri = _tri(spark, [("a", "p", "x:b"), ("a", "p", "lit")])
    dom = _df(spark, [("p", "C")], "pred string, cls string")
    rng = _df(spark, [("p", "D")], "pred string, cls string")
    got = _collect(
        rdfs_entailment(tri, domain=dom, range_=rng, entity_prefixes=("x:",))
    )
    # domain types BOTH statements' subject; range types only the entity obj
    assert got == {("a", "rdf:type", "C"), ("x:b", "rdf:type", "D")}


def test_range_without_guard_types_everything(spark):
    tri = _tri(spark, [("a", "p", "lit")])
    rng = _df(spark, [("p", "D")], "pred string, cls string")
    got = _collect(rdfs_entailment(tri, range_=rng))
    assert got == {("lit", "rdf:type", "D")}


def test_inherited_triples_feed_domain_range(spark):
    # p ⊑ q and only q has a domain: the rule must see the inherited triple
    tri = _tri(spark, [("a", "p", "b")])
    sp = _df(spark, [("p", "q")], "child string, parent string")
    dom = _df(spark, [("q", "C")], "pred string, cls string")
    got = _collect(rdfs_entailment(tri, subproperty=sp, domain=dom))
    assert got == {("a", "q", "b"), ("a", "rdf:type", "C")}


def test_class_inheritance_sees_derived_types(spark):
    # domain-derived type must propagate up the class hierarchy
    tri = _tri(spark, [("a", "p", "b"), ("z", "rdf:type", "C")])
    dom = _df(spark, [("p", "C")], "pred string, cls string")
    sc = _df(spark, [("C", "D"), ("D", "E")], "child string, parent string")
    got = _collect(rdfs_entailment(tri, domain=dom, subclass=sc))
    assert got == {
        ("a", "rdf:type", "C"),
        ("a", "rdf:type", "D"),
        ("a", "rdf:type", "E"),
        ("z", "rdf:type", "D"),
        ("z", "rdf:type", "E"),
    }


def test_derived_excludes_already_present_and_is_idempotent(spark):
    tri = _tri(
        spark,
        [("a", "rdf:type", "C"), ("a", "rdf:type", "D")],  # D already stated
    )
    sc = _df(spark, [("C", "D"), ("C", "E")], "child string, parent string")
    first = rdfs_entailment(tri, subclass=sc)
    assert _collect(first) == {("a", "rdf:type", "E")}
    # saturate, re-run: nothing new (fixpoint reached in one pass)
    saturated = tri.unionByName(first).distinct()
    assert rdfs_entailment(saturated, subclass=sc).count() == 0


def test_no_ontology_means_no_derivations(spark):
    tri = _tri(spark, [("a", "p", "b")])
    assert rdfs_entailment(tri).count() == 0


def test_closure_pairs_aborts_to_distributed_when_closure_outgrows_driver(spark):
    # a 60-node chain passes the EDGE gate trivially (59 edges) but its
    # closure is 59·60/2 = 1770 pairs; with driver_max_pairs=100 the build
    # must abort mid-way to the distributed doubling — identical pairs
    from tabbyld_spark.operators.entailment import _closure_pairs

    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(59)],
        "child string, parent string",
    )
    bounded = _closure_pairs(edges, driver_max=100_000, driver_max_pairs=100)
    unbounded = _closure_pairs(edges, driver_max=100_000)
    got_b = {(r.child, r.parent) for r in bounded.collect()}
    got_u = {(r.child, r.parent) for r in unbounded.collect()}
    assert len(got_u) == 59 * 60 // 2
    assert got_b == got_u
