"""BGP matching + KG integrity checks (operators/kgquery.py).

The entry-contract suite cross-checks q_kg_pattern / q_kg_validate against
DuckDB; here we pin the operator semantics the twin can't see: variable
repetition, ground patterns, join ordering, cartesian refusal, and each
integrity check's edge cases on hand-built graphs."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.operators.kgquery import (
    bgp_match,
    dangling_objects,
    disjoint_type_conflicts,
    functional_violations,
    kg_integrity_profile,
)


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("a", "knows", "b"),
        ("b", "knows", "c"),
        ("a", "knows", "a"),          # self-loop for repeated-var pattern
        ("a", "rdf:type", "Person"),
        ("b", "rdf:type", "Person"),
        ("b", "rdf:type", "Robot"),   # disjoint with Person
        ("a", "born_in", "x:rome"),
        ("a", "born_in", "x:paris"),  # functional violation on born_in
        ("b", "born_in", "x:rome"),
        ("c", "lives_in", "x:ghost"), # x:ghost never a subject → dangling
        ("x:rome", "rdf:type", "City"),
        ("x:paris", "rdf:type", "City"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    df.cache().count()
    return df


def test_single_pattern_binds_variables(triples):
    out = bgp_match(triples, [("?s", "knows", "?o")])
    assert sorted(out.columns) == ["o", "s"]
    got = {(r.s, r.o) for r in out.collect()}
    assert got == {("a", "b"), ("b", "c"), ("a", "a")}


def test_repeated_variable_means_equality(triples):
    out = bgp_match(triples, [("?x", "knows", "?x")])
    assert [r.x for r in out.collect()] == ["a"]


def test_constant_subject_and_object(triples):
    out = bgp_match(triples, [("a", "knows", "?o"), ("?o", "rdf:type", "Person")])
    got = sorted(r.o for r in out.collect())
    assert got == ["a", "b"]  # a knows a,b and both are Persons


def test_star_join_shares_subject(triples):
    # who knows someone AND is a Person AND was born somewhere
    out = bgp_match(
        triples,
        [
            ("?p", "knows", "?q"),
            ("?p", "rdf:type", "Person"),
            ("?p", "born_in", "?where"),
        ],
    )
    assert sorted(out.columns) == ["p", "q", "where"]
    # a: knows {a,b} × born {rome,paris} = 4 rows; b: knows {c} × {rome} = 1
    assert out.count() == 5
    assert out.filter(F.col("p") == "b").count() == 1


def test_bag_semantics_not_distinct(triples):
    # two born_in facts for a ⇒ the (a,*) knows rows double: bag, not set
    out = bgp_match(triples, [("?p", "knows", "?q"), ("?p", "born_in", "?w")])
    a_rows = out.filter(F.col("p") == "a").count()
    assert a_rows == 4  # 2 knows × 2 born_in


def test_cartesian_product_refused(triples):
    with pytest.raises(ValueError, match="cartesian"):
        bgp_match(triples, [("?a", "knows", "?b"), ("?c", "born_in", "?d")])


def test_ground_pattern_acts_as_existence_guard(triples):
    hit = bgp_match(triples, [("?s", "knows", "?o"), ("a", "rdf:type", "Person")])
    assert hit.count() == 3  # guard holds once per (s,o) binding
    miss = bgp_match(triples, [("?s", "knows", "?o"), ("a", "rdf:type", "Robot")])
    assert miss.count() == 0


def test_empty_and_malformed_patterns_rejected(triples):
    with pytest.raises(ValueError):
        bgp_match(triples, [])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?a", "knows")])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?", "knows", "?x")])


def test_functional_violations(triples):
    out = functional_violations(triples, ["born_in", "lives_in"]).collect()
    assert [(r.pred, r.subj, r.n_objects) for r in out] == [("born_in", "a", 2)]


def test_dangling_objects(triples):
    out = dangling_objects(triples, "x:").collect()
    assert [(r.obj, r.n_refs) for r in out] == [("x:ghost", 1)]


def test_disjoint_type_conflicts_order_normalized(triples):
    # declared both ways round — must emit ONE normalized row
    out = disjoint_type_conflicts(
        triples, [("Person", "Robot"), ("Robot", "Person")]
    ).collect()
    assert [(r.subj, r.class_a, r.class_b) for r in out] == [("b", "Person", "Robot")]


def test_integrity_profile_tags_and_empty_gate(spark, triples):
    prof = kg_integrity_profile(
        triples,
        functional_preds=["born_in"],
        entity_prefix="x:",
        disjoint_pairs=[("Person", "Robot")],
    )
    got = {(r.check, r.key, r.detail, r.n) for r in prof.collect()}
    assert got == {
        ("functional", "a", "born_in", 2),
        ("dangling", "x:ghost", "x:", 1),
        ("disjoint", "b", "Person|Robot", 1),
    }
    clean = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    assert (
        kg_integrity_profile(
            clean, functional_preds=["p"], entity_prefix="z:",
            disjoint_pairs=[("A", "B")],
        ).count()
        == 0
    )
    with pytest.raises(ValueError):
        kg_integrity_profile(triples)
