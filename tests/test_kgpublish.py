"""The KG publish plan (plans/kgpublish.py): entail → gate → commit →
compact end-to-end, the gate-failure path leaving the catalog untouched,
and the published stats table."""

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.plans.kgpublish import KGPublishError, publish_kg
from tabbyld_spark.sources.catalog import SnapshotCatalog


def _tri(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.fixture()
def clean_triples(spark):
    return _tri(
        spark,
        [
            ("e:a", "p", "e:b"),
            ("e:b", "p", "e:c"),
            ("e:c", "rdf:type", "C"),
            ("e:a", "rdf:type", "C"),
            ("e:b", "rdf:type", "C"),
        ],
    )


def test_publish_end_to_end(spark, tmp_path, clean_triples):
    cat = SnapshotCatalog(str(tmp_path))
    sc = spark.createDataFrame([("C", "D")], "child string, parent string")
    res = publish_kg(
        spark,
        cat,
        clean_triples,
        subclass=sc,
        functional_preds=("p",),
        entity_prefix="e:",
        disjoint_pairs=(("C", "X"),),
        compact_target_rows=1000,
    )
    assert res.n_input == 5 and res.n_derived == 3  # a,b,c type D
    pub = cat.read(spark, "kg_triples")
    assert pub.count() == 8
    assert pub.filter((F.col("pred") == "rdf:type") & (F.col("obj") == "D")).count() == 3
    stats = {r.pred: r.n_triples for r in cat.read(spark, res.stats_table).collect()}
    assert stats["p"] == 2 and stats["rdf:type"] == 6
    assert res.compacted_snapshot is not None
    assert cat.manifest("kg_triples")["current"] == res.compacted_snapshot


def test_gate_failure_aborts_before_any_commit(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path))
    bad = _tri(
        spark,
        [
            ("e:a", "p", "e:b"),
            ("e:a", "p", "e:c"),       # functional violation on p
            ("e:b", "rdf:type", "C"),
            ("e:c", "rdf:type", "C"),
        ],
    )
    with pytest.raises(KGPublishError) as err:
        publish_kg(spark, cat, bad, functional_preds=("p",), entity_prefix="e:")
    assert any(v["check"] == "functional" for v in err.value.violations)
    assert not cat.exists("kg_triples")
    assert not cat.exists("kg_triples_pred_stats")


def test_gate_sees_entailed_violations(spark, tmp_path):
    """A conflict that only exists AFTER entailment must still trip the
    gate: subclassing into one half of a disjoint pair."""
    cat = SnapshotCatalog(str(tmp_path))
    tri = _tri(
        spark,
        [("e:a", "rdf:type", "C"), ("e:a", "rdf:type", "X")],
    )
    sc = spark.createDataFrame([("C", "Y")], "child string, parent string")
    with pytest.raises(KGPublishError) as err:
        publish_kg(
            spark, cat, tri, subclass=sc, disjoint_pairs=(("X", "Y"),)
        )
    assert any(v["check"] == "disjoint" for v in err.value.violations)
    assert not cat.exists("kg_triples")


def test_publish_without_checks_or_ontology(spark, tmp_path, clean_triples):
    cat = SnapshotCatalog(str(tmp_path))
    res = publish_kg(spark, cat, clean_triples, compact_target_rows=None)
    assert res.n_derived == 0 and res.compacted_snapshot is None
    assert cat.read(spark, "kg_triples").count() == 5


def test_range_rule_cannot_mask_dangling_references(spark, tmp_path):
    # e:ghost is referenced by p but described nowhere.  rdfs3 (range p C)
    # mints (e:ghost, rdf:type, C), making it a SUBJECT of the saturated
    # graph — a gate that checked saturation would pass this broken
    # snapshot.  The gate must run danglers against the INPUT triples.
    cat = SnapshotCatalog(str(tmp_path))
    tri = _tri(spark, [("e:a", "p", "e:ghost"), ("e:a", "rdf:type", "C")])
    rng = spark.createDataFrame([("p", "C")], "pred string, cls string")
    with pytest.raises(KGPublishError) as ei:
        publish_kg(
            spark,
            cat,
            tri,
            range_=rng,
            entity_prefix="e:",
            entity_prefixes=("e:",),
            compact_target_rows=None,
        )
    assert any(
        v["check"] == "dangling" and v["key"] == "e:ghost"
        for v in ei.value.violations
    )
    assert not cat.exists("kg_triples")


def test_functional_and_disjoint_still_gate_the_saturated_graph(spark, tmp_path):
    # property inheritance (rdfs7) makes q inherit p's edges; q is declared
    # functional, so the violation only exists on the SATURATED graph —
    # proving those checks did not move to the input side
    cat = SnapshotCatalog(str(tmp_path))
    tri = _tri(
        spark,
        [("e:a", "p", "e:b"), ("e:a", "q", "e:c"),
         ("e:b", "rdf:type", "C"), ("e:c", "rdf:type", "C")],
    )
    sp = spark.createDataFrame([("p", "q")], "child string, parent string")
    with pytest.raises(KGPublishError) as ei:
        publish_kg(
            spark, cat, tri, subproperty=sp, functional_preds=("q",),
            compact_target_rows=None,
        )
    assert any(v["check"] == "functional" for v in ei.value.violations)
