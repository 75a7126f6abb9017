"""RDF/XML + OWL export (P24/P25): well-formed XML, reference node shapes,
OWL axiom coverage — on the golden pipeline result."""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.fixtures.kg import NER_INSTANCE
from tabbyld_spark.operators.export import owl_triples, rdf_fragments, render_rdf_xml
from tabbyld_spark.plans.pipeline import annotate_pages


@pytest.fixture(scope="module")
def result(spark, kg_spark, pages_fx):
    pages = spark.createDataFrame(pages_fx.pages.head(25))
    return annotate_pages(pages, kg_spark, fuzzy_enabled=True)


def test_rdf_xml_well_formed(result):
    doc = render_rdf_xml(result.cea, table_name="t")
    root = ET.fromstring(doc)  # raises on malformed XML
    assert root.tag.endswith("RDF")
    assert len(root) > 0


def test_rdf_fragment_shapes(result):
    frags = [r["fragment"] for r in rdf_fragments(result.cea).collect()]
    assert frags
    owl_nodes = [f for f in frags if f.startswith("\t<owl:Thing rdf:about=")]
    assert owl_nodes, "no named-entity nodes"
    # full entity URI preserved (reference truncates at last '/', documented delta)
    assert all("http" in f for f in owl_nodes)
    lit_nodes = [f for f in frags if f.startswith("\t<base:")]
    if lit_nodes:  # literal cells exist in the fixture
        assert all("http://www.example.org/#" in f for f in lit_nodes)


def test_owl_axioms(result, kg_spark):
    owl = owl_triples(result.cea, result.cta, result.cpa, kg_spark["kg_subclass"]).cache()
    preds = {r["pred"] for r in owl.select("pred").distinct().collect()}
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" in preds
    objs = {r["obj"] for r in owl.select("obj").distinct().collect()}
    assert "http://www.w3.org/2002/07/owl#Class" in objs
    assert "http://www.w3.org/2002/07/owl#NamedIndividual" in objs
    # no nulls anywhere
    assert owl.filter(
        F.col("subj").isNull() | F.col("pred").isNull() | F.col("obj").isNull()
    ).count() == 0


def test_owl_datatype_properties(spark, kg_spark):
    """A literal-annotated cell must produce a DatatypeProperty with the
    sniffed xsd range (OWLCodeGenerator.php:38-50 semantics)."""
    cea = spark.createDataFrame(
        [("t1", "DATA", "42", "42", NER_INSTANCE["NUMBER"], 1.0)],
        "table_id string, col_role string, mention string, mention_norm string, entity string, agg_rank double",
    )
    empty_cta = spark.createDataFrame([], "table_id string, column string, class string, votes long")
    empty_cpa = spark.createDataFrame([], "table_id string, col_a string, col_b string, pred string, votes long")
    owl = owl_triples(cea, empty_cta, empty_cpa, kg_spark["kg_subclass"])
    rows = {(r["subj"], r["pred"], r["obj"]) for r in owl.collect()}
    assert ("t1#DATA", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://www.w3.org/2002/07/owl#DatatypeProperty") in rows
    assert ("t1#DATA", "http://www.w3.org/2000/01/rdf-schema#range",
            "http://www.w3.org/2001/XMLSchema#double") in rows
