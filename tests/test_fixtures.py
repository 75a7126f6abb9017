"""Fixture generator invariants: determinism, KG shape, gold consistency."""

from tabbyld_spark.fixtures.kg import CLASS_TREE, build_kg
from tabbyld_spark.fixtures.pages import gen_pages_df, gen_pages_pd


def test_kg_shape(kg):
    assert len(kg.labels) > 400
    assert len(CLASS_TREE) >= 40
    # closure includes self-pairs at depth 0
    self_pairs = kg.subclass[(kg.subclass.child == kg.subclass.parent)]
    assert (self_pairs.depth == 0).all()
    # every typed class is in the closure
    classes = set(kg.subclass.child)
    assert set(kg.types["class"]).issubset(classes)


def test_kg_deterministic(kg):
    kg2 = build_kg(seed=42)
    assert kg.labels.equals(kg2.labels)
    assert kg.triples.equals(kg2.triples)


def test_homonyms_planted(kg):
    dup = kg.labels.groupby("surface_form")["entity"].nunique()
    assert (dup > 1).any()


def test_gold_consistency(pages_fx):
    # every gold CEA entity exists in the KG label table namespace
    assert pages_fx.gold_cea.entity.str.startswith("http://").all()
    # canonical rows reference gold tables
    assert set(pages_fx.canonical.table_id) >= set(pages_fx.gold_cta.table_id)


def test_distributed_generation_matches_driver_side(spark, kg, pages_fx):
    df = gen_pages_df(spark, kg, n_pages=30, seed=42, partitions=5)
    got = {r["url"]: r for r in df.collect()}
    want = pages_fx.pages.head(30)
    assert len(got) == 30
    for _, w in want.iterrows():
        g = got[w.url]
        assert g["text"] == w.text
        assert bytes(g["html"]) == w.html
        assert g["lang"] == w.lang
