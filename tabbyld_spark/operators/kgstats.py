"""KG output-side statistics — the profile a KG-construction pipeline
publishes alongside its triples.

The reference pipeline emits triples and stops
(``components/RDFCodeGenerator.php:116-154`` renders them to RDF/XML); a
web-scale KG build additionally needs the graph's shape summarized for
curation and sanity gates: predicate frequency (is one relation 99% of the
graph?), entity degrees (hub detection, skew planning for downstream
self-joins), and per-triple support when the same fact is extracted from
many pages.  All three are plain aggregations — the scale cost is one
shuffle each, always at a grain no larger than the input:

* ``predicate_stats`` — predicate grain: the predicate vocabulary of a KG
  is tiny (thousands), so the result is broadcastable and the aggregate is
  map-side-combined to almost nothing before the exchange.
* ``degree_stats`` — node grain: two map-side-combined counts (out over
  src, in over dst) + one full-outer node-grain join.  Degree skew surfaced
  here is exactly what the canonicalization self-join's salting needs.
* ``annotate_triple_stats`` — triple grain in, triple grain out: each
  triple annotated with its predicate's corpus frequency (broadcast
  join-back of the tiny predicate table) and its subject's out-degree
  (subj-grain aggregate joined back on subj — the one real shuffle, sized
  by distinct subjects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "predicate_stats",
    "degree_stats",
    "annotate_triple_stats",
    "infer_predicate_schema",
]


def predicate_stats(triples: DataFrame) -> DataFrame:
    """→ (pred, n_triples, n_subjects, n_objects) — the relation-frequency
    profile of the emitted KG."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("obj").alias("n_objects"),
    )


def degree_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """→ (node, out_deg, in_deg) over a directed edge set.  Nodes that only
    ever appear on one side (dangling sinks, orphan sources) get 0 for the
    missing direction — same node universe as connected components."""
    out_d = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_d = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return out_d.join(in_d, "node", "full").select(
        "node",
        F.coalesce("out_deg", F.lit(0)).cast("long").alias("out_deg"),
        F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
    )


def annotate_triple_stats(triples: DataFrame) -> DataFrame:
    """Annotate each (subj, pred, obj) row with ``n_pred`` (how many triples
    share its predicate) and ``n_subj_triples`` (its subject's out-degree).
    Downstream confidence/pruning rules key on exactly these: a predicate
    seen once in a billion triples is suspect, a subject with 10^6 outgoing
    edges is a hub to quarantine before any self-join."""
    preds = predicate_stats(triples).select("pred", "n_triples")
    subj_d = triples.groupBy("subj").agg(
        F.count(F.lit(1)).alias("n_subj_triples")
    )
    return (
        triples.join(F.broadcast(preds), "pred")
        .join(subj_d, "subj")
        .select(
            *triples.columns,
            F.col("n_triples").cast("long").alias("n_pred"),
            F.col("n_subj_triples").cast("long").alias("n_subj_triples"),
        )
    )


def infer_predicate_schema(
    triples: DataFrame,
    types: DataFrame,
    min_share: float = 0.8,
    type_pred: str = "rdf:type",
) -> DataFrame:
    """Schema induction — infer each predicate's domain and range from the
    DATA (the inverse of ``entailment.rdfs_entailment``, which applies a
    declared schema): for every predicate, the majority class of its
    subjects and of its objects, with the share of typed endpoints that
    class covers → (pred, end, cls, n_typed, share, confident).

    ``types`` is (entity, cls) — pass the rdf:type selection of the graph
    (or the saturated one for coarser classes).  ``confident`` flags
    majorities at/above ``min_share``; below it the predicate is
    polymorphic and a curation pass should look at it before the schema is
    published.  An entity typed with k classes contributes to k candidate
    rows — the share denominator counts (endpoint, class) assignments, so
    shares within one predicate+end sum to 1 over classes.

    Scale shape: two endpoint→type joins (the type table keys on entity;
    at web scale it is the big side, so the join shuffles on the entity
    key both carry), then a (pred, end, cls)-grain count and a window-free
    argmax via ``max_by`` over a (pred, end)-grain aggregate — everything
    map-side-combines, grain never exceeds predicate×class."""
    t = types.select(F.col("entity"), F.col("cls"))
    base = triples.filter(F.col("pred") != type_pred)
    ends = (
        base.select("pred", F.col("subj").alias("entity"), F.lit("domain").alias("end"))
        .unionByName(
            base.select(
                "pred", F.col("obj").alias("entity"), F.lit("range").alias("end")
            )
        )
        .join(t, "entity")
        .groupBy("pred", "end", "cls")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = (
        ends.groupBy("pred", "end")
        .agg(
            # deterministic majority: max count, class-name DESC tiebreak
            # (max_by over struct(n, cls) compares lexicographically)
            F.max_by(
                F.struct(F.col("cls"), F.col("n")),
                F.struct(F.col("n"), F.col("cls")),
            ).alias("top"),
            F.sum("n").alias("n_typed"),
        )
        .select(
            "pred",
            "end",
            F.col("top.cls").alias("cls"),
            F.col("n_typed").cast("long").alias("n_typed"),
            (F.col("top.n") / F.col("n_typed")).alias("share"),
        )
        .withColumn("confident", F.col("share") >= F.lit(float(min_share)))
    )
    return ranked
