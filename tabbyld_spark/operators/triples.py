"""Triple emission (P24) + annotated-table materialization (P21).

The reference serializes RDF/XML (/root/reference/components/
RDFCodeGenerator.php:21-109); the *semantic* output is the (subj, pred, obj)
set, which is what we materialize (RDF/XML rendering is a presentation
concern).  Predicate namespace below is ours; entity/class URIs are the KG's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.functions.normalize import split_multivalue

NS = "https://tabbyld-spark.example.org/ns#"
P_CEA = NS + "cea"
P_CTA = NS + "cta"
P_CPA = NS + "cpa"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"


def _cell_uri() -> F.Column:
    return F.concat_ws(
        "#", F.col("table_id"), F.col("col_role"), F.col("mention_norm")
    )


def emit_triples(cea: DataFrame, cta: DataFrame, cpa: DataFrame) -> DataFrame:
    """→ triples(subj, pred, obj): cell→entity links, entity typing
    (owl:Thing per RDFCodeGenerator.php:24-36), column→class, columnpair→pred."""
    cea_t = cea.select(
        _cell_uri().alias("subj"), F.lit(P_CEA).alias("pred"), F.col("entity").alias("obj")
    )
    typ_t = cea.select(
        F.col("entity").alias("subj"), F.lit(RDF_TYPE).alias("pred"), F.lit(OWL_THING).alias("obj")
    ).distinct()
    cta_t = cta.select(
        F.concat_ws("#", "table_id", "column").alias("subj"),
        F.lit(P_CTA).alias("pred"),
        F.col("class").alias("obj"),
    )
    cpa_t = cpa.select(
        F.concat_ws("#", "table_id", "col_a", "col_b").alias("subj"),
        F.lit(P_CPA).alias("pred"),
        F.col("pred").alias("obj"),
    )
    return cea_t.unionByName(typ_t).unionByName(cta_t).unionByName(cpa_t)


def annotate_rows(canonical: DataFrame, cea: DataFrame) -> DataFrame:
    """P21 (SpreadsheetController.php:569-684): rebuild each canonical row
    substituting winning entity URIs; multi-valued headings re-packed with
    " | " preserving part order."""
    data_w = cea.filter(F.col("col_role") == "DATA").select(
        "table_id", F.col("mention").alias("data"), F.col("entity").alias("data_uri")
    )
    out = canonical.join(data_w, ["table_id", "data"], "left")

    # both heading columns annotated in ONE pass: explode row+column parts
    # tagged by role, join the ROW/COL winners once, and pivot back to the two
    # packed columns in a single groupBy — one join + one shuffle instead of
    # the 2x(join+groupBy+join-back) a per-column helper would cost (stage
    # count is itself a scaling cost at 200+ stages per pipeline run)
    parts = canonical.select(
        "table_id",
        "row_idx",
        "col_idx",
        F.explode(
            F.array(
                F.struct(F.lit("ROW").alias("col_role"), split_multivalue("row_heading").alias("arr")),
                F.struct(F.lit("COL").alias("col_role"), split_multivalue("column_heading").alias("arr")),
            )
        ).alias("h"),
    ).select(
        "table_id", "row_idx", "col_idx", F.col("h.col_role").alias("col_role"),
        F.posexplode("h.arr").alias("pos", "part"),
    )
    w = cea.filter(F.col("col_role").isin("ROW", "COL")).select(
        "table_id", "col_role", F.col("mention").alias("part"), F.col("entity").alias("part_uri")
    )

    def _packed(role: str) -> F.Column:
        # collect_list drops the nulls the F.when leaves on the other role
        return F.concat_ws(
            " | ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("col_role") == role,
                            F.struct("pos", F.coalesce("part_uri", "part").alias("v")),
                        )
                    )
                ),
                lambda s: s["v"],
            ),
        )

    ann = (
        parts.join(w, ["table_id", "col_role", "part"], "left")
        .groupBy("table_id", "row_idx", "col_idx")
        .agg(
            _packed("ROW").alias("row_heading_annotated"),
            _packed("COL").alias("column_heading_annotated"),
        )
    )
    out = out.join(ann, ["table_id", "row_idx", "col_idx"], "left")
    return out.select(
        "table_id",
        "row_idx",
        "col_idx",
        F.coalesce("data_uri", "data").alias("data"),
        F.col("row_heading_annotated").alias("row_heading"),
        F.col("column_heading_annotated").alias("column_heading"),
    )
