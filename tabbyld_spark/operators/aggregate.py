"""Rank aggregation (P18/P19) + disambiguation (P20) + CTA/CPA voting.

Aggregation formulas (weights all 1 in the reference, CanonicalTableAnnotator
.php:1297-1298, 1009):

  DATA     agg = (1 − lev/100) + ner_rank + (1 − heading_rank/100)
                 + ctx_rank + sem_rank                     (:860-863)
  headings agg = (1 − lev/100) + ner_rank + 1               (:409-410;
                 the relationship term is hard-coded to 1)

CEA (P20): argmax candidate per (table, role, mention) — the reference's
``ORDER BY aggregated_rank DESC LIMIT 1`` is tie-nondeterministic
(SpreadsheetController.php:588-592); we add a deterministic tiebreak
(entity asc).

CTA / CPA: recast per BASELINE.json north_star as groupBy majority voting
over linked cells — CTA votes the winners' dbo classes per column; CPA votes
the KG predicate linking each row's key-entity to its data-entity per column
pair (the reference's relationship counting, P17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabbyld_spark.fixtures.kg import DBO
from tabbyld_spark.functions.normalize import split_multivalue

DATA_WEIGHTS = (1.0, 1.0, 1.0, 1.0, 1.0)
HEADING_WEIGHTS = (1.0, 1.0, 1.0)


def aggregate_ranks(cands: DataFrame) -> DataFrame:
    """One vectorized expression over the wide candidates DataFrame."""
    w_ld, w_ncr, w_hr, w_cs, w_ss = DATA_WEIGHTS
    h_ld, h_ncr, h_r = HEADING_WEIGHTS
    data_agg = (
        w_ld * (1 - F.col("lev") / 100)
        + w_ncr * F.col("ner_rank")
        + w_hr * (1 - F.col("heading_rank") / 100)
        + w_cs * F.col("ctx_rank")
        + w_ss * F.col("sem_rank")
    )
    head_agg = h_ld * (1 - F.col("lev") / 100) + h_ncr * F.col("ner_rank") + h_r * 1
    return cands.withColumn(
        "agg_rank", F.when(F.col("col_role") == "DATA", data_agg).otherwise(head_agg)
    )


def cea_top1(scored: DataFrame, literals: DataFrame | None = None) -> DataFrame:
    """P20 → (table_id, col_role, mention, mention_norm, entity, agg_rank).
    Windows on the surrogate mention_key (partitioning reused from the
    feature-stack exchanges)."""
    from tabbyld_spark.operators.features import ensure_keys

    scored = ensure_keys(scored)
    cols = ["table_id", "col_role", "mention", "mention_norm", "entity", "agg_rank"]
    # window keys: surrogate long FIRST (drives the hash partitioning) plus
    # the original strings — a mention_key collision then still windows the
    # two mentions separately instead of silently crowning one winner for
    # both (same shuffle volume; the strings ride along anyway)
    w = Window.partitionBy("mention_key", "table_id", "col_role", "mention").orderBy(
        F.desc("agg_rank"), F.asc("entity")
    )
    top = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*cols)
    )
    if literals is not None:
        top = top.unionByName(literals.select(*cols))
    return top


def cta_vote(
    cea: DataFrame,
    canonical: DataFrame,
    kg_types: DataFrame,
    cea_rows: int | None = None,
) -> DataFrame:
    """Majority dbo class of each column's winning DATA entities.
    → (table_id, column, class, votes)

    The cell side joins at raw cell grain on purpose: a pre-aggregation to
    distinct (table, column, value) + count was measured SLOWER here (+4s at
    4 cores / 80k pages) because synthetic-crawl cell vocabulary is
    near-unique, so the extra hash aggregate and second exchange bought no
    reduction.  On a corpus whose columns repeat their vocabulary heavily,
    reintroduce it (groupBy(table_id, column, mention).count() before the
    join, votes = Σ cnt) — the trade is duplication-factor-dependent, not
    universally right.

    ``cea_rows``: exact row count of the (checkpointed) CEA frame, when the
    caller has it — gates a broadcast of the winners side so the full-width
    canonical cell scan never sorts/shuffles for this join (the same
    count-gated pattern as the feature join-backs; unknown ⇒ leave the plan
    to the session planner as before)."""
    from tabbyld_spark.functions.joins import count_gated_hint

    cells = canonical.select(
        "table_id", F.col("column_heading").alias("column"), F.col("data").alias("mention")
    )
    winners = cea.filter(F.col("col_role") == "DATA").select(
        "table_id", "mention", "entity"
    )
    if cea_rows is not None:
        # string-bearing rows: ~2x the narrow-feature estimate per row
        winners = count_gated_hint(winners, cea_rows, row_bytes=128)
    votes = (
        cells.join(winners, ["table_id", "mention"])
        .join(kg_types.filter(F.col("class").startswith(DBO)), "entity")
        .groupBy("table_id", "column", "class")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("table_id", "column").orderBy(
        F.desc("votes"), F.asc("class")
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cpa_vote(
    cea: DataFrame,
    canonical: DataFrame,
    kg_triples: DataFrame,
    cea_rows: int | None = None,
) -> DataFrame:
    """Majority KG predicate between each row's key entity (RowHeading winner)
    and its data entity, per (table, column) pair.
    → (table_id, col_a='RowHeading', col_b=column, pred, votes)

    ``cea_rows``: exact CEA row count for count-gated broadcast of both
    winner sides (see cta_vote)."""
    from tabbyld_spark.functions.joins import count_gated_hint

    # raw cell grain, same rationale as cta_vote (pre-aggregation to distinct
    # combos measured slower on near-unique synthetic-crawl vocabulary)
    rows = canonical.select(
        "table_id",
        F.explode(split_multivalue("row_heading")).alias("row_mention"),
        F.col("column_heading").alias("col_b"),
        F.col("data").alias("data_mention"),
    )
    row_w = cea.filter(F.col("col_role") == "ROW").select(
        "table_id", F.col("mention").alias("row_mention"), F.col("entity").alias("subj")
    )
    data_w = cea.filter(F.col("col_role") == "DATA").select(
        "table_id", F.col("mention").alias("data_mention"), F.col("entity").alias("obj")
    )
    if cea_rows is not None:
        row_w = count_gated_hint(row_w, cea_rows, row_bytes=128)
        data_w = count_gated_hint(data_w, cea_rows, row_bytes=128)
    votes = (
        rows.join(row_w, ["table_id", "row_mention"])
        .join(data_w, ["table_id", "data_mention"])
        .join(kg_triples, ["subj", "obj"])
        .groupBy("table_id", "col_b", "pred")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("table_id", "col_b").orderBy(F.desc("votes"), F.asc("pred"))
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .select(
            "table_id",
            F.lit("RowHeading").alias("col_a"),
            "col_b",
            "pred",
            "votes",
        )
    )
