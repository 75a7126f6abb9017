"""Evaluation (P23) — accuracy / precision / recall / F1 vs gold, the
reference's T2Dv2-style per-cell compare
(/root/reference/commands/SpreadsheetController.php:453-494, 702-727):

  accuracy  = annotated / total
  precision = correct / annotated
  recall    = correct / total
  F1        = 2PR / (P + R)

computed as one join + one aggregate per task; grain = (table_id, col_role,
mention) for CEA, (table_id, column) for CTA, (table_id, col_a, col_b) for CPA.

The reference also PERSISTS these at two grains — per table
(migrations/m200131_135413_create_annotated_canonical_table_table.php) and
per dataset (m200131_135355_create_annotated_dataset_table.php), both with
runtimes (SpreadsheetController.php:702-742).  ``evaluate_tables`` /
``dataset_metrics`` produce those rows as DataFrames (no driver collect —
micro-averaged dataset grain is an aggregate of the per-table counts), for
the catalog to commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _metrics(joined: DataFrame, pred_col: str, gold_col: str) -> dict[str, float]:
    row = joined.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(pred_col).isNotNull(), 1).otherwise(0)).alias("annotated"),
        F.sum(
            F.when(F.col(pred_col) == F.col(gold_col), 1).otherwise(0)
        ).alias("correct"),
    ).collect()[0]
    total, annotated, correct = row["total"], row["annotated"] or 0, row["correct"] or 0
    precision = correct / annotated if annotated else 0.0
    recall = correct / total if total else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "total": total,
        "annotated": annotated,
        "correct": correct,
        "accuracy": annotated / total if total else 0.0,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def evaluate_cea(cea: DataFrame, gold_cea: DataFrame) -> dict[str, float]:
    pred = cea.select(
        "table_id", "col_role", "mention", F.col("entity").alias("pred_entity")
    )
    j = gold_cea.join(pred, ["table_id", "col_role", "mention"], "left")
    return _metrics(j, "pred_entity", "entity")


def evaluate_cta(cta: DataFrame, gold_cta: DataFrame) -> dict[str, float]:
    pred = cta.select("table_id", "column", F.col("class").alias("pred_class"))
    j = gold_cta.join(pred, ["table_id", "column"], "left")
    return _metrics(j, "pred_class", "class")


def evaluate_cpa(cpa: DataFrame, gold_cpa: DataFrame) -> dict[str, float]:
    pred = cpa.select("table_id", "col_a", "col_b", F.col("pred").alias("pred_pred"))
    j = gold_cpa.join(pred, ["table_id", "col_a", "col_b"], "left")
    return _metrics(j, "pred_pred", "pred")


def _table_metric_rows(joined: DataFrame, pred_col: str, gold_col: str, task: str) -> DataFrame:
    counts = joined.groupBy("table_id").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(pred_col).isNotNull(), 1).otherwise(0)).alias("annotated"),
        F.sum(F.when(F.col(pred_col) == F.col(gold_col), 1).otherwise(0)).alias("correct"),
    )
    p = F.when(F.col("annotated") > 0, F.col("correct") / F.col("annotated")).otherwise(F.lit(0.0))
    r = F.when(F.col("total") > 0, F.col("correct") / F.col("total")).otherwise(F.lit(0.0))
    return (
        counts.select(F.lit(task).alias("task"), "*")
        .withColumn("accuracy", F.when(F.col("total") > 0, F.col("annotated") / F.col("total")).otherwise(F.lit(0.0)))
        .withColumn("precision", p)
        .withColumn("recall", r)
        .withColumn(
            "f1",
            F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)),
        )
    )


def evaluate_tables(
    cea: DataFrame,
    cta: DataFrame,
    cpa: DataFrame,
    gold_cea: DataFrame,
    gold_cta: DataFrame,
    gold_cpa: DataFrame,
) -> DataFrame:
    """Per-(table, task) metric rows — the reference's AnnotatedCanonicalTable
    grain: (task, table_id, total, annotated, correct, accuracy, precision,
    recall, f1)."""
    cea_j = gold_cea.join(
        cea.select("table_id", "col_role", "mention", F.col("entity").alias("_p")),
        ["table_id", "col_role", "mention"],
        "left",
    )
    cta_j = gold_cta.join(
        cta.select("table_id", "column", F.col("class").alias("_p")),
        ["table_id", "column"],
        "left",
    )
    cpa_j = gold_cpa.join(
        cpa.select("table_id", "col_a", "col_b", F.col("pred").alias("_p")),
        ["table_id", "col_a", "col_b"],
        "left",
    )
    return (
        _table_metric_rows(cea_j, "_p", "entity", "CEA")
        .unionByName(_table_metric_rows(cta_j, "_p", "class", "CTA"))
        .unionByName(_table_metric_rows(cpa_j, "_p", "pred", "CPA"))
    )


def dataset_metrics(table_metrics: DataFrame, runtime_sec: float | None = None) -> DataFrame:
    """Dataset-grain rollup (reference AnnotatedDataset): micro-averaged over
    the per-table counts, one row per task, with the run's wall time."""
    agg = table_metrics.groupBy("task").agg(
        F.count(F.lit(1)).alias("n_tables"),
        F.sum("total").alias("total"),
        F.sum("annotated").alias("annotated"),
        F.sum("correct").alias("correct"),
    )
    p = F.when(F.col("annotated") > 0, F.col("correct") / F.col("annotated")).otherwise(F.lit(0.0))
    r = F.when(F.col("total") > 0, F.col("correct") / F.col("total")).otherwise(F.lit(0.0))
    return (
        agg.withColumn("accuracy", F.when(F.col("total") > 0, F.col("annotated") / F.col("total")).otherwise(F.lit(0.0)))
        .withColumn("precision", p)
        .withColumn("recall", r)
        .withColumn("f1", F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0)))
        .withColumn("runtime_sec", F.lit(runtime_sec).cast("double"))
    )
