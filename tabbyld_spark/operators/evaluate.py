"""Evaluation (P23) — accuracy / precision / recall / F1 vs gold, the
reference's T2Dv2-style per-cell compare
(/root/reference/commands/SpreadsheetController.php:453-494, 702-727):

  accuracy  = annotated / total
  precision = correct / annotated
  recall    = correct / total
  F1        = 2PR / (P + R)

computed as one join + one aggregate per task; grain = (table_id, col_role,
mention) for CEA, (table_id, column) for CTA, (table_id, col_a, col_b) for CPA.
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
