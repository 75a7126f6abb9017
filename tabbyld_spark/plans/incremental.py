"""Incremental re-annotation from a recrawl delta — S1-S6 over added ∪
changed pages only, exactly reproducing the full-recompute result.

Why this is EXACT and not an approximation: every annotation signal in the
chain is table-local given the (fixed) KG — mentions, entry context,
heading/NER ranks, the P16 vote pool and CTA/CPA votes all aggregate
within one ``table_id`` (the reference scores each spreadsheet
independently too: `commands/SpreadsheetController.php` loops files).  So
re-annotating a page's tables in isolation yields byte-identical CEA/CTA/
CPA rows to a full run, and the merged output is provably equal to
annotating the new snapshot from scratch — which the pytest asserts
set-equal, not just count-equal.

The delta computation is `operators.urls.crawl_diff` (digest-grain
full-outer join); invalidation maps annotation rows back to their URL by
peeling the ``#t{idx}`` suffix ``tables_to_canonical`` appended
(`operators/canonical.py:23`).  Entity-typing triples
(entity, rdf:type, owl:Thing) are distinct-aggregated corpus-wide, so the
merge re-emits triples from the merged CEA/CTA/CPA rather than patching
the triple table — triple emission is projection+union+distinct, orders of
magnitude cheaper than annotation.

Scale shape: the expensive path (extract → candidates → features → votes)
runs only on |added ∪ changed| pages; the merge adds one anti-join per
annotation table keyed on the derived URL (broadcast-gated: the
invalidation list is delta-sized) plus the triple re-emission's distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.operators.triples import emit_triples
from tabbyld_spark.operators.urls import crawl_diff
from tabbyld_spark.plans.pipeline import annotate_pages

__all__ = ["refresh_annotations"]


def _url_of_table(col: str = "table_id") -> F.Column:
    # table_id = url + '#t' + table_idx (canonical.py); the url itself may
    # contain '#t', so peel the LAST '#t<digits>' suffix
    return F.regexp_extract(F.col(col), r"^(.*)#t\d+$", 1)


def refresh_annotations(
    old_pages: DataFrame,
    new_pages: DataFrame,
    prev_cea: DataFrame,
    prev_cta: DataFrame,
    prev_cpa: DataFrame,
    kg: dict[str, DataFrame],
    fuzzy_enabled: bool = True,
):
    """→ (cea, cta, cpa, triples) for the NEW snapshot, computed by
    re-annotating only added ∪ changed pages and invalidating removed ∪
    changed rows from the previous run's tables."""
    delta = crawl_diff(old_pages, new_pages)
    redo = delta.filter(F.col("status").isin("added", "changed")).select("url")
    invalid = delta.filter(F.col("status").isin("removed", "changed")).select(
        F.col("url").alias("_url")
    )
    res = annotate_pages(
        new_pages.join(redo, "url", "left_semi"), kg, fuzzy_enabled=fuzzy_enabled
    )

    def _merge(prev: DataFrame, fresh: DataFrame) -> DataFrame:
        kept = (
            prev.withColumn("_url", _url_of_table())
            .join(F.broadcast(invalid), "_url", "left_anti")
            .drop("_url")
        )
        return kept.unionByName(fresh.select(*prev.columns))

    cea = _merge(prev_cea, res.cea)
    cta = _merge(prev_cta, res.cta)
    cpa = _merge(prev_cpa, res.cpa)
    return cea, cta, cpa, emit_triples(cea, cta, cpa)
