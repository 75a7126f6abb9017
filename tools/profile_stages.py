#!/usr/bin/env python
"""Stage-level wall-time profile of the STI pipeline at a given core count.

Usage:  taskset -c 0-7 python tools/profile_stages.py 8 20000

Times each pipeline stage by forcing materialization (noop write) so we can
see which stages dominate and which fail to scale with cores.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from tabbyld_spark.session import get_spark
from tabbyld_spark.fixtures.kg import build_kg
from tabbyld_spark.fixtures.pages import gen_pages_df


def mark(times, name, t0):
    dt = time.time() - t0
    times[name] = round(dt, 2)
    print(f"  {name:28s} {dt:8.2f}s", flush=True)
    return time.time()


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = get_spark(f"profile-{cores}", cores=cores, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    kg = build_kg(seed=42)
    pages = gen_pages_df(spark, kg, n_pages=n_pages, seed=42, partitions=16).persist()
    pages.count()
    kgs = kg.to_spark(spark)

    if "--warm" in sys.argv:
        from tabbyld_spark.plans.pipeline import annotate_pages
        warm = gen_pages_df(spark, kg, n_pages=1500, seed=7, partitions=16)
        annotate_pages(warm, kgs, fuzzy_enabled=True).triples.count()

    # EXACT composition of plans/pipeline.annotate_pages/annotate_canonical:
    # fused P10+P11, count-gated join-backs (feat_rows), cut() lineage
    # boundaries — an un-fused/un-gated composition here overstates the S4
    # stages (the ungated join-backs fall back to sort-merge) and misleads
    # optimization; keep this in lockstep with pipeline.py
    import os as _os

    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.functions.lineage import cut
    from tabbyld_spark.functions.ner import attach_ner, build_gazetteer
    from tabbyld_spark.operators import features as FT
    from tabbyld_spark.operators.aggregate import aggregate_ranks, cea_top1, cpa_vote, cta_vote
    from tabbyld_spark.operators.candidates import generate_candidates
    from tabbyld_spark.operators.canonical import tables_to_canonical
    from tabbyld_spark.operators.fuzzy import lsh_fuzzy_candidates
    from tabbyld_spark.operators.mentions import all_mentions, entry_context
    from tabbyld_spark.operators.triples import emit_triples

    p16_salt = int(_os.environ.get("SPARK_GRAFT_P16_SALT", "1"))
    times = {}
    T0 = time.time()
    t0 = time.time()

    canonical = cut(tables_to_canonical(extract_pages(pages)))
    t0 = mark(times, "S1_extract_canonical", t0)

    mentions = all_mentions(canonical, provided_ner=False)
    gaz = build_gazetteer(kgs["kg_labels"], kgs["kg_types"], kgs["kg_subclass"])
    mentions = cut(attach_ner(mentions, gaz))
    t0 = mark(times, "S2_mentions_ner", t0)

    fuzzy = lsh_fuzzy_candidates(mentions, kgs["kg_labels"])
    literals, cands = generate_candidates(mentions, kgs["kg_labels"], fuzzy=fuzzy)
    cands = cut(cands)
    n_cands = cands.count()
    t0 = mark(times, "S3_candidates_fuzzy", t0)

    cands = cut(FT.base_feature_ranks(
        cands, kgs["kg_types"], kgs["kg_subclass"], feat_rows=n_cands
    ))
    t0 = mark(times, "S4ab_base_ranks", t0)

    ectx = entry_context(canonical)
    kctx = FT.entity_context(cands, kgs["kg_triples"])
    cands = cut(FT.context_similarity(cands, ectx, kctx, feat_rows=n_cands))
    t0 = mark(times, "S4c_context_sim", t0)

    pcl = FT.parent_classes(cands, kgs["kg_triples"])
    cands = cut(FT.semantic_similarity(
        cands, pcl, salt=p16_salt, feat_rows=n_cands
    ))
    t0 = mark(times, "S4d_semantic_sim", t0)

    scored = aggregate_ranks(cands)
    cea = cut(cea_top1(scored, literals))
    n_cea = cea.count()
    t0 = mark(times, "S5a_cea", t0)

    cta = cut(cta_vote(cea, canonical, kgs["kg_types"], cea_rows=n_cea))
    cpa = cut(cpa_vote(cea, canonical, kgs["kg_triples"], cea_rows=n_cea))
    t0 = mark(times, "S5b_cta_cpa", t0)

    triples = emit_triples(cea, cta, cpa)
    n = triples.count()
    t0 = mark(times, "S6_triples", t0)

    total = round(time.time() - T0, 2)
    print(json.dumps({"cores": cores, "n_pages": n_pages, "n_triples": n,
                      "total_sec": total, "stages": times}))


if __name__ == "__main__":
    main()
