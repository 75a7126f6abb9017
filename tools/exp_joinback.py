#!/usr/bin/env python
"""One-off experiment: isolate the q_sti_pipeline r1->r2 regression.

Usage: exp_joinback.py <threshold_mb> <hints:merge|none|broadcast>
Times best-of-two warm passes of annotate_pages at 12k pages, local[32].
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

threshold_mb = int(sys.argv[1])
hints = sys.argv[2]

from tabbyld_spark.session import get_spark  # noqa: E402

spark = get_spark(
    "exp-joinback",
    cores=32,
    shuffle_partitions=32,
    extra_conf={
        "spark.sql.autoBroadcastJoinThreshold": str(threshold_mb * 1024 * 1024)
    },
)
spark.sparkContext.setLogLevel("ERROR")

from tabbyld_spark.operators import features as FT  # noqa: E402

if hints != "merge":
    def _join_back(cands, feats, fill):
        from pyspark.sql import functions as F
        if hints == "broadcast":
            feats = F.broadcast(feats)
        return cands.join(feats, FT._KEY, "left").fillna(fill)
    FT._join_back = _join_back

from tabbyld_spark.fixtures.kg import build_kg  # noqa: E402
from tabbyld_spark.fixtures.pages import gen_pages_df  # noqa: E402
from tabbyld_spark.plans.pipeline import annotate_pages  # noqa: E402

kg = build_kg(seed=42)
pages = gen_pages_df(spark, kg, n_pages=12000, seed=42, partitions=32).persist()
pages.count()
kgs = kg.to_spark(spark)
annotate_pages(pages, kgs, fuzzy_enabled=True).triples.count()  # warm-up
best, n = None, 0
for _ in range(2):
    t0 = time.time()
    n = annotate_pages(pages, kgs, fuzzy_enabled=True).triples.count()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print(f"RESULT threshold={threshold_mb}MB hints={hints} sec={best:.1f} triples={n}")
spark.stop()
