#!/usr/bin/env python
"""Stage-level wall-time profile of the webcorpus prep plan at a given core
count — the diagnostic for the webcorpus scaling gate (which stage stops
scaling when cores quadruple?).

Usage:  taskset -c 0-3 python tools/profile_webcorpus.py 4 80000

Mirrors prep_web_corpus's exact composition (W2 extract → W3 line dedup →
W4 prep_corpus survivors+join → W5 chunk → W5b pack), materializing each
stage with a noop write and persisting it as the next stage's input so each
timing isolates one stage's work.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from tabbyld_spark.session import get_spark
from tabbyld_spark.fixtures.kg import build_kg
from tabbyld_spark.fixtures.pages import gen_pages_df


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 80000
    spark = get_spark(f"wcprof-{cores}", cores=cores, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    kg = build_kg(seed=42)
    pages = gen_pages_df(spark, kg, n_pages=n_pages, seed=42, partitions=32).persist()
    pages.count()

    # warm pass (codegen/JIT/python workers) on a disjoint input
    from tabbyld_spark.plans.webcorpus import prep_web_corpus
    kw = dict(max_tokens=128, overlap=16, seq_len=2048, n_buckets=64)
    prep_web_corpus(gen_pages_df(spark, kg, n_pages=1500, seed=7, partitions=16), **kw).count()

    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.operators.dedup import line_dedup
    from tabbyld_spark.plans.dataprep import prep_corpus
    from tabbyld_spark.operators.chunking import chunk_documents, pack_sequences

    times = {}

    def mark(name, t0):
        dt = time.time() - t0
        times[name] = round(dt, 2)
        print(f"  {name:22s} {dt:8.2f}s", flush=True)

    t0 = time.time()
    docs = extract_pages(pages).select(
        F.col("url").alias("doc_id"), F.col("extracted_text").alias("text")
    ).persist()
    docs.count()
    mark("W2_extract", t0)

    t0 = time.time()
    deduped = line_dedup(docs).select("doc_id", "text").persist()
    deduped.count()
    mark("W3_line_dedup", t0)

    t0 = time.time()
    surv = prep_corpus(deduped, lang="en").select("doc_id").persist()
    surv.count()
    mark("W4_prep_corpus", t0)

    t0 = time.time()
    kept = deduped.join(surv, "doc_id").select("doc_id", "text")
    chunks = chunk_documents(kept, max_tokens=kw["max_tokens"], overlap=kw["overlap"])
    keyed = chunks.withColumn(
        "seq_key", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
    ).persist()
    keyed.count()
    mark("W5_chunk", t0)

    t0 = time.time()
    packed = pack_sequences(
        keyed, seq_len=kw["seq_len"], n_buckets=kw["n_buckets"],
        id_col="seq_key", tokens_col="n_chunk_tokens",
    )
    noop(packed)
    mark("W5b_pack", t0)

    t0 = time.time()
    n = prep_web_corpus(pages, **kw).count()
    mark("full_chain", t0)

    print({"cores": cores, "n_pages": n_pages, "n_chunks": n, "times": times})


if __name__ == "__main__":
    main()
