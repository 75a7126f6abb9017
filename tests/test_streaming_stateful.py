"""Cross-batch stateful dedup: state must survive micro-batches AND separate
stream invocations (checkpoint resume)."""

import os

import pandas as pd
from pyspark.sql import functions as F

from tabbyld_spark.streaming.stateful import run_streaming_dedup_once, with_fingerprint


def _write_batch(spark, path, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).coalesce(
        1
    ).write.mode("append").parquet(path)


def test_streaming_dedup_across_batches_and_restarts(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _write_batch(
        spark,
        inp,
        [(1, "alpha beta"), (2, "gamma  delta"), (3, "alpha   beta")],  # 3 dups 1
    )
    out1 = run_streaming_dedup_once(spark, inp, ckpt, out)
    got1 = {r["doc_id"] for r in out1.collect()}
    assert got1 == {1, 2}  # doc 3 is a whitespace-variant dup of doc 1

    # later files: one true duplicate of doc 1, one new doc — a SEPARATE
    # invocation resumes from the checkpoint (source offsets + dedup state)
    # and still suppresses the cross-invocation duplicate
    _write_batch(spark, inp, [(10, "Alpha Beta"), (11, "epsilon zeta")])
    out2 = run_streaming_dedup_once(spark, inp, ckpt, out)
    got2 = {r["doc_id"] for r in out2.collect()}
    assert got2 == {1, 2, 11}  # cumulative sink: no doc 3, no doc 10


def test_fingerprint_matches_batch_dedup(spark):
    docs = spark.createDataFrame(
        [(1, " A  b "), (2, "a b")], "doc_id long, text string"
    )
    fps = with_fingerprint(docs).select("fp").distinct().count()
    assert fps == 1  # same normalization as operators.dedup.exact_dedup


def test_rdf_partitioned_matches_driver_render(spark, tmp_path):
    from tabbyld_spark.operators.export import (
        assemble_rdf_xml,
        render_rdf_xml,
        write_rdf_xml_partitioned,
    )

    cea = spark.createDataFrame(
        [
            ("t1", "DATA", "Paris", "Paris", "http://dbpedia.org/resource/Paris", 2.0),
            ("t1", "DATA", "42", "42", "http://dbpedia.org/resource/Number", 1.0),
            ("t2", "DATA", "A&B", "AB", "http://dbpedia.org/resource/AB", 1.5),
        ],
        "table_id string, col_role string, mention string, mention_norm string, entity string, agg_rank double",
    ).repartition(4)
    want = render_rdf_xml(cea)
    path = str(tmp_path / "rdf")
    write_rdf_xml_partitioned(cea, path)
    got_file = assemble_rdf_xml(path, str(tmp_path / "out.xml"))
    with open(got_file) as f:
        got = f.read()
    assert got.strip() == want.strip()
