"""The north rule's deployment shape, exercised for real: package the engine
as pipeline.zip, launch ``spark-submit --py-files pipeline.zip job.py ...`` as
a child JVM, and check the committed artifacts — synth input, the resumable
annotate run (including a second invocation that must RESUME, not recompute),
and the JSON summary contract every job prints.

webprep/graph are exercised in-process against the shared test session (the
submit mechanics are identical; no need to pay two more JVM boots)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(tmpdir: str) -> str:
    zpath = os.path.join(tmpdir, "pipeline.zip")
    pkg = os.path.join(REPO, "tabbyld_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def _spark_submit(zip_path: str, *job_args: str) -> dict:
    """Run one job under spark-submit from an EMPTY cwd — the engine must
    come from --py-files alone, not from an importable repo checkout."""
    cmd = [
        shutil.which("spark-submit") or "spark-submit",
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=4g",
        "--py-files", zip_path,
        os.path.join(REPO, "job.py"),
        *job_args,
    ]
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, cwd=os.path.dirname(zip_path), env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-4000:]}"
    # the summary is the last JSON line on stdout (log4j noise goes to stderr)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary on stdout:\n{proc.stdout[-2000:]}"
    return json.loads(lines[-1])


@pytest.fixture(scope="module")
def submit_tree(tmp_path_factory):
    """One zip + one synth-pages + one annotate run, shared by the asserts."""
    tmp = str(tmp_path_factory.mktemp("submit"))
    zip_path = _build_zip(tmp)
    data = os.path.join(tmp, "data")
    synth = _spark_submit(
        zip_path, "synth-pages", "--out", data, "--n-pages", "40",
        "--seed", "42", "--with-gold",
    )
    cat = os.path.join(tmp, "catalog")
    first = _spark_submit(
        zip_path, "annotate",
        "--pages", os.path.join(data, "pages"),
        "--kg", os.path.join(data, "kg"),
        "--gold", os.path.join(data, "gold"),
        "--catalog", cat,
    )
    return {"tmp": tmp, "zip": zip_path, "data": data, "catalog": cat,
            "synth": synth, "first": first}


def test_synth_pages_layout_and_schema(spark, submit_tree):
    s = submit_tree["synth"]
    assert s["command"] == "synth-pages" and s["n_pages"] == 40
    pages = spark.read.parquet(os.path.join(submit_tree["data"], "pages"))
    # input_hint schema: url, warc_ts, html:binary, text, lang
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    assert dict(pages.dtypes)["html"] == "binary"
    assert pages.count() == 40


def test_annotate_computes_then_resumes(submit_tree):
    first = submit_tree["first"]
    assert first["triples"] > 0
    assert first["resumed_stages"] == []
    assert set(first["computed_stages"]) == {"canonical", "triples"}
    assert all(first["snapshots"][t] for t in ("canonical", "cea", "cta", "cpa", "triples"))
    # the gold-driven evaluation rollup rides the summary line and meets the
    # BASELINE gate even at 40 pages
    ev = first["evaluation"]
    assert set(ev) == {"CEA", "CTA", "CPA"}
    for task in ev:
        assert ev[task]["precision"] >= 0.95, (task, ev)
        assert ev[task]["recall"] >= 0.95, (task, ev)

    second = _spark_submit(
        submit_tree["zip"], "annotate",
        "--pages", os.path.join(submit_tree["data"], "pages"),
        "--kg", os.path.join(submit_tree["data"], "kg"),
        "--catalog", submit_tree["catalog"],
    )
    # S8 resume: both committed stages reused, snapshot ids unchanged,
    # identical triple count without recomputation
    assert set(second["resumed_stages"]) == {"canonical", "triples"}
    assert second["computed_stages"] == []
    assert second["triples"] == first["triples"]
    assert second["snapshots"] == first["snapshots"]


def test_webprep_and_graph_jobs_in_process(spark, submit_tree, tmp_path):
    """Same entrypoints, driven through main() on the shared session."""
    from tabbyld_spark import jobs

    pages = os.path.join(submit_tree["data"], "pages")
    out_seq = str(tmp_path / "seqs")
    out_graph = str(tmp_path / "graph")
    bl = tmp_path / "blocklist.txt"
    bl.write_text("# comment\nblocked.example\n")

    assert jobs.main([
        "webprep", "--pages", pages, "--out", out_seq,
        "--blocklist", str(bl), "--seq-len", "256",
    ]) == 0
    seqs = spark.read.parquet(out_seq)
    assert seqs.count() > 0
    assert {"doc_id", "chunk_text", "pack_id"} <= set(seqs.columns)

    # mixture sampling over the webprep output (doc-grain ids = seq_key)
    out_mix = str(tmp_path / "mixed")
    assert jobs.main([
        "mix", "--docs", out_seq, "--out", out_mix,
        "--rates", '{"0": 2.0}', "--key-col", "bucket",
        "--id-col", "seq_key", "--default-rate", "0.5",
    ]) == 0
    mixed = spark.read.parquet(out_mix)
    assert "copy_id" in mixed.columns
    # rate-2.0 bucket rows appear exactly twice; others at most once
    from pyspark.sql import functions as F2

    per = mixed.groupBy("seq_key", "bucket").count()
    assert per.filter((F2.col("bucket") == 0) & (F2.col("count") != 2)).count() == 0
    assert per.filter((F2.col("bucket") != 0) & (F2.col("count") > 1)).count() == 0

    # the annotate fixture is a single-host crawl (no host-grain edges);
    # the graph job gets the q_connected_components crawl shape instead
    from pyspark.sql import functions as F

    crawl = str(tmp_path / "crawl")
    d = spark.range(120).select(F.col("id").alias("doc_id"))
    h = (F.col("doc_id") % 23).cast("string")
    a = ((F.col("doc_id") * 7 + 3) % 23).cast("string")
    html = F.concat(
        F.lit('<a href="https://h'), a, F.lit('.example.com/p">x</a>')
    ).cast("binary")
    d.select(
        F.concat(F.lit("https://h"), h, F.lit(".example.com/p/"),
                 F.col("doc_id").cast("string")).alias("url"),
        html.alias("html"),
    ).write.mode("overwrite").parquet(crawl)

    assert jobs.main(["graph", "--pages", crawl, "--out", out_graph,
                      "--iterations", "3"]) == 0
    g = spark.read.parquet(out_graph)
    assert {
        "node", "component", "rank", "out_deg", "in_deg", "top_anchor", "n_anchor"
    } <= set(g.columns)
    assert g.count() > 0
    # every host both links out and is linked to in this fixture; anchor 'x'
    assert g.filter((F.col("out_deg") < 1) | (F.col("in_deg") < 1)).count() == 0
    assert g.filter(F.col("top_anchor") != "x").count() == 0


def test_publish_and_inc_dedup_jobs_in_process(spark, tmp_path):
    """The round-4 session-5 jobs through main(): publish (gate pass AND
    gate fail) and the incremental content-ledger dedup."""
    import json as _json

    from pyspark.sql import functions as F

    from tabbyld_spark import jobs

    tri_dir = str(tmp_path / "triples")
    spark.createDataFrame(
        [("e:a", "p", "e:b"), ("e:a", "rdf:type", "C"),
         ("e:b", "rdf:type", "C")],  # e:b must be a subject (dangling gate)
        "subj string, pred string, obj string",
    ).write.parquet(tri_dir)
    sc_dir = str(tmp_path / "sc")
    spark.createDataFrame(
        [("C", "D")], "child string, parent string"
    ).write.parquet(sc_dir)

    cat_dir = str(tmp_path / "cat")
    assert jobs.main([
        "publish", "--triples", tri_dir, "--catalog", cat_dir,
        "--subclass", sc_dir, "--functional", "p",
        "--entity-prefix", "e:", "--compact-target-rows", "1000",
    ]) == 0
    pub = spark.read.parquet(
        os.path.join(cat_dir, "kg_triples",
                     _json.load(open(os.path.join(cat_dir, "kg_triples",
                                                  "_manifest.json")))["current"])
    )
    assert pub.count() == 5  # 3 input + (e:a type D) + (e:b type D)

    # gate-fail path: functional violation → published=false, no new table
    bad_dir = str(tmp_path / "bad")
    spark.createDataFrame(
        [("e:a", "p", "e:b"), ("e:a", "p", "e:c")],
        "subj string, pred string, obj string",
    ).write.parquet(bad_dir)
    cat2 = str(tmp_path / "cat2")
    assert jobs.main([
        "publish", "--triples", bad_dir, "--catalog", cat2,
        "--functional", "p",
    ]) == 0  # the job reports the gate result, it does not crash
    assert not os.path.exists(os.path.join(cat2, "kg_triples", "_manifest.json"))

    # inc-dedup: second batch rejects ledger duplicates
    b1 = str(tmp_path / "b1")
    b2 = str(tmp_path / "b2")
    spark.createDataFrame(
        [("a", "x"), ("b", "y")], "doc_id string, text string"
    ).write.parquet(b1)
    spark.createDataFrame(
        [("c", "x"), ("d", "z")], "doc_id string, text string"
    ).write.parquet(b2)
    led = str(tmp_path / "led")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    assert jobs.main([
        "inc-dedup", "--batch", b1, "--batch-id", "b1",
        "--catalog", led, "--out", out1,
    ]) == 0
    assert jobs.main([
        "inc-dedup", "--batch", b2, "--batch-id", "b2",
        "--catalog", led, "--out", out2,
    ]) == 0
    assert spark.read.parquet(out1).count() == 2
    acc2 = spark.read.parquet(out2)
    assert [r.doc_id for r in acc2.collect()] == ["d"]  # "x" already in ledger
