"""WARC ingest: container parsing (records, gzip layouts, HTTP splitting,
crawl-grade malformed input) and the Spark source's byte-identity guarantee —
fixture HTML wrapped in WARC must extract to the exact fixture text."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.sources.warc import (
    PAGES_SCHEMA,
    _dechunk,
    iter_warc_records,
    read_warc,
    render_warc,
    split_http_response,
    warc_responses,
)

RECS = [
    ("https://a.example.com/1", "2026-08-20T01:02:03Z", b"<html><p>alpha</p></html>"),
    ("https://b.example.com/2", "2026-08-20T01:02:04Z", b"<html>\xff\xfe bad bytes \xf0\x28</html>"),
    ("https://c.example.com/3", "2026-08-20T01:02:05Z", b"<html><h1>gamma</h1></html>"),
]


# ---------------------------------------------------------------------------
# parser units
# ---------------------------------------------------------------------------


def test_roundtrip_plain_and_record_mix():
    buf = render_warc(RECS)
    records = list(iter_warc_records(buf))
    # warcinfo + (request + response) per page
    assert len(records) == 1 + 2 * len(RECS)
    resp = list(warc_responses(buf))
    assert [(u, d) for u, d, _ in resp] == [(u, d) for u, d, _ in RECS]
    # body bytes are byte-identical through header split, including non-UTF-8
    assert [b for _, _, b in resp] == [b for _, _, b in RECS]


def test_roundtrip_per_record_gzip_and_whole_file_gzip():
    per_record = render_warc(RECS, per_record_gzip=True)
    assert [b for _, _, b in warc_responses(per_record)] == [b for _, _, b in RECS]
    whole = gzip.compress(render_warc(RECS))
    assert [b for _, _, b in warc_responses(whole)] == [b for _, _, b in RECS]


def test_truncated_tail_keeps_parsed_prefix():
    buf = render_warc(RECS)
    # cut inside the LAST response record's payload
    cut = buf.rfind(b"gamma")
    resp = list(warc_responses(buf[: cut + 2]))
    assert [u for u, _, _ in resp] == [u for u, _, _ in RECS[:2]]


def test_garbage_between_records_resyncs():
    one = render_warc(RECS[:1])
    two = render_warc(RECS[2:])
    resp = list(warc_responses(one + b"\x00JUNK not a record\x00" + two))
    assert [u for u, _, _ in resp] == [RECS[0][0], RECS[2][0]]


def test_bad_content_length_stops_cleanly():
    buf = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: banana\r\n\r\nxx"
    assert list(iter_warc_records(buf)) == []


def test_http_split_and_chunked_decode():
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>"
    headers, body = split_http_response(http)
    assert headers["content-type"] == "text/html" and body == b"<p>x</p>"
    # bare-HTML payload (no header separator) is all body
    assert split_http_response(b"<html>y</html>")[1] == b"<html>y</html>"
    # chunked: 4-byte + 3-byte chunks reassemble; malformed size falls back raw
    chunked = b"4\r\nwiki\r\n3\r\nped\r\n0\r\n\r\n"
    assert _dechunk(chunked) == b"wikiped"
    assert _dechunk(b"zz\r\nnot hex") == b"zz\r\nnot hex"
    http_chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunked
    )
    assert split_http_response(http_chunked)[1] == b"wikiped"


# ---------------------------------------------------------------------------
# Spark source
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "part-0.warc").write_bytes(render_warc(RECS[:2]))
    (d / "part-1.warc.gz").write_bytes(render_warc(RECS[2:], per_record_gzip=True))
    return str(d)


def test_read_warc_schema_and_bytes(spark, warc_dir):
    pages = read_warc(spark, warc_dir)
    assert pages.schema.simpleString() == (
        "struct<" + PAGES_SCHEMA.replace(" string", ":string")
        .replace(" timestamp", ":timestamp").replace(" binary", ":binary")
        .replace(", ", ",") + ">"
    )
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    for url, _date, html in RECS:
        assert bytes(rows[url]["html"]) == html
        assert rows[url]["text"] is None and rows[url]["lang"] is None
        assert rows[url]["warc_ts"] is not None
    # crawl timestamps survive the container decode in order
    ts = [rows[u]["warc_ts"] for u, _, _ in RECS]
    assert ts == sorted(ts) and len(set(ts)) == 3


def test_warc_to_extract_byte_identity(spark, kg, tmp_path):
    """The north-rule invariant driven through the FULL ingest path: fixture
    pages → WARC container → read_warc → extract_pages must reproduce the
    fixture's serialized text byte-for-byte on every url."""
    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.fixtures.pages import gen_pages_pd

    fx = gen_pages_pd(kg, n_pages=30, seed=7)
    recs = [
        (r.url, r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"), bytes(r.html))
        for r in fx.pages.itertuples(index=False)
    ]
    p = tmp_path / "fixture.warc.gz"
    p.write_bytes(render_warc(recs, per_record_gzip=True))

    pages = read_warc(spark, str(p))
    ex = extract_pages(pages).select("url", "extracted_text")
    truth = spark.createDataFrame(fx.pages[["url", "text"]])
    joined = ex.join(truth, "url", "full")
    assert joined.count() == 30
    assert joined.filter(
        F.col("extracted_text").isNull()
        | F.col("text").isNull()
        | (F.col("extracted_text") != F.col("text"))
    ).count() == 0


def test_warc_ingest_job(spark, warc_dir, tmp_path):
    from tabbyld_spark import jobs

    out = str(tmp_path / "pages")
    assert jobs.main(["warc-ingest", "--warc", warc_dir, "--out", out]) == 0
    assert spark.read.parquet(out).count() == 3


def test_read_warc_stream_exactly_once(spark, tmp_path):
    """Crawl segments landing over time: each file ingested exactly once
    across separate stream runs sharing one checkpoint (restart = rerun)."""
    from tabbyld_spark.sources.warc import read_warc_stream

    indir, outdir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    os.makedirs(indir)

    def run_once():
        q = (
            read_warc_stream(spark, indir, max_files_per_trigger=2)
            .writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (tmp_path / "in" / "a.warc").write_bytes(render_warc(RECS[:2]))
    run_once()
    got = spark.read.parquet(outdir)
    assert got.count() == 2

    # second segment lands (gzipped); only its rows are appended
    (tmp_path / "in" / "b.warc.gz").write_bytes(
        render_warc(RECS[2:], per_record_gzip=True)
    )
    run_once()
    assert spark.read.parquet(outdir).count() == 3

    # restart with nothing new: no duplicates
    run_once()
    rows = spark.read.parquet(outdir)
    assert rows.count() == 3
    assert {r["url"] for r in rows.collect()} == {u for u, _, _ in RECS}
