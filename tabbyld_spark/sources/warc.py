"""WARC ingest — Common-Crawl's container format → the input_hint pages shape.

The north rule's input is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html:binary, text, lang), but real crawl data lands as WARC
files (ISO 28500): a sequence of records, each a CRLF-terminated header block
plus a Content-Length-delimited payload; ``response`` records carry a raw
HTTP response whose body is the page HTML.  Common Crawl ships each record as
its own gzip member, concatenated into ~1 GB ``.warc.gz`` files.

Scale shape: one task per WARC file via Spark's ``binaryFile`` source (a
100-TB crawl is ~100k files — file-grain parallelism saturates any cluster;
the same pattern as sources/xlsx.py), parsed inside ``mapInPandas`` so the
bytes cross into Python once per file as one Arrow batch and rows come back
columnar.  The parser is stdlib-only and deliberately forgiving: truncated
tails keep the records already parsed, non-``response`` records (warcinfo /
request / metadata) are skipped, malformed chunked encodings fall back to the
raw body, and any junk between records is skipped by re-synchronizing on the
next ``WARC/`` magic — a crawl file must never kill a task.

Reference parity: replaces the reference's one-file-at-a-time upload ingest
(/root/reference/modules/main/controllers/DefaultController.php:134-175) with
the bulk-crawl equivalent.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(content: bytes) -> bytes:
    """Transparently inflate ``.warc.gz`` content.  ``gzip.decompress``
    handles the Common-Crawl layout (one gzip member per record, members
    concatenated) in one call; plain WARC passes through untouched."""
    if content[:2] == _GZIP_MAGIC:
        return gzip.decompress(content)
    return content


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers_lowercased, payload_bytes) per record.

    Stops at the first truncated record (crawl files are cut mid-record when
    a fetcher dies); skips garbage by re-synchronizing on ``WARC/``."""
    i, n = 0, len(buf)
    while i < n:
        if not buf.startswith(b"WARC/", i):
            j = buf.find(b"WARC/", i)
            if j < 0:
                return
            i = j
        hdr_end = buf.find(b"\r\n\r\n", i)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        # latin-1 never fails; header values are ASCII in practice
        for line in buf[i:hdr_end].decode("latin-1").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        body_start = hdr_end + 4
        if body_start + clen > n:
            return  # truncated tail — keep what we already yielded
        yield headers, buf[body_start : body_start + clen]
        i = body_start + clen


def _dechunk(body: bytes) -> bytes:
    """HTTP/1.1 chunked transfer decoding; malformed input → raw body."""
    out, i = bytearray(), 0
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            return bytes(body)
        try:
            size = int(body[i:j].split(b";")[0], 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            return bytes(out)
        chunk_end = j + 2 + size
        if chunk_end > len(body):
            return bytes(body)
        out += body[j + 2 : chunk_end]
        i = chunk_end + 2  # skip the chunk's trailing CRLF


def split_http_response(payload: bytes) -> tuple[dict[str, str], bytes]:
    """Raw HTTP response → (http_headers_lowercased, body_bytes).

    A payload with no header/body separator is treated as all-body (some
    crawlers store bare HTML in response records)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return {}, payload
    headers: dict[str, str] = {}
    for line in payload[:sep].decode("latin-1").split("\r\n")[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    body = payload[sep + 4 :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return headers, body


def warc_responses(content: bytes) -> Iterator[tuple[str, str, bytes]]:
    """All ``response`` records of one (possibly gzipped) WARC file as
    (target_uri, warc_date, html_bytes)."""
    for headers, payload in iter_warc_records(_maybe_gunzip(content)):
        if headers.get("warc-type", "").lower() != "response":
            continue
        url = headers.get("warc-target-uri", "")
        if not url:
            continue
        _http, body = split_http_response(payload)
        yield url, headers.get("warc-date", ""), body


def _parse_warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = [
            (url, date, body)
            for content in pdf["content"]
            for url, date, body in warc_responses(bytes(content))
        ]
        out = pd.DataFrame(rows, columns=["url", "warc_ts", "html"])
        out["warc_ts"] = pd.to_datetime(
            out["warc_ts"], errors="coerce", utc=True, format="ISO8601"
        )
        out["text"] = pd.Series([None] * len(out), dtype="object")
        out["lang"] = pd.Series([None] * len(out), dtype="object")
        yield out


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC files → pages(url, warc_ts, html, text, lang).

    ``text``/``lang`` are NULL — downstream owns them (extract_pages derives
    text; operators/textstats.py langid derives lang), keeping the ingest a
    pure container decode with the exact input_hint schema."""
    binary = spark.read.format("binaryFile").load(path_glob).select("content")
    return binary.mapInPandas(_parse_warc_batches, schema=PAGES_SCHEMA)


# binaryFile's fixed file-metadata schema: streaming file sources require it
# spelled out (no inference on an empty directory)
_BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_warc_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Continuous crawl ingest: WARC files landing in ``input_dir`` → a
    streaming pages frame (same schema and parser as :func:`read_warc`).

    The file source tracks processed files in the query checkpoint, so a
    crawl fetcher dropping ``.warc.gz`` segments gets exactly-once ingest
    across restarts; ``maxFilesPerTrigger`` bounds per-micro-batch work the
    way streaming/ingest.py bounds parquet ingest.  Compose with
    streaming/stateful.py dedup or foreachBatch annotation downstream."""
    binary = (
        spark.readStream.format("binaryFile")
        .schema(_BINARY_FILE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(input_dir)
        .select("content")
    )
    return binary.mapInPandas(_parse_warc_batches, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic WARC rendering (fixtures + tests — no external data)
# ---------------------------------------------------------------------------


def render_warc(
    records: list[tuple[str, str, bytes]],
    per_record_gzip: bool = False,
    http_header_extra: Callable[[int], bytes] | None = None,
) -> bytes:
    """Serialize (url, iso_date, html_bytes) triples as a WARC byte stream —
    one leading ``warcinfo`` record, then one ``request`` + one ``response``
    per page (the Common-Crawl record mix), optionally one gzip member per
    record (the ``.warc.gz`` layout)."""

    def record(rtype: str, headers: list[tuple[str, str]], payload: bytes) -> bytes:
        lines = [b"WARC/1.0"]
        lines += [f"WARC-Type: {rtype}".encode()]
        lines += [f"{k}: {v}".encode() for k, v in headers]
        lines += [f"Content-Length: {len(payload)}".encode()]
        head = b"\r\n".join(lines) + b"\r\n\r\n"
        return head + payload + b"\r\n\r\n"

    out: list[bytes] = [
        record("warcinfo", [("WARC-Filename", "fixture.warc")], b"software: fixture\r\n")
    ]
    for idx, (url, date, html) in enumerate(records):
        out.append(
            record(
                "request",
                [("WARC-Target-URI", url), ("WARC-Date", date)],
                b"GET / HTTP/1.1\r\nHost: x\r\n\r\n",
            )
        )
        extra = http_header_extra(idx) if http_header_extra else b""
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" + extra + b"\r\n" + html
        )
        out.append(
            record(
                "response",
                [("WARC-Target-URI", url), ("WARC-Date", date)],
                http,
            )
        )
    if per_record_gzip:
        return b"".join(gzip.compress(r) for r in out)
    return b"".join(out)
