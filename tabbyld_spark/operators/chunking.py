"""Document chunking + sequence packing — the two operators that turn a
cleaned corpus into model-ready training sequences.

``chunk_documents`` splits each document into overlapping token windows
(chunk starts at every ``stride = max_tokens − overlap`` tokens while tokens
remain; the tail chunk may be short).  The window extraction is ONE
lookahead-capture regex pass per document — the same trick as
``textstats.gopher_repetition`` — because the two obvious formulations both
hide O(n²) work per document: slicing the token array per exploded chunk row
re-evaluates the doc-grain ``split`` under Catalyst's projection collapse,
and referencing an outer token array inside a ``transform`` lambda
re-evaluates it per element.  The regex consumes ``stride`` tokens per match
(greedy ``{{1,stride}}`` so the tail still matches), so each document is
scanned once, chunks land in one small per-doc array, and only that array
explodes (doc_id the lone companion column).

``pack_sequences`` assigns chunk/doc rows to fixed-token-budget training
packs by contiguous fill: rows are bucketed by a hash of the id (the same
md5 bucketing as ``textstats.train_split`` — deterministic under any
partitioning), ordered by id within the bucket, and ``pack_id = floor(
(running_token_total − n_tokens) / seq_len)``.  This is the fully
SQL-expressible packing discipline (window cumulative sum), deterministic
across engines — not first-fit-decreasing, which needs mutable bin state.

Scale shape: chunking is a zero-shuffle projection + explode at chunk grain.
Packing is one hash exchange on ``bucket`` plus a window sort within each
bucket; ``n_buckets`` caps the window parallelism, so size it to the cluster
(1024 here; 100k+ at petabyte scale) — each bucket packs independently, so
more buckets = more parallel sorts and smaller sort spills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, chunk_id, chunk_text, n_chunk_tokens) — whitespace-token
    windows of ``max_tokens`` starting every ``max_tokens − overlap`` tokens
    (chunk_id is the 0-based window index; the final window may be short).
    Contract: a chunk starts at token position k·stride for every k with
    k·stride < n_tokens — identical to the SQL twin's ``range(0, n,
    stride)`` lateral.  Empty, whitespace-only and NULL texts produce no
    chunks (the doc id is absent from the output)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    # lookahead-capture up to max_tokens tokens, consume up to stride (greedy
    # ⇒ exactly stride mid-text, the remainder at the tail): one regex pass
    pat = rf"(?=(\S+(?: \S+){{0,{max_tokens - 1}}}))(?:\S+ ?){{1,{stride}}}"
    chunks = F.regexp_extract_all(norm, F.lit(pat), 1)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).withColumn("n_chunk_tokens", F.size(F.split("chunk_text", " ")).cast("long"))


def pack_sequences(
    rows: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """→ input columns + (bucket, cum_tokens, pack_id): contiguous-fill
    packing of token counts into ``seq_len``-budget packs within md5-hash
    buckets.  ``pack_id`` is the 0-based pack index within the bucket; a row
    spans packs when its tokens straddle a boundary (training loaders treat
    that as the document crossing a sequence boundary, the usual causal-LM
    packing semantics).  Deterministic: bucket and order are pure functions
    of the id."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("long")
        % n_buckets
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.withColumn("bucket", bucket)
        .withColumn("cum_tokens", F.sum(tokens_col).over(w).cast("long"))
        .withColumn(
            "pack_id",
            F.floor((F.col("cum_tokens") - F.col(tokens_col)) / seq_len).cast("long"),
        )
    )
