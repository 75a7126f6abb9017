"""The full webtext corpus-prep plan: Common-Crawl-style pages in,
model-ready packed training sequences out — the FineWeb/RefinedWeb shape,
composed from the individually-tested operators:

    W0a latest capture   optional newest-snapshot-wins collapse per raw URL
                         (``latest_only=``): Common-Crawl inputs carry many
                         captures of a page across crawls (warc_ts is in the
                         input schema for this); stale snapshots would
                         double-count lines through every downstream dedup.
                         Runs at the cheap raw-URL grain BEFORE any content
                         work; captures hiding behind different URL
                         spellings are collapsed by W0's alias dedup next
    W0 URL canonicalize  optional alias collapse (``canonicalize_urls=``):
                         scheme/host case, default ports, tracking params,
                         query order, fragments — one canonical survivor
                         per page BEFORE any content work runs
    W1 URL filter        registrable-suffix blocklist, cheapest grain first
    W1a robots gate      optional robots.txt REP filter (``robots=`` table
                         of (host, robots_txt)): per-host prefix rules for
                         agent '*' with longest-match/allow-tie semantics
                         (operators/robots.py), applied at URL grain before
                         any content work
    W1b noindex gate     optional robots-meta politeness filter
                         (``respect_noindex=``): pages whose HTML declares
                         ``noindex``/``none`` are excluded before any
                         content is published — a zero-shuffle codegen
                         predicate over the raw bytes
    W2 extract           html → byte-identical text (the ONE Arrow UDF)
    W3 line dedup        C4-style global first-occurrence line dedup
    W3b span dedup       optional ExactSubstr duplicate-span scrub (Lee et
                         al. 2021; ``exact_substr_k`` tokens, default off —
                         FineWeb-class pipelines run line OR span dedup
                         depending on corpus; both winners key on (url, pos)
                         so determinism is preserved)
    W3d quality gate     optional trained-classifier filter
                         (``quality_model=`` + ``quality_min_prob=``):
                         the fastText/FineWeb-Edu-style discriminative
                         gate (operators/classifier.py), scored after
                         dedup so duplicates never vote
    W3c LM gate          optional CCNet-style perplexity filter
                         (``lm_nll_max=``): a unigram LM self-trained on the
                         post-dedup corpus scores every doc's mean token
                         NLL; outlier docs (gibberish, SEO spam, langid
                         escapes) are dropped before the expensive near-dup
                         stage.  Training is deterministic (pure aggregate
                         of the surviving docs), so the gate keeps the
                         plan's retry/reshard determinism
    W4 corpus prep       exact dedup → SimHash near-dup → language → quality
    W5 chunk + pack      overlapping token windows → contiguous-fill packs

The document id is the ``url`` itself: every downstream winner choice
(line dedup's min (doc_id, line_no), exact/near-dup's min doc_id, the pack
bucket md5) orders on it, so the whole plan is a pure function of page
content + url — deterministic under any partitioning, re-sharding, or task
retry, which is what makes the per-stage catalog commits of
``plans/pipeline.py`` safely resumable here too.

Scale shape: W1 prunes before the expensive W2 decode (filter the cheap
grain first); W2 is Arrow-batched and embarrassingly parallel; W3–W5 add
exactly the exchanges their operators document — nothing quadratic, no
full-text shuffle beyond the line/doc-grain dedup aggregations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tabbyld_spark.extract.html import extract_pages
from tabbyld_spark.operators.dedup import line_dedup
from tabbyld_spark.operators.webfilter import url_filter
from tabbyld_spark.plans.dataprep import prep_training_sequences


def prep_web_corpus(
    pages: DataFrame,
    blocklist: DataFrame | None = None,
    lang: str = "en",
    max_tokens: int = 128,
    overlap: int = 16,
    seq_len: int = 2048,
    n_buckets: int = 1024,
    exact_substr_k: int | None = None,
    canonicalize_urls: bool = False,
    lm_nll_max: float | None = None,
    latest_only: bool = False,
    respect_noindex: bool = False,
    robots: DataFrame | None = None,
    quality_model=None,
    quality_min_prob: float | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, …) → (seq_key, doc_id=url,
    chunk_id, chunk_text, n_chunk_tokens, bucket, cum_tokens, pack_id)."""
    if latest_only:
        from tabbyld_spark.operators.urls import latest_capture

        # W0a: newest capture per raw URL (deterministic md5 tiebreak)
        pages = latest_capture(pages).drop("n_captures")
    if canonicalize_urls:
        from tabbyld_spark.operators.urls import url_dedup

        # W0: collapse raw URL-spelling aliases to one canonical survivor
        # per page (winner = min raw url — content-independent, so doc_id
        # stays a pure function of the input set); unparseable URLs pass
        # through and W1/W2 treat them as they always did
        pages = url_dedup(pages).drop("source_url", "n_aliases")
    if latest_only or canonicalize_urls:
        from tabbyld_spark.functions.lineage import cut

        # several downstream operators consume their input twice (explode +
        # join-back); without a lineage cut here those re-evaluations
        # COMPOUND through the chain (2x per such stage), re-running the W0
        # aggregations 4-8x.  Raw scans are cheap to recompute; aggregated
        # W0 output is not.
        pages = cut(pages)
    if blocklist is not None:
        pages = url_filter(pages, blocklist)
    if robots is not None:
        from tabbyld_spark.operators.robots import parse_robots, robots_filter

        # W1a: fetch-policy REP gate, still at URL grain
        pages = robots_filter(pages, parse_robots(robots))
    if respect_noindex:
        from tabbyld_spark.operators.webfilter import drop_noindex

        # W1b: robots-meta politeness gate, still at the cheap pre-extract
        # grain (one codegen predicate over the raw bytes)
        pages = drop_noindex(pages)
    from tabbyld_spark.functions.lineage import cut

    # the Arrow extract is the most expensive map stage in the plan and
    # line_dedup consumes its output twice (winner agg + join-back) — cut
    # so the UDF runs once per page, not once per consumer
    docs = cut(
        extract_pages(pages).select(
            F.col("url").alias("doc_id"), F.col("extracted_text").alias("text")
        )
    )
    deduped = line_dedup(docs).select("doc_id", "text")
    if exact_substr_k is not None:
        from tabbyld_spark.operators.dedup import remove_duplicate_spans

        deduped = remove_duplicate_spans(deduped, k=exact_substr_k).select(
            "doc_id", "text"
        )
    if lm_nll_max is not None:
        from tabbyld_spark.operators.lm import lm_score, train_unigram_lm

        # W3c: self-trained reference model (CCNet trains on a trusted
        # corpus; the deterministic in-sandbox analogue is the post-dedup
        # corpus itself) — docs whose mean token NLL exceeds the gate are
        # distributionally far from the corpus and dropped
        lm, oov = train_unigram_lm(deduped)
        keep = (
            lm_score(deduped, lm, oov)
            .filter(F.col("lm_nll") <= lm_nll_max)
            .select("doc_id")
        )
        deduped = deduped.join(keep, "doc_id", "left_semi")
    if quality_model is not None and quality_min_prob is not None:
        from tabbyld_spark.operators.classifier import score_text_classifier

        # W3d: trained quality gate (operators/classifier.py — the
        # fastText/FineWeb-Edu shape): docs scoring below the probability
        # floor under the caller's model are dropped.  The model is
        # trained OUT OF BAND (labels are external by nature); scoring is
        # one broadcast join + doc-grain aggregate, the filter zero-shuffle
        keep_q = (
            score_text_classifier(deduped, quality_model)
            .filter(F.col("prob") >= quality_min_prob)
            .select("doc_id")
        )
        deduped = deduped.join(keep_q, "doc_id", "left_semi")
    return prep_training_sequences(
        deduped,
        lang=lang,
        max_tokens=max_tokens,
        overlap=overlap,
        seq_len=seq_len,
        n_buckets=n_buckets,
    )
