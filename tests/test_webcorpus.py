"""End-to-end webtext prep: pages → packed training sequences.  Blocklist
actually prunes, output is deterministic under re-partitioning, and every
surviving chunk traces back to a non-blocked page."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tabbyld_spark.plans.webcorpus import prep_web_corpus


@pytest.fixture(scope="module")
def pages(spark, pages_fx):
    return spark.createDataFrame(pages_fx.pages)


def test_end_to_end(spark, pages):
    out = prep_web_corpus(
        pages, lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8
    ).cache()
    n = out.count()
    assert n > 0
    # ids are the fixture urls; chunks bounded; packs 0-based per bucket
    assert out.filter(~F.col("doc_id").startswith("https://fixture.example.org/")).count() == 0
    assert out.filter((F.col("n_chunk_tokens") > 32) | (F.col("n_chunk_tokens") < 1)).count() == 0
    assert (
        out.groupBy("bucket").agg(F.min("pack_id").alias("m"))
        .filter(F.col("m") != 0).count() == 0
    )


def test_blocklist_prunes_everything(spark, pages):
    bl = spark.createDataFrame([("example.org",)], ["domain"])
    assert prep_web_corpus(pages, blocklist=bl, max_tokens=32, seq_len=256).count() == 0


def test_deterministic_under_resharding(spark, pages):
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    a = prep_web_corpus(pages, **kw).select("seq_key", "bucket", "pack_id")
    b = prep_web_corpus(pages.repartition(17), **kw).select(
        "seq_key", "bucket", "pack_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_canonicalize_urls_collapses_aliases_to_identical_output(spark, pages):
    """W0: a corpus polluted with URL-spelling aliases of every page (case,
    :443, tracking query, fragment) must produce EXACTLY the clean corpus's
    output when canonicalize_urls is on — the aliases collapse before any
    content stage sees them."""
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    aliased = pages.unionByName(
        pages.withColumn(
            "url",
            F.concat(
                F.upper(F.regexp_replace("url", r"/page/.*$", "")),
                F.lit(":443"),
                F.regexp_extract("url", r"(/page/.*)$", 1),
                F.lit("?utm_source=test#frag"),
            ),
        )
    )
    clean = prep_web_corpus(pages, canonicalize_urls=True, **kw)
    polluted = prep_web_corpus(aliased, canonicalize_urls=True, **kw)
    a = clean.select("seq_key", "chunk_text", "bucket", "pack_id")
    b = polluted.select("seq_key", "chunk_text", "bucket", "pack_id")
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_exact_substr_stage_scrubs_cross_page_duplicates(spark, pages):
    """W3b: with exact_substr_k on, token runs duplicated across pages are
    kept once corpus-wide, so total chunk tokens can only shrink; output
    stays deterministic under re-sharding."""
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    base = prep_web_corpus(pages, **kw)
    scrubbed = prep_web_corpus(pages, exact_substr_k=4, **kw)
    t_base = base.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    t_scrub = scrubbed.agg(F.sum("n_chunk_tokens")).collect()[0][0]
    # after line dedup the fixture's longest cross-page duplicate runs are
    # 4 tokens (entity+value patterns) — k=4 must bite, never grow the corpus
    assert 0 < t_scrub < t_base

    again = prep_web_corpus(pages.repartition(13), exact_substr_k=4, **kw)
    a = scrubbed.select("seq_key", "bucket", "pack_id")
    b = again.select("seq_key", "bucket", "pack_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_lm_gate_drops_gibberish_page(spark, pages):
    """W3c: a planted page of tokens no other page contains scores far from
    the corpus-trained LM and is gated out; the clean pages all survive a
    loose gate, and a tight gate only ever shrinks the corpus."""
    from tabbyld_spark.operators.lm import lm_score, train_unigram_lm
    from tabbyld_spark.extract.html import extract_pages
    from tabbyld_spark.operators.dedup import line_dedup

    gib_words = " ".join(f"zxqv{i}glorp" for i in range(40))
    gibberish = pages.limit(1).select(
        F.lit("https://fixture.example.org/page/gibberish").alias("url"),
        "warc_ts",
        F.concat(
            F.lit("<html><body><p>"), F.lit(gib_words), F.lit("</p></body></html>")
        ).cast("binary").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    polluted = pages.unionByName(gibberish.select(*pages.columns))

    # pick the gate from the score distribution: max clean-doc NLL + margin
    docs = line_dedup(
        extract_pages(polluted).select(
            F.col("url").alias("doc_id"), F.col("extracted_text").alias("text")
        )
    ).select("doc_id", "text")
    lm, oov = train_unigram_lm(docs)
    scores = {r["doc_id"]: r["lm_nll"] for r in lm_score(docs, lm, oov).collect()}
    gib_url = "https://fixture.example.org/page/gibberish"
    clean_max = max(v for k, v in scores.items() if k != gib_url)
    assert scores[gib_url] > clean_max  # the outlier is separable

    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    gated = prep_web_corpus(polluted, lm_nll_max=(clean_max + scores[gib_url]) / 2, **kw)
    assert gated.filter(F.col("doc_id") == gib_url).count() == 0
    # loose gate keeps everything the ungated plan keeps
    loose = prep_web_corpus(polluted, lm_nll_max=1e9, **kw)
    base = prep_web_corpus(polluted, **kw)
    a = base.select("seq_key", "bucket", "pack_id")
    b = loose.select("seq_key", "bucket", "pack_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_latest_only_drops_stale_captures(spark, pages):
    """W0a: polluting the corpus with older captures (different content) of
    every page must produce EXACTLY the clean corpus's output when
    latest_only is on."""
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    stale = pages.withColumn(
        "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 30 DAYS")
    ).withColumn(
        "html",
        F.concat(F.lit("<html><body><p>stale junk body</p></body></html>"))
        .cast("binary"),
    )
    polluted = pages.unionByName(stale.select(*pages.columns))
    clean = prep_web_corpus(pages, **kw)
    collapsed = prep_web_corpus(polluted, latest_only=True, **kw)
    a = clean.select("seq_key", "chunk_text", "bucket", "pack_id")
    b = collapsed.select("seq_key", "chunk_text", "bucket", "pack_id")
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_respect_noindex_gates_pages(spark, pages):
    """W1b: a planted noindex page must not contribute any chunk."""
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    noindex = pages.limit(1).select(
        F.lit("https://fixture.example.org/page/noindex").alias("url"),
        "warc_ts",
        F.concat(
            F.lit('<html><head><meta name="robots" content="noindex"></head>'
                  "<body><p>secret words that must not surface</p></body></html>")
        ).cast("binary").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    polluted = pages.unionByName(noindex.select(*pages.columns))
    gated = prep_web_corpus(polluted, respect_noindex=True, **kw)
    assert gated.filter(
        F.col("doc_id") == "https://fixture.example.org/page/noindex"
    ).count() == 0
    # and the gate leaves compliant pages byte-identical to the clean run
    base = prep_web_corpus(pages, **kw)
    a = base.select("seq_key", "chunk_text", "bucket", "pack_id")
    b = gated.select("seq_key", "chunk_text", "bucket", "pack_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_robots_gate_blocks_disallowed_paths(spark, pages):
    """W1a: a robots table disallowing the fixture's /page/ path for one
    host-equivalent prefix must prune those pages; a permissive table
    leaves output byte-identical."""
    kw = dict(lang="en", max_tokens=32, overlap=8, seq_len=256, n_buckets=8)
    deny = spark.createDataFrame(
        [("fixture.example.org", "User-agent: *\nDisallow: /page/")],
        "host string, robots_txt string",
    )
    assert prep_web_corpus(pages, robots=deny, **kw).count() == 0
    allow = spark.createDataFrame(
        [("fixture.example.org", "User-agent: *\nDisallow: /nowhere/")],
        "host string, robots_txt string",
    )
    base = prep_web_corpus(pages, **kw)
    gated = prep_web_corpus(pages, robots=allow, **kw)
    a = base.select("seq_key", "chunk_text", "bucket", "pack_id")
    b = gated.select("seq_key", "chunk_text", "bucket", "pack_id")
    assert a.count() > 0
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_quality_gate_stage(spark, pages_fx):
    """W3d: a classifier trained to reject one synthetic 'spam' page drops
    exactly that page from the composed chain; without the gate it packs."""
    from pyspark.sql import functions as F

    from tabbyld_spark.operators.classifier import train_text_classifier
    from tabbyld_spark.plans.webcorpus import prep_web_corpus

    pages = spark.createDataFrame(pages_fx.pages.head(30))
    # stopword-bearing spam so the BASELINE gates (langid, stopword ratio)
    # pass and only the trained gate can reject it
    spam_line = "the jackpot casino bonus and the spins are on the offer now"
    spam_text = " ".join([spam_line] * 10)
    spam_html = "<html><body><p>" + spam_text + "</p></body></html>"
    spam = spark.createDataFrame(
        [("https://spam.example/x", spam_html.encode(), spam_text)],
        "url string, html binary, text string",
    ).withColumn("warc_ts", F.current_timestamp()).withColumn("lang", F.lit("en"))
    pages = pages.unionByName(spam.select(*pages.columns))

    train = spark.createDataFrame(
        [(i, "the useful words about the content extraction are here", 1)
         for i in range(6)]
        + [(100 + i, "the jackpot casino bonus and the spins are on the offer now", 0)
           for i in range(6)],
        "doc_id long, text string, label int",
    )
    model = train_text_classifier(train, n_buckets=128, n_iters=40, lr=1.0)

    without = prep_web_corpus(pages, max_tokens=64, overlap=8, seq_len=512)
    gated = prep_web_corpus(
        pages, max_tokens=64, overlap=8, seq_len=512,
        quality_model=model, quality_min_prob=0.44,
    )
    spam_doc = "https://spam.example/x"
    assert without.filter(F.col("doc_id") == spam_doc).count() > 0
    assert gated.filter(F.col("doc_id") == spam_doc).count() == 0
    # the gate is SELECTIVE, not a blanket drop: the spam doc (nearly
    # identical to the negative class) goes, while a solid majority of
    # real pages survive (their post-dedup text scores near the prior;
    # exact counts shift with the line-dedup winners, so the floor is
    # deliberately loose)
    n_without = without.select("doc_id").distinct().count()
    n_gated = gated.select("doc_id").distinct().count()
    assert n_without >= 15
    assert n_gated >= 10
