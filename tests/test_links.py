"""Outlink extraction + host graph (extract/links.py).

Crawl-realism probes: single- and double-quoted hrefs, fragment/relative
links, malformed UTF-8 bytes (always present in real WARC payloads), junk
URLs on either side of a host edge.
"""

from tabbyld_spark.extract.links import extract_outlinks, host_edges


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode("utf-8") if isinstance(h, str) else h) for u, h in rows],
        "url string, html binary",
    )


def test_extract_outlinks_quoting_and_filtering(spark):
    html = (
        '<p><a href="https://a.example.com/x">dq</a>'
        "<a href='http://b.example.com/y'>sq</a>"
        '<a href="#frag">frag</a>'
        '<a href="/relative/path">rel</a>'
        '<a href="https://a.example.com/x">dup</a>'
        '<A HREF="https://c.example.com/z">caps-attr-not-matched-ok</A></p>'
    )
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_outlinks(_pages(spark, [("https://me/p1", html)])).collect()
    }
    # dup collapses (array_distinct); fragment + relative dropped
    assert ("https://me/p1", "https://a.example.com/x") in got
    assert ("https://me/p1", "http://b.example.com/y") in got
    assert all(not d.startswith("#") and d.startswith("http") for _, d in got)


def test_extract_outlinks_survives_garbage_bytes(spark):
    # invalid UTF-8 interleaved with a valid link: decode must replace, not
    # fail the task, and the link outside the corrupted span still extracts
    html = b'\xff\xfe<b>\x80</b><a href="https://ok.example.com/a">x</a>\xf0\x28\x8c\x28'
    got = extract_outlinks(_pages(spark, [("https://me/p2", html)])).collect()
    assert [(r["src_url"], r["dst_url"]) for r in got] == [
        ("https://me/p2", "https://ok.example.com/a")
    ]


def test_host_edges_drops_self_loops_and_junk(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/2"),
            ("https://a.com/1", "https://A.COM/other"),  # self-loop after lowering
            ("https://a.com/1", "http://###"),  # junk dst host
            ("https://b.com/9", "https://a.com/1"),
            ("https://B.com/8", "https://a.com/7"),  # dup edge after lowering
        ],
        "src_url string, dst_url string",
    )
    got = {(r["src"], r["dst"]) for r in host_edges(links).collect()}
    assert got == {("a.com", "b.com"), ("b.com", "a.com")}


def test_pagerank_over_host_graph(spark):
    """End-to-end: pages → outlinks → host edges → PageRank; the host every
    other host links to must rank strictly highest."""
    from tabbyld_spark.operators.graphrank import pagerank

    hub = '<a href="https://hub.example.com/">h</a>'
    rows = [
        (f"https://site{i}.example.com/p", hub + f'<a href="https://site{(i + 1) % 4}.example.com/p">n</a>')
        for i in range(4)
    ] + [
        (
            "https://hub.example.com/",
            # hub fans back out to all four sites: its large in-flow splits
            # 4 ways, so hub itself stays the strict argmax
            "".join(f'<a href="https://site{i}.example.com/p">s</a>' for i in range(4)),
        )
    ]
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(host_edges(extract_outlinks(_pages(spark, rows))), iterations=10).collect()
    }
    assert len(ranks) == 5
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    top = max(ranks, key=ranks.get)
    assert top == "hub.example.com"


def test_extract_anchors_pairs_and_filters(spark):
    html = (
        '<p><a href="https://a.example.com/x">Apple Inc</a>'
        "<a href='http://b.example.com/y'>  Banana  </a>"
        '<a href="#frag">skip-frag</a>'
        '<a href="/rel">skip-rel</a>'
        '<a href="https://c.example.com/z"></a>'          # empty anchor
        '<a href="https://a.example.com/q">Apple <b>bold</b></a></p>'
    )
    from tabbyld_spark.extract.links import extract_anchors

    got = {
        (r["dst_url"], r["anchor"])
        for r in extract_anchors(_pages(spark, [("https://me/p1", html)])).collect()
    }
    assert got == {
        ("https://a.example.com/x", "Apple Inc"),
        ("http://b.example.com/y", "Banana"),          # trimmed
        ("https://a.example.com/q", "Apple"),          # truncated at nested tag
    }


def test_extract_anchors_survives_garbage_bytes(spark):
    from tabbyld_spark.extract.links import extract_anchors

    html = (
        bytes([0xFF, 0xFE, 0x80])
        + b'<a href="https://ok.example.com/">Fine</a>'
        + bytes([0xC3])
    )
    got = extract_anchors(_pages(spark, [("https://me/p1", html)])).collect()
    assert [(r["dst_url"], r["anchor"]) for r in got] == [
        ("https://ok.example.com/", "Fine")
    ]


def test_top_anchor_per_host_argmax_and_ties(spark):
    from tabbyld_spark.extract.links import extract_anchors, top_anchor_per_host

    html = (
        '<a href="https://t.example.com/1">beta</a>'
        '<a href="https://t.example.com/2">alpha</a>'
        '<a href="https://t.example.com/3">beta</a>'
        '<a href="https://u.example.com/1">tie-b</a>'
        '<a href="https://u.example.com/2">tie-a</a>'
    )
    a = extract_anchors(_pages(spark, [("https://me/p1", html)]))
    got = {r["node"]: (r["top_anchor"], r["n_anchor"]) for r in top_anchor_per_host(a).collect()}
    assert got["t.example.com"] == ("beta", 2)
    # 1-1 tie breaks lexicographically
    assert got["u.example.com"] == ("tie-a", 1)

    # determinism under re-sharding
    b = top_anchor_per_host(a.repartition(7))
    assert {tuple(r) for r in b.collect()} == {
        ("t.example.com", "beta", 2),
        ("u.example.com", "tie-a", 1),
    }


def test_anchor_surface_forms_dictionary_and_guards(spark):
    from tabbyld_spark.extract.links import anchor_surface_forms, extract_anchors

    html = (
        '<a href="https://apple.example.com/1">Apple Inc.</a>'
        '<a href="https://apple.example.com/2">Apple Inc.</a>'
        '<a href="https://apple.example.com/3">AAPL</a>'
        # generic anchor → 4 distinct hosts
        '<a href="https://a.com/">click here</a>'
        '<a href="https://b.com/">click here</a>'
        '<a href="https://c.com/">click here</a>'
        '<a href="https://d.com/">click here</a>'
    )
    a = extract_anchors(_pages(spark, [("https://me/p1", html)]))
    d = anchor_surface_forms(a, min_count=2, max_hosts=3)
    got = {(r["surface_form"], r["entity"], r["n_links"]) for r in d.collect()}
    # min_count=2 drops AAPL (seen once); max_hosts=3 drops the generic anchor
    from tabbyld_spark.functions.normalize import normalize_entry_py

    apple = normalize_entry_py("Apple Inc.")
    assert got == {(apple, "apple.example.com", 2)}


def test_anchor_dictionary_feeds_exact_candidates(spark):
    """The crawl-derived dictionary is drop-in for kg_labels: a mention whose
    normalized form equals a mined anchor links to the anchor's host."""
    from tabbyld_spark.extract.links import anchor_surface_forms, extract_anchors
    from tabbyld_spark.operators.candidates import exact_candidates
    from tabbyld_spark.functions.normalize import normalize_entry
    import pyspark.sql.functions as F

    html = (
        '<a href="https://apple.example.com/1">Apple Inc.</a>'
        '<a href="https://apple.example.com/2">Apple Inc.</a>'
    )
    d = anchor_surface_forms(
        extract_anchors(_pages(spark, [("https://me/p1", html)]))
    )
    mentions = spark.createDataFrame(
        [("t1", "DATA", "Apple Inc.")], "table_id string, col_role string, mention string"
    ).withColumn("mention_norm", normalize_entry(F.col("mention")))
    got = exact_candidates(mentions, d).collect()
    assert len(got) == 1 and got[0]["entity"] == "apple.example.com"


def test_extract_outlinks_drop_nofollow(spark):
    from tabbyld_spark.extract.links import extract_outlinks

    html = (
        '<a href="https://f.example.com/1">follow</a>'
        '<a rel="nofollow" href="https://n.example.com/2">nf</a>'
        "<a href='https://g.example.com/3' rel='ugc nofollow'>nf-list</a>"
        '<a rel="noopener" href="https://k.example.com/4">keep-rel</a>'
    )
    pages = _pages(spark, [("https://me/p1", html)])
    all_links = {r["dst_url"] for r in extract_outlinks(pages).collect()}
    assert all_links == {
        "https://f.example.com/1", "https://n.example.com/2",
        "https://g.example.com/3", "https://k.example.com/4",
    }
    followed = {
        r["dst_url"] for r in extract_outlinks(pages, drop_nofollow=True).collect()
    }
    assert followed == {"https://f.example.com/1", "https://k.example.com/4"}
