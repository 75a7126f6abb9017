"""Deduplication operators for a large-scale training-data pipeline.

Six strategies, cheapest to richest:
  * exact           hash-groupBy on the text fingerprint (one shuffle)
  * n-gram Jaccard  shingle explode → inverted-index self-join → set overlap
  * MinHash-LSH     pyspark.ml MinHashLSH band-bucket blocking (approx)
  * SimHash         portable 32-bit simhash from md5 hex digits (no UDF)
  * embedding       cosine near-dup over array<float> vectors (LSH-blocked)
  * SemDeDup        k-means cluster → within-cluster cosine groups → one
                    representative per group (cluster-bounded quadratic)

All shuffles key on content-derived hashes (uniform by construction); the
shingle inverted index drops ultra-frequent shingles (document-frequency cap)
— the classic skew guard for web-scale dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tabbyld_spark.functions.vectors import cosine
from tabbyld_spark.operators.textstats import tokens


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """→ (doc_id, fp, keep_id, group_size): every doc mapped to the minimum id
    of its exact-duplicate group (survivors have doc_id == keep_id).  ``fp``
    is the md5 content fingerprint the grouping keys on (also the document
    fingerprint surface — same normalization as streaming.stateful)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    w = Window.partitionBy("fp")
    return (
        docs.select(id_col, F.md5(norm).alias("fp"))
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .select(id_col, "fp", "keep_id", "group_size")
    )


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document: (doc_id, shingle).

    One regex pass (lookahead-capture n tokens, consume one) over the
    whitespace-normalized text — never ``slice(tokens, i, n)`` inside a
    transform() lambda, which re-evaluates the token array per element
    (O(words²) per doc; see operators/textstats.py winnow notes).  Shingle
    strings are identical to the former concat_ws(' ', slice(...)) because
    the text is single-space-normalized first; docs with fewer than n
    tokens degenerate to one whole-text shingle exactly as before."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = rf"(?=(\S+(?: \S+){{{n - 1}}}))\S+ ?"
    sh = F.when(
        F.size(F.split(norm, " ")) < n, F.array(norm)
    ).otherwise(F.regexp_extract_all(norm, F.lit(pat), 1))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(sh)).alias("shingle")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with a held-out benchmark/eval set — the standard n-gram-overlap
    scrub applied to pretraining corpora (GPT-3 used 13-grams; n is a
    parameter here because the synthetic fixture docs are short).

    → (doc_id, shared_grams, contaminated) for every corpus doc NOT itself
    in the benchmark (anti-join on id); shared_grams counts the doc's
    DISTINCT n-grams that appear anywhere in the benchmark set.

    Scale shape: eval sets are KBs against a corpus of TBs, so the
    benchmark's distinct-gram set is broadcast and the corpus-side probe is
    map-side — corpus grams are NEVER shuffled.  The only exchanges are the
    benchmark-side distinct (tiny) and the (doc_id)-grain count of
    surviving matches (rare by construction); the zero-fill join-back keys
    on doc ids only."""
    cand = docs.join(benchmark.select(F.col(id_col)), on=id_col, how="left_anti")
    bench_grams = (
        word_shingles(benchmark, n, text_col, id_col).select("shingle").distinct()
    )
    hits = (
        word_shingles(cand, n, text_col, id_col)
        .join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return (
        cand.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("shared_grams", F.lit(0)).cast("long").alias("shared_grams"),
            (F.coalesce("shared_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets, via inverted-index
    self-join (only docs sharing ≥1 shingle are compared).

    ``max_df`` drops shingles appearing in more than max_df docs — boilerplate
    shingles otherwise create a quadratic hot bucket (skew guard)."""
    sh = word_shingles(docs, n, text_col, id_col)
    df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    sh = sh.join(df_counts.filter(F.col("_df") <= max_df), "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    num_hash_tables: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Approximate near-dup pairs via MinHash-LSH over word 3-gram shingles
    (Jaccard distance ≤ threshold).  The scale path: band-bucket join instead
    of the inverted-index quadratic worst case."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = word_shingles(docs, 3, text_col, id_col).groupBy("doc_id").agg(
        F.collect_list("shingle").alias("_grams")
    )
    tf = HashingTF(inputCol="_grams", outputCol="_vec", numFeatures=1 << 18, binary=True)
    vecs = tf.transform(sh).filter(F.expr("size(_grams) > 0"))
    lsh = MinHashLSH(inputCol="_vec", outputCol="_h", numHashTables=num_hash_tables, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, threshold, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            "jaccard_dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Portable 32-bit SimHash: per token, bit j comes from hex digit
    j//4 of md5(token) (bit j = the j-th MSB of the first ``bits//4`` hex
    digits); the document bit is the sign of the per-bit vote sum.  Pure
    integer/string builtins → identical in Spark and the DuckDB oracle.

    Zero shuffle; the per-token work is ONE md5 + ONE hex→int conversion
    (each token's leading ``bits`` md5 bits become a single integer, staged
    as its own projection so the folds read an attribute, not re-inlined
    copies), and vote counting is ``bits/2`` allocation-free integer folds,
    each accumulating TWO bit counters packed into one long (counter for
    bit j+bits/2 in the high 32 bits, bit j in the low; token arrays are
    < 2^31 elements, so neither half can overflow).  The sign test is
    ``2·cnt_j > n_tokens`` ⟺ Σ(±1) > 0.

    Shape history, with sf0.1 measurements (local[32], warm best-of-3):
    the original shape exploded tokens × 32 bits through a hash exchange;
    the round-3 shape folded a per-token 32-element ±1 vote ARRAY (zip_with
    + substr/conv/pow per element — 0.29s on the 150-doc bench slice but
    4.6s on the 60k-doc corpus: an allocation and ~6× the arithmetic per
    token); the round-4 shape used 32 separate scalar folds (1.2-1.3s on
    the full corpus — 3.7× faster than round-3 at scale — but 0.78s on the
    150-doc slice, all fixed plan/codegen constant from 32 aggregate
    expressions, which is the bench 'regression' round 4 recorded).  The
    packed-counter shape halves the expression count: 0.59s on the slice,
    1.23s on the full corpus — the constant shrinks and the at-scale cost
    is unchanged, and at sf1+ the per-token term dominates either way, so
    the round-3 shape only ever wins when the input is trivially small."""
    if bits % 2:
        raise ValueError("simhash bits must be even (counter-pairing fold)")
    n_hex = (bits + 3) // 4
    h_int = F.transform(
        tokens(text_col),
        lambda t: F.conv(F.md5(t).substr(1, n_hex), 16, 10).cast("long"),
    )
    staged = docs.select(F.col(id_col).alias("doc_id"), h_int.alias("_h"))

    half = bits // 2
    HI = 1 << 32

    def cnt2(j):
        # one fold, two counters: h bit (bits-1-j) → simhash bit j (high
        # half of the accumulator), h bit (half-1-j) → bit j+half (low)
        return F.aggregate(
            F.col("_h"),
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.shiftright(h, bits - 1 - j) % 2 * HI
            + F.shiftright(h, half - 1 - j) % 2,
        )

    sim = None
    for j in range(half):
        packed = cnt2(j)
        c_j = F.shiftright(packed, 32)
        c_jh = packed % HI
        term = F.when(
            c_j * 2 > F.size("_h"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long")) + F.when(
            c_jh * 2 > F.size("_h"), F.lit(1 << (j + half)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return staged.select("doc_id", sim.alias("simhash"))


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine near-duplicate pairs (brute-force BASELINE — quadratic crossJoin,
    fixture/verification scale only; the production path is
    :func:`embedding_dedup_pairs_blocked`)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_dedup_pairs_blocked(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Scale path: hyperplane-LSH band blocking (same deterministic planes as
    similarity.lsh_topk), exact cosine rescoring on the bucketed shortlist.
    Only vectors agreeing on ALL sign bits of some band are compared — an
    equi-join on (band, bucket) instead of the |emb|² crossJoin.  Near-dup
    pairs (cos ≥ 0.95 ⇒ angle ≤ 18°) land in a shared band w.h.p.; recall vs
    the brute-force baseline is pytest-gated (tests/test_dedup.py)."""
    from tabbyld_spark.functions.vectors import dot
    from tabbyld_spark.operators.similarity import _hyperplanes

    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes_df = F.array(
        *[F.array(*[F.lit(float(v)) for v in row]) for row in _hyperplanes(dim, n_planes, seed)]
    )
    per_band = n_planes // n_bands
    sig = F.transform(
        planes_df,
        lambda plane: F.when(dot(F.col(vec_col), plane) >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    # explode band INDICES first, derive buckets after the Generate barrier:
    # a bucket lambda that references _sig would re-evaluate the whole
    # n_planes-dot-product signature per band (CollapseProject inlines the
    # alias into the lambda body); past the Generate, _sig is a bound
    # attribute computed once per row
    banded = (
        emb.withColumn("_sig", sig)
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("v"),
            "_sig",
            F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
        )
        .select(
            "vid",
            "v",
            "band",
            F.concat_ws(
                "", F.slice("_sig", F.col("band") * per_band + 1, per_band)
            ).alias("bucket"),
        )
    )
    a = banded.select("band", "bucket", F.col("vid").alias("id_a"), F.col("v").alias("va"))
    b = banded.select("band", "bucket", F.col("vid").alias("id_b"), F.col("v").alias("vb"))
    # rescore BEFORE the distinct and threshold-filter first: the dedup
    # exchange then carries only (id_a, id_b, cos) scalars for the rare
    # surviving near-dup pairs — never the embedding arrays (shuffling full
    # vectors through the distinct was ~dim×8 bytes per candidate pair).  A
    # pair sharing multiple bands pays the cosine once per shared band —
    # codegen CPU, traded against shuffle bytes, the right side at scale.
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .distinct()
    )


def line_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4/CCNet-style global line (paragraph) dedup: every distinct
    non-empty line is kept only at its first occurrence across the WHOLE
    corpus (first = minimum (doc_id, line_no)); each document is reassembled
    from its surviving lines in original order.  (C4, Raffel et al. 2020
    §2.2, dedups three-sentence spans globally; CCNet and Dolma dedup at
    paragraph grain — the line is the deterministic, tokenizer-free variant.)

    → (doc_id, text, n_lines, n_kept): the deduped text ('' when every line
    was a duplicate — the doc row is retained so downstream joins don't lose
    ids), plus per-doc line counts for quality filtering.

    Scale shape: explode to line grain, ONE aggregation keyed on the line
    hash (map-side partial; carries an 8-byte hash + the min (doc_id,
    line_no) struct, never line text), join back at line grain on the hash
    (uniform by construction — the classic boilerplate key skew is bounded
    by the aggregation happening BEFORE the join-back, so a line appearing
    10^9 times contributes one row to the winner side), then one (doc_id)
    aggregation to reassemble.  Nothing quadratic; no full-text shuffle
    beyond the two doc/line-grain exchanges every global dedup needs."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line"),
    ).filter(F.length(F.trim("line")) > 0)
    # key on (hash, line): the 8-byte hash drives uniform partitioning, the
    # line text keeps the dedup EXACT (hash-only grouping silently merges
    # 64-bit collisions — expected at ~4B distinct lines, i.e. guaranteed at
    # 10^12 docs); map-side partial aggregation collapses duplicates before
    # the exchange, so shuffle bytes ≈ distinct lines either way
    lines = lines.withColumn("lhash", F.xxhash64("line"))
    winners = lines.groupBy("lhash", "line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first")
    )
    kept = (
        lines.join(winners, ["lhash", "line"])
        .filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("line_no") == F.col("first.line_no"))
        )
        .select("doc_id", "line_no", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                lambda s: s.line,
            ),
            "\n",
        ).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        # coalesce: size(NULL) is NULL in Spark 4 — a NULL-text doc reads as
        # ('', 0, 0), same as an all-blank one
        F.coalesce(
            F.size(
                F.filter(
                    F.split(F.col(text_col), "\n"),
                    lambda l: F.length(F.trim(l)) > 0,
                )
            ),
            F.lit(0),
        ).cast("long").alias("n_lines"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text", F.lit("")).alias("text"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr method, re-expressed
# for Spark: the paper builds one giant suffix array over the concatenated
# corpus on one machine; a suffix array is not a distributed-friendly
# structure, but its USE here — "find every maximal substring of >= k tokens
# that occurs more than once in the corpus, keep the first occurrence" — is
# exactly a fixed-width rolling-window duplicate scan, which IS distributable:
# hash every k-token window, aggregate window occurrences globally (one
# content-hash shuffle with map-side partials), mark every occurrence except
# the corpus-wide first, and merge overlapping duplicate windows per document
# into maximal spans in a single array expression.  Overlapping k-windows
# cover any duplicated run of length >= k, so merged spans equal the paper's
# maximal duplicated substrings at token granularity.
# ---------------------------------------------------------------------------


def _window_occurrences(docs: DataFrame, k: int, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, pos, wh, okey): every k-token window of the whitespace-
    normalized text — ``pos`` is the 0-based token index, ``wh`` the md5 of
    the window string (128-bit: hash-only grouping is collision-safe where a
    64-bit hash would silently merge distinct windows at 10^12-doc scale),
    ``okey`` = struct(doc_id, pos), the total occurrence order (struct min
    is lexicographic, so it works for numeric ids and url-string ids alike;
    the numeric DuckDB twins min doc_id*2^32+pos, which picks the identical
    first occurrence).  One lookahead-capture
    regex pass per doc (never slice-in-transform — the O(tokens²) HOF
    re-evaluation trap, see word_shingles).  Docs with < k tokens emit no
    windows: a text shorter than the match threshold has nothing to dedup."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    pat = rf"(?=(\S+(?: \S+){{{k - 1}}}))\S+ ?"
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("pos", "w"),
        )
        .select(
            "doc_id",
            "pos",
            F.md5("w").alias("wh"),
            # struct min = lexicographic (doc_id, pos) — works for numeric
            # AND string ids (urls); for numeric ids this picks the same
            # first occurrence as the DuckDB twins' doc_id*2^32+pos min
            F.struct("doc_id", "pos").alias("okey"),
        )
    )


def duplicate_spans(
    docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, span_start, span_end, n_windows): maximal token ranges
    [span_start, span_end) whose every k-window also occurs EARLIER in the
    corpus (earlier = smaller (doc_id, pos)); the corpus-wide first
    occurrence of each window is never marked, so scrubbing the spans keeps
    exactly one copy of every duplicated run — within-doc repeats included.

    Scale shape: groupBy(wh) carries map-side partial count/min (a
    boilerplate window occurring 10^6 times costs one row per map task, the
    line_dedup argument), the join back is wh-keyed equi (uniform by
    construction), and the interval merge is one in-expression pass over the
    per-doc sorted position array (bounded by tokens/doc, the winnowing
    memory argument)."""
    wins = _window_occurrences(docs, k, text_col, id_col)
    firsts = wins.groupBy("wh").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("okey").alias("first_okey")
    )
    dup_pos = (
        wins.join(firsts.filter(F.col("n_occ") > 1), "wh")
        .filter(F.col("okey") != F.col("first_okey"))
        .select("doc_id", "pos")
    )
    merged = (
        dup_pos.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            "doc_id",
            F.aggregate(
                "ps",
                F.lit(None).cast("array<struct<s:int,e:int>>"),
                lambda acc, p: F.when(acc.isNull(), F.array(F.struct(p.alias("s"), (p + k).alias("e"))))
                .when(
                    p <= F.element_at(acc, -1).e,
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(
                            F.struct(
                                F.element_at(acc, -1).s.alias("s"),
                                F.greatest(F.element_at(acc, -1).e, p + k).alias("e"),
                            )
                        ),
                    ),
                )
                .otherwise(F.concat(acc, F.array(F.struct(p.alias("s"), (p + k).alias("e"))))),
            ).alias("spans"),
        )
    )
    return merged.select(
        "doc_id",
        F.explode("spans").alias("sp"),
    ).select(
        "doc_id",
        F.col("sp.s").cast("long").alias("span_start"),
        F.col("sp.e").cast("long").alias("span_end"),
    )


def duplicate_span_profile(
    docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Doc-grain rollup of :func:`duplicate_spans`, zero-filled for clean
    docs: (doc_id, n_dup_windows, n_dup_spans, n_dup_tokens)."""
    wins = _window_occurrences(docs, k, text_col, id_col)
    firsts = wins.groupBy("wh").agg(
        F.count(F.lit(1)).alias("n_occ"), F.min("okey").alias("first_okey")
    )
    dup_pos = (
        wins.join(firsts.filter(F.col("n_occ") > 1), "wh")
        .filter(F.col("okey") != F.col("first_okey"))
        .select("doc_id", "pos")
    )
    per_doc = (
        dup_pos.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
        .select(
            "doc_id",
            F.size("ps").cast("long").alias("n_dup_windows"),
            F.aggregate(
                "ps",
                # (spans, last_end): count a span on every gap, sum covered
                # tokens as extension beyond the running end
                F.struct(F.lit(0).cast("long").alias("n"), F.lit(-1).cast("long").alias("end"), F.lit(0).cast("long").alias("cov")),
                lambda acc, p: F.struct(
                    (acc.n + F.when(p > acc.end, 1).otherwise(0)).alias("n"),
                    F.greatest(acc.end, (p + k).cast("long")).alias("end"),
                    (
                        acc.cov
                        + F.when(p >= acc.end, F.lit(k).cast("long")).otherwise(
                            F.greatest(F.lit(0).cast("long"), (p + k).cast("long") - acc.end)
                        )
                    ).alias("cov"),
                ),
                lambda acc: F.struct(acc.n.alias("n"), acc.cov.alias("cov")),
            ).alias("agg"),
        )
        .select("doc_id", "n_dup_windows", F.col("agg.n").alias("n_dup_spans"), F.col("agg.cov").alias("n_dup_tokens"))
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
    )


def remove_duplicate_spans(
    docs: DataFrame, k: int = 16, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, text, n_removed_tokens): the whitespace-normalized text
    with every duplicate span scrubbed (corpus-wide first occurrence kept —
    the ExactSubstr edit).  The keep-mask is built by one pass over the
    per-doc span list (O(tokens × spans_per_doc), spans already merged and
    few), never a per-token exists() over a column array — the HOF
    re-evaluation trap."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    spans = (
        duplicate_spans(docs, k=k, text_col=text_col, id_col=id_col)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("int").alias("s"),
                    F.col("span_end").cast("int").alias("e"),
                )
            ).alias("spans")
        )
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.length(norm) > 0, F.split(norm, " ")).otherwise(
            F.array().cast("array<string>")
        ).alias("t"),
    )
    joined = toks.join(spans, "doc_id", "left")
    mask = F.when(F.col("spans").isNull(), F.array_repeat(F.lit(True), F.size("t"))).otherwise(
        F.aggregate(
            "spans",
            F.array_repeat(F.lit(True), F.size("t")),
            lambda acc, sp: F.transform(
                acc, lambda keep, i: keep & ~((i >= sp.s) & (i < sp.e))
            ),
        )
    )
    kept = F.filter(F.arrays_zip(F.col("t"), mask.alias("m")), lambda z: z.m)
    return joined.select(
        "doc_id",
        F.array_join(F.transform(kept, lambda z: z.t), " ").alias("text"),
        (F.size("t") - F.size(kept)).cast("long").alias("n_removed_tokens"),
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 10_000,
    salt: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — cluster-then-prune
    semantic dedup: → (id, cluster, group, keep), ``keep`` true for the one
    representative of each within-cluster cosine-similarity group.

    The third embedding-dedup method beside the quadratic baseline
    (:func:`embedding_dedup_pairs`) and hyperplane-LSH blocking
    (:func:`embedding_dedup_pairs_blocked`), and the one the paper showed
    scales to web corpora: a deterministic Lloyd k-means
    (``similarity.train_centroids`` — the same codebook machinery as the
    IVF index) partitions the embedding space, pairs are enumerated only
    WITHIN a cluster (equi-join on ``centroid`` — the quadratic term is
    bounded by ``max_cluster``² per cluster, never |corpus|²), cosine is
    verified in-expression on the join output, and similarity groups are
    closed with the salted connected components so transitive near-dup
    chains collapse to ONE representative (component = min id — the same
    deterministic winner rule as :func:`exact_dedup`).

    Skew guard semantics: clusters larger than ``max_cluster`` keep ALL
    their members (keep=true, group=self) — dedup coverage degrades on a
    pathological cluster, data is never silently dropped (the conservative
    direction for a dedup operator; the ER ``max_block`` guard makes the
    same call).  Vectors ride exactly one centroid-grain exchange; the
    pair-grain output carries only (src, dst) into the components step.

    Determinism: seeds, assignment argmax tiebreak, decimal centroid
    means, and the min-id winner are all pure functions of the input set —
    retries, re-shards, and re-runs keep the identical survivor set
    (pytest vs ``repartition``; cluster-scoped semantics pinned against a
    brute-force union-find reference at n_clusters=1)."""
    from tabbyld_spark.functions.lineage import cut
    from tabbyld_spark.operators.components import connected_components
    from tabbyld_spark.operators.similarity import _assign_centroid, train_centroids

    cents = train_centroids(
        emb, n_centroids=n_clusters, n_iter=n_iter, id_col=id_col, vec_col=vec_col
    )
    # assignment feeds the size guard, both pair sides, and the final
    # labeling — cut once (the multi-consumer rule)
    assigned = cut(
        _assign_centroid(
            emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
            cents,
            "_v",
        )
    )
    sizes = assigned.groupBy("centroid").agg(F.count(F.lit(1)).alias("cn"))
    ok = assigned.join(
        F.broadcast(
            sizes.filter(F.col("cn") <= int(max_cluster)).select("centroid")
        ),
        "centroid",
    )
    a = ok.select(F.col("_id").alias("src"), "centroid", F.col("_v").alias("va"))
    b = ok.select(F.col("_id").alias("dst"), "centroid", F.col("_v").alias("vb"))
    edges = (
        a.join(b, "centroid")
        .filter(F.col("src") < F.col("dst"))
        .withColumn("cos", cosine("va", "vb"))
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("src", "dst")
    )
    # count gate: a clean corpus (or clean partition of one) yields zero
    # similarity edges — skip the iterative components loop entirely and
    # label everything its own group (identical output, none of the
    # ~2-jobs-per-round latency on nothing)
    edges = cut(edges)
    if edges.limit(1).count() == 0:
        return assigned.select(
            F.col("_id").alias(id_col),
            F.col("centroid").alias("cluster"),
            F.col("_id").alias("group"),
            F.lit(True).alias("keep"),
        )
    comp = connected_components(edges, salt=salt)
    return (
        assigned.select("_id", "centroid")
        .join(comp.withColumnRenamed("node", "_id"), "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("centroid").alias("cluster"),
            F.coalesce("component", F.col("_id")).alias("group"),
            (F.coalesce("component", F.col("_id")) == F.col("_id")).alias("keep"),
        )
    )


def semantic_decontaminate(
    emb: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = 16,
    n_probe: int = 4,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space benchmark decontamination — the semantic complement
    to the n-gram :func:`decontaminate`: → (id, nearest_benchmark,
    max_cos, contaminated) flagging corpus vectors whose cosine to ANY
    benchmark vector reaches ``threshold`` (paraphrased eval leakage that
    shares no n-gram).

    Pure composition: the benchmark side (KBs of eval data vs TBs of
    corpus) is the IVF corpus — its k-means codebook models exactly the
    region of space where contamination can occur — and every corpus
    vector probes its ``n_probe`` nearest cells (``similarity.ivf_topk``
    at k=1).  ``n_probe == n_centroids`` degenerates to exact brute force
    against the benchmark; recall at lower probe counts follows the IVF
    recall contract the driver already gates (``q_ann_recall``).  Ids are
    namespaced internally so corpus/benchmark id collisions never drop a
    self-pair."""
    from tabbyld_spark.operators.similarity import ivf_topk

    c = emb.select(
        F.concat(F.lit("c:"), F.col(id_col).cast("string")).alias(id_col),
        F.col(vec_col),
    )
    b = benchmark.select(
        F.concat(F.lit("b:"), F.col(id_col).cast("string")).alias(id_col),
        F.col(vec_col),
    )
    top = ivf_topk(
        b,
        c,
        k=1,
        n_centroids=n_centroids,
        n_probe=n_probe,
        n_iter=n_iter,
        id_col=id_col,
        vec_col=vec_col,
    ).filter(F.col("rank") == 1)
    return (
        c.select(F.col(id_col).alias("query_id"))
        .join(top, "query_id", "left")
        .select(
            F.expr("substring(query_id, 3)").alias(id_col),
            F.expr("substring(neighbor_id, 3)").alias("nearest_benchmark"),
            F.coalesce("cos", F.lit(-1.0)).alias("max_cos"),
            (F.coalesce("cos", F.lit(-1.0)) >= F.lit(float(threshold))).alias(
                "contaminated"
            ),
        )
    )
