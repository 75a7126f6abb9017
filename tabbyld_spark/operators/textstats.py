"""Text analysis for a training-data pipeline: tokenization, quality scoring,
language ID, document fingerprinting.  All native column expressions (one
whole-stage-codegen span per document batch); every operator has a DuckDB-SQL
twin in __spark_entry__.oracle_sql for the driver's correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish word/number/symbol token pattern (shared with the SQL oracle);
# kept as the raw regex — passed via F.lit, never through SQL-literal escaping
TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "para", "con"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "们"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def regex_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_RE), F.lit(0)))


def quality_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: char/token counts (whitespace AND the
    BPE-ish regex tokenizer), mean token length, punctuation ratio, stopword
    ratio (en), distinct-token ratio — one codegen span, no join."""
    t = tokens(text_col)
    n_chars = F.length(text_col)
    n_tokens = F.size(t)
    punct = F.length(F.regexp_replace(text_col, "[a-zA-Z0-9\\s]", ""))
    stop_hits = F.size(
        F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS["en"]))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        regex_token_count(text_col).alias("n_re_tokens"),
        (n_chars / n_tokens).alias("chars_per_token"),
        (punct / n_chars).alias("punct_ratio"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (F.size(F.array_distinct(t)) / n_tokens).alias("distinct_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit votes per language, argmax with
    deterministic tiebreak (lang asc).  NOTE: a real pipeline would use a
    char-n-gram model; the operator shape (explode → score → argmax) is what
    matters at scale."""
    t = tokens(text_col)

    def _hits(ws: list[str]):
        # factory closure: a default-arg lambda would make F.filter see two
        # params and bind the second to the element index
        return F.size(F.filter(t, lambda x: F.lower(x).isin(*ws)))

    scores = [
        F.struct(_hits(ws).alias("hits"), F.lit(lang).alias("lang"))
        for lang, ws in sorted(STOPWORDS.items())
    ]
    # array_max on struct(hits, lang) orders by hits then lang — we want max
    # hits with lang ASC tiebreak, so compare on (hits, negated-lang ordering)
    # instead: sort descending by hits, ascending by lang via array_sort
    arr = F.array(*scores)
    best = F.aggregate(
        arr,
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"])
            | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"])),
            s,
        ).otherwise(acc),
    )
    return docs.select(
        "doc_id", best["lang"].alias("pred_lang"), best["hits"].alias("stop_hits")
    )


# Most-frequent char trigrams per language (Cavnar & Trenkle-style n-gram
# profiles; space-padded grams carry word-boundary signal).  Latin-script
# languages only — single-char-token scripts (zh) stay with the stopword
# operator above, whose profile is per-character already.
TRIGRAM_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", "ing", "ng ", " of",
           "of ", "ion", " to", "to ", "ent", " in", "ed "],
    "de": ["er ", "en ", " de", "der", "ie ", "ch ", "sch", "ein", " ei",
           "ich", "nde", "die", "und", " un", "ung", "cht"],
    "fr": [" de", "de ", "es ", "le ", " le", "que", " qu", "ue ", "la ",
           " la", "ait", "re ", " pa", "ais", "eur", "ux "],
    "es": [" de", "de ", "os ", " la", "la ", "el ", " el", "que", " qu",
           "ue ", " en", "ión", "ado", "ar ", " co", "cio"],
}


def ngram_language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Char-trigram language ID (profile-hit voting): normalize whitespace,
    lower-case, slide a 3-char window, count hits against each language's
    trigram profile, argmax with deterministic tiebreak (lang asc).  All
    column expressions — one codegen span per batch; the profile lists are
    compile-time literals, so the filter predicates fold into the generated
    code (no join, no UDF).  Twin: oracle_sql()['q_langid_ngram']."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    # all trigrams in ONE regex pass (lookahead-capture 3, consume 1) —
    # never per-offset substr (O(doc) seek each ⇒ O(doc²) total) and never
    # an array subexpression referenced inside a transform() lambda (re-
    # evaluated per element; see winnow_fingerprints).  Docs shorter than 3
    # chars degenerate to one whole-string gram, matching substr(i, 3) on
    # a short string.
    grams = F.when(F.length(norm) < 3, F.array(norm)).otherwise(
        F.regexp_extract_all(norm, F.lit(r"(?s)(?=(.{3}))."), 1)
    )
    d = docs.withColumn("_g", grams)

    def _hits(prof: list[str]):
        return F.size(F.filter(F.col("_g"), lambda g: g.isin(*prof)))

    scores = [
        F.struct(_hits(prof).alias("hits"), F.lit(lang).alias("lang"))
        for lang, prof in sorted(TRIGRAM_PROFILES.items())
    ]
    best = F.aggregate(
        F.array(*scores),
        F.struct(F.lit(-1).alias("hits"), F.lit("zz").alias("lang")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"])
            | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"])),
            s,
        ).otherwise(acc),
    )
    return d.select(
        "doc_id",
        best["lang"].alias("pred_lang_ngram"),
        best["hits"].alias("tri_hits"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lower-cased text (portable across engines)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def gopher_repetition(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition-quality signals (Rae et al. 2021, app. A1.1
    "repetitious text" filters, re-derived as columnar signals): the share of
    normalized characters covered by the single most frequent word 2-gram,
    and the duplicate word 3-gram fraction.

    → (doc_id, top_2gram, top_2gram_count, top_2gram_frac, dup_3gram_frac)

    Scale shape: the WHOLE operator is one zero-shuffle codegen projection.
    Gram arrays come from one-pass lookahead regexes; ``dup_3gram_frac`` is
    ``array_distinct`` over the 3-gram array; the per-doc top 2-gram is the
    longest equal-run in the SORTED 2-gram array, found by a single linear
    ``aggregate`` pass whose accumulator carries (prev, run, best, top) —
    no explode, no (doc, gram)-grain exchange, no window.  (The obvious
    explode→groupBy→window formulation is not just a needless shuffle: the
    doc-grain companion columns riding through the explode get re-evaluated
    per exploded row when Catalyst collapses the projection — measured 12s
    vs 0.9s on 5k docs.  The SQL twin deliberately KEEPS the unnest+window
    formulation so the two engines cross-check different algorithms.)
    Ties break on (count desc, gram asc): in a sorted array runs appear in
    ascending gram order, so keeping the FIRST maximal run (strict ``>``)
    is exactly the lexicographic tiebreak.  Docs shorter than n tokens
    degenerate to one whole-text gram (top_2gram_frac = 1.0,
    dup_3gram_frac = 0.0), same as the SQL twin.
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    t = F.split(norm, " ")

    def grams(n: int):
        # lookahead-capture n tokens, consume one — one regex pass, never
        # slice() inside transform() (per-element re-eval, O(words²)/doc)
        pat = rf"(?=(\S+(?: \S+){{{n - 1}}}))\S+ ?"
        return F.when(F.size(t) < n, F.array(norm)).otherwise(
            F.regexp_extract_all(norm, F.lit(pat), 1)
        )

    g3 = grams(3)
    # linear scan over the sorted 2-gram array: longest run = modal gram.
    # The lambda touches only the accumulator and the current element —
    # never an outer array reference (the per-element re-eval trap).
    run_scan = F.aggregate(
        F.array_sort(grams(2)),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit("").alias("top"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)) > acc.best, x
            )
            .otherwise(acc.top)
            .alias("top"),
        ),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(norm).alias("_nc"),
        (F.lit(1.0) - F.size(F.array_distinct(g3)) / F.size(g3)).alias("_dup3"),
        run_scan.alias("_s"),
    ).select(
        "doc_id",
        F.col("_s.top").alias("top_2gram"),
        F.col("_s.best").cast("long").alias("top_2gram_count"),
        F.round(
            F.col("_s.best") * F.length("_s.top") / F.col("_nc"), 6
        ).alias("top_2gram_frac"),
        F.round("_dup3", 6).alias("dup_3gram_frac"),
    )


def train_split(docs: DataFrame, val_pct: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Deterministic hash split for reproducible held-out sets: bucket =
    (first 4 hex digits of md5(doc_id)) mod 100; ``val`` iff bucket <
    val_pct.  A pure function of the id — stable across runs, partitionings
    and engines (the property a training pipeline needs so the validation
    set never leaks into training when the corpus is re-sharded).  Zero
    shuffle: one projection inside whole-stage codegen."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10).cast("long")
        % 100
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        bucket.alias("bucket"),
        F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")).alias("split"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    chunk_chars: int = 4096,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken rolling-hash
    window minima): hash every character k-gram of the normalized text,
    slide a window of ``w`` gram hashes, keep each window's minimum —
    → distinct (doc_id, pos, fp), with ``pos`` the 1-based gram offset of
    the LEFTMOST minimal hash in its window (deterministic tiebreak).

    Guarantees the classic winnowing property: any match of length
    ≥ k + w − 1 between two documents shares at least one selected
    fingerprint — the plagiarism/near-dup detection shape at corpus scale.
    All columnar: two nested array transforms per chunk + one explode;
    hashes are md5 hex strings so the min-order is identical in Spark and
    the DuckDB twin (ASCII lexicographic).

    Per-task memory is bounded by ``chunk_chars``: the gram-hash array costs
    ~64 bytes per character, so a 10 MB crawl page held as ONE array value
    would peak at ~1 GB per task.  CPU is LINEAR in document length: chunk
    extraction is a single ``\\G``-anchored fixed-length split (one regex
    pass — per-chunk ``substring(_n, c*C+1, …)`` would seek char offsets
    from byte 0 and cost O(doc²/C)), and in-chunk gram hashing slices a
    per-chunk char array (O(1) element access) instead of per-offset
    ``substring`` (O(chunk) seek each ⇒ O(doc·chunk) total).  Chunks carry
    a k+w−2 overlap — every w-gram window lies entirely within exactly one
    chunk (window start g belongs to chunk floor((g−1)/C)) and positions
    stay absolute, so the selected (doc_id, pos, fp) set is IDENTICAL to
    the unchunked computation for every input (property-tested in
    tests/test_textstats.py)."""
    C = int(chunk_chars)
    OV = k + w - 2  # overlap so boundary windows fit
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    d = docs.select("doc_id", norm.alias("_n"))
    # CRITICAL evaluation-model constraint: an array-valued subexpression
    # referenced INSIDE a higher-order-function lambda is re-evaluated per
    # ELEMENT (CollapseProject inlines column aliases into the lambda body,
    # and interpreted HOFs have no per-row subexpression cache) — a split()
    # referenced from a transform() lambda turned this operator O(doc·chunk)
    # to O(doc²).  Every stage below therefore extracts its array in ONE
    # regex pass (regexp_extract_all) or consumes arrays only as TOP-LEVEL
    # zip_with/slice arguments, which evaluate once per row no matter how
    # often the optimizer duplicates them.
    #
    # chunk c covers window starts c*C+1..(c+1)*C and carries the next OV
    # chars: one (?s) pass captures C+OV chars of lookahead at each C-char
    # boundary; trailing segs with no valid window start (c*C+1 > len−OV)
    # are dropped, leaving exactly ceil((len−OV)/C) ∨ 1 chunks as before.
    seg_pat = rf"(?s)(?=(.{{1,{C + OV}}}))(?:.{{{C}}}|.{{1,{C}}}$)"
    segs = F.regexp_extract_all(F.col("_n"), F.lit(seg_pat), 1)
    segs = F.when(F.size(segs) == 0, F.array(F.lit(""))).otherwise(segs)
    d = (
        d.select("doc_id", F.length("_n").alias("_len"), F.posexplode(segs))
        .filter((F.col("pos") == 0) | (F.col("pos") * C + 1 <= F.col("_len") - OV))
        .select(
            "doc_id",
            (F.col("pos") * C).alias("_off"),
            F.col("col").alias("_seg"),
        )
    )
    # all k-grams in one pass: lookahead-capture k chars, consume 1; short
    # docs (< k chars) degenerate to a single whole-string gram as before
    gram_pat = rf"(?s)(?=(.{{{k}}}))."
    gram_strs = F.when(
        F.length("_seg") < k, F.array(F.col("_seg"))
    ).otherwise(F.regexp_extract_all(F.col("_seg"), F.lit(gram_pat), 1))
    hs = F.zip_with(
        F.transform(gram_strs, F.md5),
        F.sequence(F.lit(1), F.greatest(F.length("_seg") - (k - 1), F.lit(1))),
        lambda h, i: F.struct(h.alias("fp"), i.alias("pos")),
    )
    d = d.select("doc_id", "_off", hs.alias("_hs"))
    # sliding-window minimum over (fp, pos) structs via w−1 chained
    # zip_with(least) against self-shifts: least() skips the nulls zip_with
    # pads with, and struct order (fp, pos) makes the minimum the LEFTMOST
    # minimal hash — the winnowing tiebreak.  O(w·grams) per row, no
    # per-window slices.
    # exact slice length — start+length must not overflow int32: a 2^31−1
    # length standalone clamps, but inside zip_with codegen it wraps and the
    # shift silently evaluates empty (the chain then no-ops; caught by the
    # old-vs-new A/B, now pinned in tests)
    m = F.col("_hs")
    for s in range(1, w):
        m = F.zip_with(
            m,
            F.slice(
                F.col("_hs"), s + 1, F.greatest(F.size("_hs") - s, F.lit(1))
            ),
            lambda a, b: F.least(a, b),
        )
    wins = F.slice(m, 1, F.greatest(F.size("_hs") - (w - 1), F.lit(1)))
    return (
        d.select("doc_id", "_off", F.explode(wins).alias("_w"))
        .select(
            "doc_id",
            (F.col("_off") + F.col("_w.pos")).cast("long").alias("pos"),
            F.col("_w.fp").alias("fp"),
        )
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Cross-document overlap candidates from shared winnowing fingerprints
    (the MOSS shape): pairs (id_a < id_b) with ``shared`` = number of common
    selected fingerprints ≥ ``min_shared``, plus ``overlap`` = shared /
    min(|fps_a|, |fps_b|) — a containment-style score where 1.0 means one
    document's surviving fingerprint set is fully inside the other's.

    Scale path: inverted-index equi-join on fp (only docs sharing a
    fingerprint ever meet — never all-pairs), with ``max_df`` dropping
    boilerplate fingerprints present in more than max_df documents before the
    join (same skew guard as ngram_jaccard_pairs; a fingerprint in d docs
    would otherwise emit d² join rows).  Per-doc sizes are counted AFTER the
    max_df filter so ``overlap`` is containment over the retained set — the
    DuckDB twin mirrors this.  Shuffles: one per-doc distinct, one df count,
    one fp-keyed join, one pair groupBy — all key-partitioned, no driver
    collection."""
    from tabbyld_spark.functions.lineage import cut

    # cut: the fingerprint set feeds THREE consumers (df counts, the pair
    # join's two sides, per-doc sizes) — without a materialization boundary
    # Spark re-executes the whole winnowing chain per consumer (no
    # cross-consumer CSE), measured ~3× this operator's cost
    fps = cut(
        winnow_fingerprints(docs, k, w, text_col).select("doc_id", "fp").distinct()
    )
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    fps = fps.join(df_counts.filter(F.col("_df") <= max_df), "fp").select(
        "doc_id", "fp"
    )
    sizes = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.select(F.col("doc_id").alias("id_a"), "fp")
    b = fps.select(F.col("doc_id").alias("id_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("_sa")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("_sb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.col("shared").cast("long").alias("shared"),
            F.round(F.col("shared") / F.least("_sa", "_sb"), 6).alias("overlap"),
        )
    )


def lexicon_flags(
    docs: DataFrame,
    words: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style content-lexicon filter signal (Raffel et al. 2020 §2.2 drop
    pages containing any entry of a public blocklist): → (doc_id, n_hits,
    flagged) where n_hits counts tokens (lowercased) that appear in
    ``words`` and flagged is n_hits > 0.  The caller supplies the lexicon —
    nothing is baked in.

    Scale shape: the lexicon compiles into ONE literal array inside the
    whole-stage-codegen projection — zero shuffle, zero Python.  The
    membership probe is per-token; for lexicons beyond a few thousand
    entries switch to the ``decontaminate`` shape (broadcast the lexicon as
    a frame and probe map-side) rather than growing the literal."""
    wl = F.lit([w.lower() for w in words])
    toks = tokens(F.col(text_col))
    n_hits = F.size(F.filter(toks, lambda x: F.array_contains(wl, F.lower(x))))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_hits.cast("long").alias("n_hits"),
        (n_hits > 0).alias("flagged"),
    )
