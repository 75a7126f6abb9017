"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline (pages → CEA/CTA/
CPA → triples) on a deterministic synthetic pages fixture (BASELINE.json
input_hint shape — synthesized in-repo, no external data).

``queries()`` exposes every implemented operator from SURVEY.md §2 over the
driver's testdata tables; ``oracle_sql()`` provides the DuckDB twin for each
SQL-expressible one.  Column names/types are aligned on both sides (counts →
BIGINT, ratios/aggregates → DOUBLE rounded where summation order could differ).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tabbyld_spark.functions.normalize import (
    normalize_entry,
    normalize_entry_sql,
)
from tabbyld_spark.operators.dedup import (
    decontaminate,
    duplicate_span_profile,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from tabbyld_spark.operators.privacy import PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE
from tabbyld_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk
from tabbyld_spark.operators.textstats import (
    STOPWORDS,
    TOKEN_RE,
    TRIGRAM_PROFILES,
    gopher_repetition,
    language_id,
    ngram_language_id,
    quality_stats,
    tokens,
    train_split,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full STI pipeline on a deterministic synthetic pages fixture
    → (subj, pred, obj) triples.  Driver checks rows > 0 and stable schema."""
    from tabbyld_spark.fixtures.kg import build_kg
    from tabbyld_spark.fixtures.pages import gen_pages_pd
    from tabbyld_spark.plans.pipeline import annotate_pages

    kg = build_kg(seed=42)
    fx = gen_pages_pd(kg, n_pages=40, seed=42)
    pages = spark.createDataFrame(fx.pages)
    res = annotate_pages(pages, kg.to_spark(spark), fuzzy_enabled=True)
    return res.triples.orderBy("subj", "pred", "obj")


# --------------------------------------------------------------------------
# relational operator coverage (SURVEY.md §2.2)
# --------------------------------------------------------------------------

def q_agg_groupby(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_multi(spark, sf_dir):
    li, o = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "orders")
    c, n, r = (_t(spark, sf_dir, x) for x in ("customer", "nation", "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_topk_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_semi_join(spark, sf_dir):
    p, li = _t(spark, sf_dir, "part"), _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


def q_sessions(spark, sf_dir):
    """Gap-based sessionization over the events stream
    (operators/sessions.py — Spark's native session_window, one user-grain
    shuffle, unchanged under readStream): 24h-silence sessions per user
    with observed bounds, event count, value sum and a conditional
    big-event count (the conditional-sum primitive, previously
    q_conditional_agg — also live in the q_gold_* evaluation metrics).
    The twin is the OTHER classic formulation — gaps-and-islands over
    lag() — so the engines cross-check different algorithms."""
    from tabbyld_spark.operators.sessions import sessionize

    e = _t(spark, sf_dir, "events")
    s = sessionize(
        e,
        gap="24 hours",
        value_col=None,
        extra_aggs=[
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
            .cast("long")
            .alias("n_big"),
        ],
    )
    return s


def q_events_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# STI primitives over testdata (normalization, mentions, candidates, CEA)
# --------------------------------------------------------------------------

def q_normalize(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey", normalize_entry(F.col("p_name")).alias("mention_norm")
    )


def q_multivalue_split(spark, sf_dir):
    """Pack then split the reference's ' | ' multi-value convention (P4)."""
    p = _t(spark, sf_dir, "part")
    packed = p.select(
        "p_partkey",
        F.concat_ws(" | ", "p_brand", "p_type").alias("packed"),
    )
    return packed.select(
        "p_partkey", F.posexplode(F.split("packed", r" \| ")).alias("pos", "part_value")
    ).withColumn("pos", F.col("pos").cast("long"))


def q_levenshtein_score(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_name", "p_type").cast("long").alias("lev"),
        F.round(1 - F.levenshtein("p_name", "p_type") / 100, 6).alias("lev_score"),
    )


def q_mentions(spark, sf_dir):
    """P5: distinct normalized token mentions per language over documents."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", F.explode(tokens("text")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("lang", normalize_entry(F.col("tok")).alias("mention_norm"))
        .filter(F.col("mention_norm") != "")
        .distinct()
    )


def q_candidates_exact(spark, sf_dir):
    """P8-exact shape: broadcast surface-form join — mentions (document
    tokens) × label table (words of part names)."""
    d = _t(spark, sf_dir, "documents")
    p = _t(spark, sf_dir, "part")
    mentions = (
        d.filter(F.col("doc_id") < 100)
        .select(F.explode(tokens("text")).alias("mention"))
        .filter(F.col("mention") != "")
        .groupBy("mention")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    labels = (
        p.select(F.explode(F.split("p_name", " ")).alias("surface"))
        .distinct()
        .withColumn("entity", F.concat(F.lit("urn:part:"), F.col("surface")))
    )
    return mentions.join(
        F.broadcast(labels), mentions.mention == labels.surface
    ).select("mention", "entity", "n_occurrences")


def q_cea_top1(spark, sf_dir):
    """P20 shape: per-mention argmax candidate by (score desc, entity asc)."""
    d = _t(spark, sf_dir, "documents")
    p = _t(spark, sf_dir, "part")
    mentions = (
        d.filter(F.col("doc_id") < 50)
        .select(F.explode(tokens("text")).alias("mention"))
        .filter(F.length("mention") >= 3)
        .distinct()
    )
    ents = p.select(F.explode(F.split("p_name", " ")).alias("surface")).distinct()
    cands = (
        mentions.join(F.broadcast(ents), F.levenshtein("mention", "surface") <= 2)
        .withColumn("lev", F.levenshtein("mention", "surface").cast("long"))
    )
    w = Window.partitionBy("mention").orderBy(F.asc("lev"), F.asc("surface"))
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("mention", F.col("surface").alias("entity"), "lev")
    )


def q_ner_literal(spark, sf_dir):
    """P7 literal-NER regex chain over stringified numerics."""
    li = _t(spark, sf_dir, "lineitem")
    s = F.concat(F.col("l_quantity").cast("int").cast("string"))
    pct = F.concat(F.col("l_discount").cast("string"), F.lit("%"))
    money = F.concat(F.lit("$"), F.round("l_extendedprice", 2).cast("string"))
    from tabbyld_spark.functions.ner import literal_ner

    return (
        li.select(
            literal_ner(s).alias("ner_qty"),
            literal_ner(pct).alias("ner_disc"),
            literal_ner(money).alias("ner_price"),
        )
        .groupBy("ner_qty", "ner_disc", "ner_price")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# STI feature stack P10-P19 over the materialized oracle fixture
# (.sti_fixture/ — canonical tables + micro-KG + DuckDB-derived candidates;
# see tabbyld_spark/fixtures/sti_fixture.py for why this isn't circular)
# --------------------------------------------------------------------------

def _sti_t(spark: SparkSession, name: str) -> DataFrame:
    from tabbyld_spark.fixtures.sti_fixture import ensure_sti_fixture

    return spark.read.parquet(f"{ensure_sti_fixture()}/{name}.parquet")


_STI_KEY = ["table_id", "col_role", "mention", "entity"]


def q_ner_class_rank(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    out = FT.ner_class_rank(
        _sti_t(spark, "candidates"), _sti_t(spark, "kg_types"), _sti_t(spark, "kg_subclass")
    )
    return out.select(*_STI_KEY, F.round("ner_rank", 6).alias("ner_rank"))


def q_heading_rank(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    out = FT.heading_rank(_sti_t(spark, "candidates"), _sti_t(spark, "kg_types"))
    return out.select(*_STI_KEY, F.round("heading_rank", 6).alias("heading_rank"))


def q_entry_context(spark, sf_dir):
    from tabbyld_spark.operators.mentions import entry_context

    out = entry_context(_sti_t(spark, "canonical"), hashed=False)
    return out.select(
        "table_id", "mention", "ctx_value", F.col("n").cast("long").alias("n")
    )


def q_entity_context(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    out = FT.entity_context(
        _sti_t(spark, "candidates"), _sti_t(spark, "kg_triples"), hashed=False
    )
    return out.select("entity", "ctx_local", F.col("m").cast("long").alias("m"))


def q_context_similarity(spark, sf_dir):
    from tabbyld_spark.operators import features as FT
    from tabbyld_spark.operators.mentions import entry_context

    cands = _sti_t(spark, "candidates")
    trip = _sti_t(spark, "kg_triples")
    out = FT.context_similarity(
        cands, entry_context(_sti_t(spark, "canonical")), FT.entity_context(cands, trip)
    )
    return out.select(*_STI_KEY, F.round("ctx_rank", 6).alias("ctx_rank"))


def q_parent_classes(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    return FT.parent_classes(
        _sti_t(spark, "candidates"), _sti_t(spark, "kg_triples"), hashed=False
    ).select("entity", "pclass")


def q_semantic_similarity(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    cands = _sti_t(spark, "candidates")
    trip = _sti_t(spark, "kg_triples")
    out = FT.semantic_similarity(cands, FT.parent_classes(cands, trip))
    return out.select(*_STI_KEY, F.round("sem_rank", 6).alias("sem_rank"))


def q_relationship_rank(spark, sf_dir):
    from tabbyld_spark.operators import features as FT

    out = FT.relationship_rank(_sti_t(spark, "candidates"), _sti_t(spark, "kg_triples"))
    return out.select(*_STI_KEY, F.round("rel_rank", 6).alias("rel_rank"))


def _sti_scored(spark) -> DataFrame:
    from tabbyld_spark.operators import features as FT
    from tabbyld_spark.operators.aggregate import aggregate_ranks
    from tabbyld_spark.operators.mentions import entry_context

    cands = _sti_t(spark, "candidates")
    trip = _sti_t(spark, "kg_triples")
    cands = FT.ner_class_rank(cands, _sti_t(spark, "kg_types"), _sti_t(spark, "kg_subclass"))
    cands = FT.heading_rank(cands, _sti_t(spark, "kg_types"))
    cands = FT.context_similarity(
        cands, entry_context(_sti_t(spark, "canonical")), FT.entity_context(cands, trip)
    )
    cands = FT.semantic_similarity(cands, FT.parent_classes(cands, trip))
    return aggregate_ranks(cands)


def q_agg_rank(spark, sf_dir):
    return _sti_scored(spark).select(*_STI_KEY, F.round("agg_rank", 6).alias("agg_rank"))


def q_annotate_rows(spark, sf_dir):
    """P21: annotated-row materialization (URI substitution + multi-value
    repack) over the exact-path CEA — DuckDB twin included."""
    from tabbyld_spark.operators.triples import annotate_rows
    from tabbyld_spark.plans.pipeline import annotate_canonical

    kg = {
        name: _sti_t(spark, name)
        for name in ("kg_labels", "kg_types", "kg_subclass", "kg_triples")
    }
    canonical = _sti_t(spark, "canonical")
    res = annotate_canonical(canonical, kg, provided_ner=True, fuzzy_enabled=False)
    out = annotate_rows(canonical, res.cea)
    return out.select(
        "table_id",
        F.col("row_idx").cast("long").alias("row_idx"),
        F.col("col_idx").cast("long").alias("col_idx"),
        "data",
        "row_heading",
        "column_heading",
    )


def q_gold_cta(spark, sf_dir):
    """CTA gold ingest (sources/gold.py): SemTab-style positional CSV →
    heading-grain gold frame, resolved through the canonical heading map.
    DuckDB twin reads the same CSV + canonical parquet."""
    from tabbyld_spark.fixtures.gold_fixture import ensure_gold_fixture
    from tabbyld_spark.sources.gold import read_gold_cta

    gd = ensure_gold_fixture()
    return read_gold_cta(
        spark, f"{gd}/cta_gt.csv", _sti_t(spark, "canonical")
    ).select("table_id", F.col("column").alias("col_heading"), "class")


def q_gold_cpa(spark, sf_dir):
    """CPA gold ingest: position 0 resolves to the RowHeading subject role,
    object positions through the heading map."""
    from tabbyld_spark.fixtures.gold_fixture import ensure_gold_fixture
    from tabbyld_spark.sources.gold import read_gold_cpa

    gd = ensure_gold_fixture()
    return read_gold_cpa(
        spark, f"{gd}/cpa_gt.csv", _sti_t(spark, "canonical")
    ).select("table_id", "col_a", "col_b", "pred")


def q_dataprep(spark, sf_dir):
    """Composed training-data prep chain (plans/dataprep.py): exact dedup →
    SimHash-bucket near-dup collapse → language filter → quality gate →
    per-source curation rollup (each surviving doc annotated with its
    source's corpus size, survivor count and keep rate — the per-domain
    report a crawl-curation job publishes).  The DuckDB twin composes the
    same per-operator SQL fragments, so the two-engine check covers the
    composition including the rollup grain change."""
    from tabbyld_spark.plans.dataprep import curation_report, prep_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    surv = prep_corpus(docs.select("doc_id", "text"))
    return curation_report(docs, surv)


# --------------------------------------------------------------------------
# training-data ops (documents / embeddings)
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents")).withColumn(
        "group_size", F.col("group_size").cast("long")
    )


def q_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return simhash(d).withColumn("simhash", F.col("simhash").cast("long"))


def q_langid(spark, sf_dir):
    """All three language/LM doc-grain surfaces in one entry (registry slot
    consolidation, ≤50 driver rows): stopword-hit langid (former q_langid),
    the char-trigram-profile langid (former q_langid_ngram), and the
    CCNet-style unigram-LM negative log-likelihood (operators/lm.py) under
    a model trained on the deterministic doc_id%10==0 slice — training
    (count→smooth) AND scoring (probe+aggregate) both re-derived by the
    DuckDB twin.  lm_nll is floored at 1e-6 grain because the two engines
    sum the per-token logs in different orders."""
    from tabbyld_spark.operators.lm import lm_score, train_unigram_lm

    d = _t(spark, sf_dir, "documents")
    sw = language_id(d).select(
        "doc_id", "pred_lang", F.col("stop_hits").cast("long").alias("stop_hits")
    )
    tri = ngram_language_id(d).select(
        "doc_id", "pred_lang_ngram", F.col("tri_hits").cast("long").alias("tri_hits")
    )
    lm, oov = train_unigram_lm(d.filter(F.col("doc_id") % 10 == 0), alpha=0.5)
    lms = lm_score(d, lm, oov).select(
        "doc_id",
        F.floor(F.col("lm_nll") * 1000000).cast("long").alias("lm_nll6"),
        "n_oov",
        "n_scored",
    )
    return sw.join(tri, "doc_id").join(lms, "doc_id")


def q_doc_profile(spark, sf_dir):
    """Doc-grain training-data profile, six operators in one oracled
    surface (registry slot consolidation): quality_stats ratios + both
    tokenizer counts (former q_quality), Gopher-style repetition signals
    (Rae et al. 2021 A1.1: top word-2-gram character coverage + duplicate
    word-3-gram fraction), the deterministic md5-bucket train/val split,
    the PII scrub (per-class replacement counts + md5 of the scrubbed
    text), and the ExactSubstr duplicate-span rollup (Lee et al. 2021 at
    k=4 token windows: corpus-duplicate window count, merged-span count,
    covered tokens — the twin recomputes the spans with an independent
    gaps-and-islands window-SQL formulation), and the deterministic
    mixture-sampling decisions (per-source rates 0.25/2.5/0.0/default-1.0,
    hash-Bernoulli keeps + upsample copy counts — operators/sampling.py;
    mix_u is floored to 6 digits because round() tie rules can differ
    between engines), and the DSIR importance weights + deterministic
    Gumbel resampling keys (Xie et al. 2023; operators/importance.py —
    target = the doc_id%7 slice, raw = the whole corpus, 512 hashed
    unigram+bigram buckets; the twin re-derives fit AND score).  The
    fixture docs are
    synthetic word salad with no natural PII, so the PII leg plants
    deterministic doc_id-derived PII (email always; phone iff doc_id%3==0;
    IPv4 iff doc_id%5==0) identically in both engines, exercising hit and
    zero paths of every pattern class."""
    from tabbyld_spark.operators.privacy import pii_profile

    d = _t(spark, sf_dir, "documents")
    q = quality_stats(d).select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_re_tokens").cast("long").alias("n_re_tokens"),
        F.round("chars_per_token", 6).alias("chars_per_token"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
    )
    planted = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 32),
            F.lit(" reach me at user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" or +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    pii = pii_profile(planted).select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        F.md5(F.col("scrubbed").cast("binary")).alias("pii_scrub_md5"),
    )
    from tabbyld_spark.operators.sampling import sample_decisions

    mix = sample_decisions(
        d.select("doc_id", "source"),
        {"src0": 0.25, "src1": 2.5, "src2": 0.0},
        key_col="source", default_rate=1.0, seed="mix",
    ).select(
        "doc_id",
        F.col("rate").alias("mix_rate"),
        F.floor(F.col("u") * 1000000).cast("long").alias("mix_u"),
        F.col("n_copies").alias("mix_copies"),
    )
    from tabbyld_spark.operators.importance import (
        fit_importance_model,
        importance_weights,
    )

    # DSIR importance weights (Xie et al. 2023): target = the doc_id%7
    # slice, raw = the whole corpus; 512 hashed unigram+bigram buckets.
    # Weights and Gumbel resampling keys rounded to 6 digits (float-sum
    # order differs between engines).
    model = fit_importance_model(
        d.filter(F.col("doc_id") % 7 == 0), d, n_buckets=512
    )
    dsir = importance_weights(d, model).select(
        "doc_id",
        F.col("n_features").alias("dsir_nfeat"),
        F.round("log_weight", 6).alias("dsir_logw"),
        F.round("sample_key", 6).alias("dsir_key"),
    )
    return (
        q.join(gopher_repetition(d), "doc_id")
        .join(train_split(d), "doc_id")
        .join(pii, "doc_id")
        .join(duplicate_span_profile(d, k=4), "doc_id")
        .join(mix, "doc_id")
        .join(dsir, "doc_id")
    )


def q_decontam(spark, sf_dir):
    """Benchmark decontamination by word 4-gram overlap: every 20th doc
    plays the held-out eval set; every other doc is flagged if any of its
    distinct 4-grams appears in that set (GPT-3-style n-gram scrub; n=4
    rather than 13 because the synthetic fixture docs are short — at sf0.01
    it marks ~10% of the corpus, exercising both the hit and zero-fill
    paths)."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 20 == 0)
    return decontaminate(d, bench, n=4)


def q_winnow(spark, sf_dir):
    """Winnowing fingerprints (rolling-hash window minima, k=5 w=4) — the
    guarantee-carrying document fingerprint (any shared substring of length
    ≥ k+w−1 shares a fingerprint).  doc_id < 120 bounds the DuckDB twin's
    lateral expansion."""
    from tabbyld_spark.operators.textstats import winnow_fingerprints

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return winnow_fingerprints(d)


def q_winnow_pairs(spark, sf_dir):
    """Cross-document overlap candidates from shared winnowing fingerprints
    (MOSS shape): inverted-index join on fp with a max_df boilerplate guard,
    shared-count >= 2, containment-style overlap score.  Same doc_id < 120
    bound as q_winnow to keep the DuckDB twin's lateral expansion cheap."""
    from tabbyld_spark.operators.textstats import winnow_overlap_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return winnow_overlap_pairs(d)


def q_text_ranking(spark, sf_dir):
    """Both text-ranking surfaces in one doc-grain entry (registry slot
    consolidation, ≤50 driver rows): per-doc top-3 smoothed tf-idf terms
    (doc_id < 300, deterministic tiebreak — former q_tfidf_top_terms)
    full-outer-joined with the BM25 top-20 docs for a fixed 3-term query
    over the whole corpus (former q_bm25).  The full outer join preserves
    every exact value of BOTH operators: tfidf-only docs carry NULL
    score/rank, bm25-only docs (id ≥ 300 or no top-3 row) carry NULL
    term/tf/df/tfidf/rk."""
    from tabbyld_spark.operators.ranking import bm25_topk, tf_idf

    d = _t(spark, sf_dir, "documents")
    scored = tf_idf(d.filter(F.col("doc_id") < 300), max_df_ratio=0.9)
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    top3 = (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id", "term", F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("tfidf", 6).alias("tfidf"), "rk",
        )
    )
    bm = bm25_topk(d, ["hash", "join", "vector"], k=20).select(
        "doc_id", F.round("score", 6).alias("score"), "rank"
    )
    return top3.join(bm, "doc_id", "full_outer")


def q_webprep(spark, sf_dir):
    """The composed webtext corpus-prep path (plans/webcorpus.py
    W0+W1+W3+W5), value-oracled end-to-end: URL canonicalization + alias
    dedup → registrable-suffix URL blocklist filter → C4-style global line
    dedup → overlapping-token-window chunking → contiguous-fill sequence
    packing.  The crawl shape (url + multi-line body) is synthesized
    deterministically from the documents table in BOTH engines — and the
    raw url is deliberately MESSY (uppercase scheme+host, explicit :443,
    tracking-only query, fragment), with every 4th doc also emitted under a
    second clean spelling: W0 must collapse both to the same canonical
    https://d{doc_id%37}.{source}.example.com/p/{doc_id} (one survivor per
    doc — a failure would double those docs' lines and shift every
    downstream hash).  The twin canonicalizes with an independent regex +
    list_filter/list_sort formulation.  The body gets a newline after every
    8th token (one global regex pass, identical under Java regex and RE2 —
    non-overlapping left-to-right).  The blocklist blocks one registrable
    suffix (src3.example.com — drops every subdomain of it) and one exact
    host, exercising both grains of the suffix-chain semantics.  W2 (html →
    byte-identical text) is the one non-SQL stage; it is pytest-gated
    against fixtures (test_extract.py)."""
    from tabbyld_spark.operators.chunking import chunk_documents, pack_sequences
    from tabbyld_spark.operators.dedup import line_dedup
    from tabbyld_spark.operators.urls import latest_capture, url_dedup
    from tabbyld_spark.operators.webfilter import url_filter

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clean_url = F.concat(
        F.lit("https://d"), (F.col("doc_id") % 37).cast("string"),
        F.lit("."), F.col("source"), F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )
    messy_url = F.concat(
        F.upper(
            F.concat(
                F.lit("https://d"), (F.col("doc_id") % 37).cast("string"),
                F.lit("."), F.col("source"), F.lit(".example.com"),
            )
        ),
        F.lit(":443/p/"), F.col("doc_id").cast("string"),
        F.lit("?utm_source=crawl&fbclid=f"), F.col("doc_id").cast("string"),
        F.lit("#s"), (F.col("doc_id") % 5).cast("string"),
    )
    norm = F.regexp_replace(F.trim("text"), r"\s+", " ")
    body = F.regexp_replace(norm, r"((?:\S+ ){7}\S+) ", "$1\n")
    fresh_ts = F.lit("2024-01-02 00:00:00").cast("timestamp")
    stale_ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    pages = (
        d.select(messy_url.alias("url"), body.alias("text"),
                 fresh_ts.alias("warc_ts"))
        .unionByName(
            d.filter(F.col("doc_id") % 4 == 0).select(
                clean_url.alias("url"), body.alias("text"),
                fresh_ts.alias("warc_ts"),
            )
        )
        # every 3rd doc also has a STALE capture of the messy spelling with
        # entirely different line content (uppercased body): W0a must drop
        # it wholesale or every downstream line hash shifts
        .unionByName(
            d.filter(F.col("doc_id") % 3 == 0).select(
                messy_url.alias("url"), F.upper(body).alias("text"),
                stale_ts.alias("warc_ts"),
            )
        )
    )
    pages = latest_capture(pages, tiebreak_col="text").drop(
        "n_captures", "warc_ts"
    )
    from tabbyld_spark.functions.lineage import cut

    # url_filter and line_dedup each consume their input twice (explode/
    # winner agg + join-back); cutting after each aggregation stage keeps
    # the W0a/W0 aggregations from re-running 4x through the chain
    pages = cut(url_dedup(pages).drop("source_url", "n_aliases"))
    bl = spark.createDataFrame(
        [("src3.example.com",), ("d7.src0.example.com",)], "domain string"
    )
    kept = cut(url_filter(pages, bl).select(F.col("url").alias("doc_id"), "text"))
    deduped = line_dedup(kept).select("doc_id", "text")
    chunks = chunk_documents(deduped, max_tokens=16, overlap=4)
    keyed = chunks.withColumn(
        "seq_key", F.concat_ws("#", F.col("doc_id"), F.col("chunk_id"))
    )
    packed = pack_sequences(
        keyed, seq_len=64, n_buckets=8, id_col="seq_key",
        tokens_col="n_chunk_tokens",
    )
    return packed.select(
        "seq_key", "doc_id", F.col("chunk_id").cast("long").alias("chunk_id"),
        "chunk_text", "n_chunk_tokens", "bucket", "cum_tokens", "pack_id",
    )


def q_media_meta(spark, sf_dir):
    """Multimodal: synthesize binary media payloads from documents, then
    decode typed metadata back out via the Arrow mapInPandas codec stub.
    Every decoded field is a pure function of doc_id → SQL oracle below."""
    from tabbyld_spark.operators.multimodal import decode_meta, media_from_documents

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    meta = decode_meta(media_from_documents(d))
    return meta.select(
        "media_id",
        "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        "n_bytes",
    )


def q_media_features(spark, sf_dir):
    """Multimodal feature extraction: decode the fake image payloads and emit
    width/height/mean pixel/16-bin histogram.  The pixel body is
    sha256(ASCII decimal media_id) repeated — reproducible in SQL, so the whole
    decode→feature path gets a DuckDB twin (histogram flattened to a CSV
    string for engine-neutral comparison)."""
    from tabbyld_spark.operators.multimodal import image_features, media_from_documents

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    feats = image_features(media_from_documents(d))
    return feats.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.round("mean_px", 6).alias("mean_px"),
        F.concat_ws(",", F.transform("histogram", lambda x: x.cast("string"))).alias("hist"),
    )


def q_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    out = brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


# --------------------------------------------------------------------------
# iterative graph ops (oracle via recursive CTE)
# --------------------------------------------------------------------------

def q_closure(spark, sf_dir):
    """Transitive closure over a binary-tree edge set derived from part keys
    (child k → parent k/2): exercises the min-plus doubling loop."""
    from tabbyld_spark.operators.closure import subclass_closure

    p = _t(spark, sf_dir, "part")
    edges = (
        p.filter((F.col("p_partkey") > 0) & (F.col("p_partkey") < 64))
        .select(
            F.col("p_partkey").cast("string").alias("child"),
            (F.col("p_partkey") / 2).cast("int").cast("string").alias("parent"),
        )
        .distinct()
    )
    out = subclass_closure(edges)
    return out.select(
        F.col("child").cast("long").alias("child"),
        F.col("parent").cast("long").alias("parent"),
        F.col("depth").cast("long").alias("depth"),
    )


def q_connected_components(spark, sf_dir):
    """The full crawl-graph path, consolidated at node grain: synthesized
    crawl pages (url + html:binary with double-/single-quoted, fragment,
    and relative anchors) → href extraction (extract/links.py, codegen
    regexp over the lenient binary→string cast) → distinct host-grain
    edges → hash-min connected components (undirected) + 5-iteration
    damped PageRank.  Pages whose doc_id % 10 == 0 also link to sink hosts
    no page lives on — dangling nodes, exercising PageRank's dangling-mass
    redistribution.  Each node row also carries its directed in/out degree
    (operators/kgstats.py:degree_stats — the hub/skew profile a KG build
    publishes) and its most frequent inbound anchor text with count
    (extract/links.py:extract_anchors + top_anchor_per_host — the web's
    surface form for the host, the classic candidate-dictionary signal;
    lexicographic tiebreak so both engines agree).  The DuckDB twin
    re-synthesizes the identical HTML
    string, re-extracts hrefs with its own regexp_extract_all, and pairs a
    recursive reachability CTE with the power method unrolled as 5 chained
    CTEs — two independent formulations of extraction AND both algorithms."""
    from tabbyld_spark.extract.links import extract_outlinks, host_edges
    from tabbyld_spark.operators.components import connected_components
    from tabbyld_spark.operators.graphrank import pagerank
    from tabbyld_spark.operators.kgstats import degree_stats

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    h = (F.col("doc_id") % 23).cast("string")
    a = ((F.col("doc_id") * 7 + 3) % 23).cast("string")
    b = ((F.col("doc_id") * 11 + 5) % 23).cast("string")
    sink = (F.col("doc_id") % 3).cast("string")
    html = F.concat(
        F.lit('<html><body><p>t</p><a href="#f">x</a><a href="/rel">r</a>'),
        F.lit('<a href="https://h'), a, F.lit('.example.com/p/1">d</a>'),
        F.lit("<a href='https://h"), b, F.lit(".example.com/q'>s</a>"),
        F.coalesce(
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit('<a href="https://sink'), sink, F.lit('.example.com/">k</a>')
                ),
            ),
            F.lit(""),
        ),
        F.lit("</body></html>"),
    )
    pages = d.select(
        F.concat(
            F.lit("https://h"), h, F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        html.cast("binary").alias("html"),
    )
    from tabbyld_spark.extract.links import extract_anchors, top_anchor_per_host
    from tabbyld_spark.functions.lineage import cut

    # four consumers (CC, PageRank iterations, degrees, and the node join)
    # read the edge set — one lineage cut stops each from re-running the
    # regexp extraction chain
    edges = cut(host_edges(extract_outlinks(pages)))
    cc = connected_components(edges).select("node", "component")
    pr = pagerank(edges, damping=0.85, iterations=5, round_to=6)
    deg = degree_stats(edges)
    anch = top_anchor_per_host(extract_anchors(pages))
    return (
        cc.join(pr, "node").join(deg, "node").join(anch, "node", "left")
        .select(
            "node", "component", F.col("rank").alias("pagerank"),
            "out_deg", "in_deg",
            F.coalesce("top_anchor", F.lit("")).alias("top_anchor"),
            F.coalesce("n_anchor", F.lit(0)).cast("long").alias("n_anchor"),
        )
    )


# --------------------------------------------------------------------------
# non-SQL-expressible (rows-only checks): ML-LSH ops + full STI pipeline
# --------------------------------------------------------------------------

def q_media_frames(spark, sf_dir):
    """Multimodal one-to-many: video payloads → one row per sampled frame
    (binary frame column — rows-only check)."""
    from tabbyld_spark.operators.multimodal import media_from_documents, sample_frames

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    frames = sample_frames(media_from_documents(d), every=2)
    return frames.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.length("frame").cast("long").alias("frame_bytes"),
    )


def _kg_triples(spark, sf_dir):
    """A deterministic KG derived from the TPC-H-ish tables — the triple
    universe for the KG read-path queries (q_kg_pattern / q_kg_validate).
    Predicates are distinct per source relation so patterns select cleanly;
    the nation subject rows are deliberately RESTRICTED to n_nationkey < 20
    and ``supplied_by`` is deliberately multi-valued, seeding the dangling-
    reference and functional-violation populations q_kg_validate asserts."""
    c = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("c:"), "c_custkey").alias("subj"),
        F.lit("cust_nation").alias("pred"),
        F.concat(F.lit("n:"), "c_nationkey").alias("obj"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), "s_suppkey").alias("subj"),
        F.lit("supp_nation").alias("pred"),
        F.concat(F.lit("n:"), "s_nationkey").alias("obj"),
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 20)
    nr = n.select(
        F.concat(F.lit("n:"), "n_nationkey").alias("subj"),
        F.lit("in_region").alias("pred"),
        F.concat(F.lit("r:"), "n_regionkey").alias("obj"),
    )
    big = n.filter(F.col("n_nationkey") >= 10).select(
        F.concat(F.lit("n:"), "n_nationkey").alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("Big").alias("obj"),
    )
    small = n.filter(F.col("n_nationkey") < 15).select(
        F.concat(F.lit("n:"), "n_nationkey").alias("subj"),
        F.lit("rdf:type").alias("pred"),
        F.lit("Small").alias("obj"),
    )
    ps = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.concat(F.lit("p:"), "l_partkey").alias("subj"),
            F.lit("supplied_by").alias("pred"),
            F.concat(F.lit("s:"), "l_suppkey").alias("obj"),
        )
        .distinct()
    )
    out = c
    for part in (s, nr, big, small, ps):
        out = out.unionByName(part)
    return out


def q_rdfs_entail(spark, sf_dir):
    """RDFS entailment materialization (operators/entailment.py — the ρdf
    forward-chaining pass a KG build runs before publishing; the reference
    defers the same inference to DBpedia's endpoint at query time,
    commands/SpreadsheetController.php:242-246): customer/supplier/nation
    triples + a literal ontology with a depth-2 subPropertyOf chain
    (cust_nation ⊑ located_in ⊑ related_to), domain/range declarations,
    and a subClassOf hierarchy (Customer/Supplier ⊑ Agent ⊑ Thing,
    Nation/Region ⊑ Place ⊑ Thing).  Output = DERIVED triples only.  The
    twin re-derives every rule with recursive CTEs over the same VALUES
    ontology."""
    from tabbyld_spark.operators.entailment import rdfs_entailment

    c = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("c:"), "c_custkey").alias("subj"),
        F.lit("cust_nation").alias("pred"),
        F.concat(F.lit("n:"), "c_nationkey").alias("obj"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), "s_suppkey").alias("subj"),
        F.lit("supp_nation").alias("pred"),
        F.concat(F.lit("n:"), "s_nationkey").alias("obj"),
    )
    nr = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("n:"), "n_nationkey").alias("subj"),
        F.lit("in_region").alias("pred"),
        F.concat(F.lit("r:"), "n_regionkey").alias("obj"),
    )
    triples = c.unionByName(s).unionByName(nr)
    mk = lambda rows, schema: spark.createDataFrame(rows, schema)
    return rdfs_entailment(
        triples,
        subclass=mk(
            [
                ("Customer", "Agent"),
                ("Supplier", "Agent"),
                ("Agent", "Thing"),
                ("Nation", "Place"),
                ("Region", "Place"),
                ("Place", "Thing"),
            ],
            "child string, parent string",
        ),
        subproperty=mk(
            [
                ("cust_nation", "located_in"),
                ("supp_nation", "located_in"),
                ("located_in", "related_to"),
            ],
            "child string, parent string",
        ),
        domain=mk(
            [
                ("cust_nation", "Customer"),
                ("supp_nation", "Supplier"),
                ("in_region", "Nation"),
            ],
            "pred string, cls string",
        ),
        range_=mk(
            [("located_in", "Nation"), ("in_region", "Region")],
            "pred string, cls string",
        ),
        entity_prefixes=("c:", "s:", "n:", "r:"),
    )


def q_entity_res(spark, sf_dir):
    """Blocked entity resolution (operators/entityres.py) — the same_as
    source the S7 canonicalization merge needs for entities nobody linked
    together: part records profiled as (entity, name block, 4 attribute
    hashes), blocks capped at 1000, attribute-set Jaccard >= 0.5 via the
    inverted-index (block, attr) self-join (never all-pairs).  The twin is
    an INDEPENDENT formulation: plain block self-join + per-attribute
    equality sum (i of 4 shared, |union| = 8 - i)."""
    from tabbyld_spark.operators.entityres import blocked_same_as

    p = _t(spark, sf_dir, "part")
    profiles = p.select(
        F.concat(F.lit("p:"), "p_partkey").alias("entity"),
        F.lower(F.regexp_replace(F.trim("p_name"), r"\s+", " ")).alias("block"),
        F.array(
            F.concat(F.lit("br:"), "p_brand"),
            F.concat(F.lit("ty:"), "p_type"),
            F.concat(F.lit("sz:"), F.floor(F.col("p_size") / 10).cast("string")),
            F.concat(
                F.lit("pr:"),
                F.floor(F.col("p_retailprice") / 500).cast("long").cast("string"),
            ),
        ).alias("attrs"),
    )
    # blocked_same_as consumes attribute strings as-is (md5 hashing is
    # er_profiles' concern), so the twin compares the same raw strings
    return blocked_same_as(profiles, threshold=0.5, max_block=1000).select(
        "src", "dst", F.round("jaccard", 6).alias("jaccard")
    )


def q_kg_pattern(spark, sf_dir):
    """SPARQL-style basic graph pattern over the emitted-triples shape
    (operators/kgquery.py:bgp_match — the read path of the KG the pipeline
    constructs; the reference issues the same conjunctive patterns against
    DBpedia in components/CandidateEntityRecognizer.php): customers and
    suppliers co-located in a nation of region r:1.  Three triple patterns,
    two shared-variable equi-joins, constants pushed to the scans; join
    order is most-constrained-first (the in_region pattern with 2 constants
    anchors the plan).  Twin: the same pattern as three-way SQL self-join."""
    from tabbyld_spark.operators.kgquery import bgp_match

    t = _kg_triples(spark, sf_dir)
    out = bgp_match(
        t,
        [
            ("?c", "cust_nation", "?n"),
            ("?s", "supp_nation", "?n"),
            ("?n", "in_region", "r:1"),
        ],
    )
    return out.select("c", "n", "s")


def q_kg_validate(spark, sf_dir):
    """KG snapshot integrity gate (operators/kgquery.py:kg_integrity_profile):
    functional-predicate violations (parts with >1 distinct supplier on the
    declared-functional supplied_by), dangling entity references (n:-prefixed
    objects with no subject row — nations >= 20, referenced by customers but
    deliberately absent from the nation subject set), and disjoint-class
    conflicts (nations typed both Big and Small, the 10..14 overlap).  Each
    check is one aggregate / anti-join / broadcast-pair self-join; the twin
    re-derives all three straight from the base tables."""
    from tabbyld_spark.operators.kgquery import kg_integrity_profile

    t = _kg_triples(spark, sf_dir)
    return kg_integrity_profile(
        t,
        functional_preds=["supplied_by"],
        entity_prefix="n:",
        disjoint_pairs=[("Big", "Small")],
    )


def q_minhash_pairs(spark, sf_dir):
    """MinHash-LSH recall contract (driver-checkable invariant for an
    inherently approximate surface): every exact word-3-gram-Jaccard pair at
    >= 0.18 must be recovered by the MinHash band-bucket join at distance
    <= 0.85 (sim >= 0.15, i.e. with margin below the exact threshold).  The
    exact denominator is the ngram_jaccard_pairs operator (SQL-twinned —
    its exact jaccard values are asserted by this same contract row); the
    ``found`` flag is computed against the live MinHash result, so a banding/
    seed/recall regression flips it to false and the driver's value-hash
    compare catches it.  The raw approximate pair set stays pytest-gated
    (tests/test_dedup.py)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    exact = ngram_jaccard_pairs(d, threshold=0.18)
    mh = (
        minhash_dedup_pairs(d, threshold=0.85)
        .select("id_a", "id_b")
        .withColumn("_f", F.lit(True))
    )
    return exact.join(mh, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.round("jaccard", 6).alias("jaccard"),
        F.coalesce("_f", F.lit(False)).alias("found"),
    )


# Recall floors for the ANN invariant queries: the deterministic (seeded)
# LSH/IVF configurations exceed these on the sf0.01 driver fixture with
# margin; the floors are the driver-enforced contract, the exact per-query
# recall is additionally pytest-gated.
_LSH_RECALL_FLOOR = 0.6
_IVF_RECALL_FLOOR = 0.6


def _ann_recall_contract(exact: DataFrame, approx: DataFrame, floor: float) -> DataFrame:
    """(query_id, n_exact, recall_ok): n_exact from the brute-force top-k
    (SQL-twinned); recall_ok = |approx ∩ exact| / n_exact >= floor, computed
    against the live approximate result — the driver-checkable invariant."""
    hits = approx.select("query_id", "neighbor_id").withColumn("_f", F.lit(1))
    return (
        exact.select("query_id", "neighbor_id")
        .join(hits, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("_f", F.lit(0))).alias("_hit"),
        )
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            (F.col("_hit") >= F.lit(floor) * F.col("n_exact")).alias("recall_ok"),
        )
    )


def q_ann_recall(spark, sf_dir):
    """ANN recall contracts for BOTH approximate indexes in one surface
    (method ∈ {ivf, lsh}): per query, the brute-force top-5 (oracled in
    q_cosine_topk) is the denominator and recall_ok asserts the deterministic
    shortlist recovers >= 60% of it.  A plane/seed/banding/centroid
    regression flips recall_ok → driver hash mismatch.

    LSH runs recall-oriented banding (8 bands x 2 bits: P(candidate) =
    1-(1-p^2)^8, >= 97% for the cosine range of true top-5 neighbours here;
    measured min per-query recall 0.8 at sf0.01 — bench.py times the
    throughput-oriented 3x4 banding).  IVF probes 6 of 8 k-means cells
    (measured min per-query recall 0.8 at sf0.001 and sf0.01); ivf with
    n_probe == n_centroids is additionally pinned to the brute-force oracle
    in tests/test_similarity.py."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(e, q, k=5)
    lsh = _ann_recall_contract(
        exact, lsh_topk(e, q, k=5, n_planes=16, n_bands=8, dim=64), _LSH_RECALL_FLOOR
    ).select(F.lit("lsh").alias("method"), "query_id", "n_exact", "recall_ok")
    ivf = _ann_recall_contract(
        exact, ivf_topk(e, q, k=5, n_centroids=8, n_probe=6), _IVF_RECALL_FLOOR
    ).select(F.lit("ivf").alias("method"), "query_id", "n_exact", "recall_ok")
    return ivf.unionByName(lsh)


def _sti_both_paths(spark):
    """Exact-path and fuzzy-path annotation results on the STI fixture
    (provided NER, identical canonical input — the only delta is the LSH
    fuzzy candidate branch)."""
    from tabbyld_spark.plans.pipeline import annotate_canonical

    kg = {
        name: _sti_t(spark, name)
        for name in ("kg_labels", "kg_types", "kg_subclass", "kg_triples")
    }
    canonical = _sti_t(spark, "canonical")
    exact = annotate_canonical(canonical, kg, provided_ner=True, fuzzy_enabled=False)
    fuzzy = annotate_canonical(canonical, kg, provided_ner=True, fuzzy_enabled=True)
    return exact, fuzzy


def q_sti_cea(spark, sf_dir):
    """Exact-path CEA (full winner rows, SQL-twinned end-to-end through
    mentions → candidates → five features → aggregate → top-1) PLUS the
    fuzzy-candidate superset contract (VERDICT r2 task 4): the fuzzy LSH
    branch only ADDS candidates, so every cell annotated on the exact path
    must still be annotated with fuzzy on — ``covered`` is computed live
    against the fuzzy run.  Winner identity/rank is NOT asserted under fuzzy
    (adding candidates legitimately changes the P16 vote pool); the raw
    fuzzy output's P/R >= 0.95 gate lives in tests/test_e2e.py."""
    exact, fuzzy = _sti_both_paths(spark)
    key = ["table_id", "col_role", "mention"]
    fz = fuzzy.cea.select(*key).distinct().withColumn("_f", F.lit(True))
    return (
        exact.cea.join(fz, key, "left")
        .select(
            *key,
            "entity",
            F.round("agg_rank", 6).alias("agg_rank"),
            F.coalesce("_f", F.lit(False)).alias("covered"),
        )
    )


def q_sti_triples(spark, sf_dir):
    """Exact-path triple emission (full (subj, pred, obj) set, SQL-twinned
    end-to-end) PLUS the fuzzy-path coverage contract: every subject the
    exact path emits triples for must also receive triples with fuzzy
    candidates on (cells keep >= 1 candidate when candidates are added; the
    specific object may legitimately change with the P16 vote pool), so
    ``covered`` is computed live against the fuzzy run.  Each triple also
    carries its predicate's corpus frequency and its subject's out-degree
    (operators/kgstats.py:annotate_triple_stats — the confidence/pruning
    signals a KG build publishes with its triples)."""
    from tabbyld_spark.operators.kgstats import annotate_triple_stats

    exact, fuzzy = _sti_both_paths(spark)
    fz = fuzzy.triples.select("subj").distinct().withColumn("_f", F.lit(True))
    tr = annotate_triple_stats(exact.triples)
    return tr.join(fz, "subj", "left").select(
        "subj", "pred", "obj", F.coalesce("_f", F.lit(False)).alias("covered"),
        "n_pred", "n_subj_triples",
    )


def q_owl(spark, sf_dir):
    """P25 OWL ontology emission (operators/export.py:owl_triples ←
    /root/reference/components/OWLCodeGenerator.php:84-232) as (subj, pred,
    obj) axiom rows over the exact-path CEA/CTA/CPA: CTA classes +
    rdfs:subClassOf parents, CPA object properties + rdfs:range, per-column
    owl:DatatypeProperty with xsd sniffing from the winning literal
    instance, CEA named individuals.  SQL-twinned end-to-end through the
    same mention→candidate→feature→vote chain (fixtures/sti_sql.py
    _owl_ctes)."""
    from tabbyld_spark.operators.export import owl_triples
    from tabbyld_spark.plans.pipeline import annotate_canonical

    kg = {
        name: _sti_t(spark, name)
        for name in ("kg_labels", "kg_types", "kg_subclass", "kg_triples")
    }
    canonical = _sti_t(spark, "canonical")
    res = annotate_canonical(canonical, kg, provided_ner=True, fuzzy_enabled=False)
    return owl_triples(res.cea, res.cta, res.cpa, kg["kg_subclass"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_agg_groupby": q_agg_groupby,
        "q_join_multi": q_join_multi,
        "q_topk_window": q_topk_window,
        "q_semi_join": q_semi_join,
        "q_sessions": q_sessions,
        "q_events_daily": q_events_daily,
        "q_normalize": q_normalize,
        "q_multivalue_split": q_multivalue_split,
        "q_levenshtein_score": q_levenshtein_score,
        "q_mentions": q_mentions,
        "q_candidates_exact": q_candidates_exact,
        "q_cea_top1": q_cea_top1,
        "q_ner_literal": q_ner_literal,
        "q_ner_class_rank": q_ner_class_rank,
        "q_heading_rank": q_heading_rank,
        "q_entry_context": q_entry_context,
        "q_entity_context": q_entity_context,
        "q_context_similarity": q_context_similarity,
        "q_parent_classes": q_parent_classes,
        "q_semantic_similarity": q_semantic_similarity,
        "q_relationship_rank": q_relationship_rank,
        "q_agg_rank": q_agg_rank,
        "q_annotate_rows": q_annotate_rows,
        "q_gold_cta": q_gold_cta,
        "q_gold_cpa": q_gold_cpa,
        "q_dataprep": q_dataprep,
        "q_dedup_exact": q_dedup_exact,
        "q_simhash": q_simhash,
        "q_doc_profile": q_doc_profile,
        "q_langid": q_langid,
        "q_decontam": q_decontam,
        "q_winnow": q_winnow,
        "q_winnow_pairs": q_winnow_pairs,
        "q_text_ranking": q_text_ranking,
        "q_webprep": q_webprep,
        "q_media_meta": q_media_meta,
        "q_media_frames": q_media_frames,
        "q_media_features": q_media_features,
        "q_cosine_topk": q_cosine_topk,
        "q_closure": q_closure,
        "q_connected_components": q_connected_components,
        "q_rdfs_entail": q_rdfs_entail,
        "q_entity_res": q_entity_res,
        "q_kg_pattern": q_kg_pattern,
        "q_kg_validate": q_kg_validate,
        "q_minhash_pairs": q_minhash_pairs,
        "q_ann_recall": q_ann_recall,
        "q_sti_cea": q_sti_cea,
        "q_sti_triples": q_sti_triples,
        "q_owl": q_owl,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_TOKENS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


def _pagerank_ctes(iters: int = 5) -> str:
    """Unrolled damped power method over the CTE ``base(src, dst)`` —
    the DuckDB twin of operators/graphrank.py:pagerank (Page et al. 1999,
    dangling mass redistributed uniformly each step).  Every float literal
    is CAST to DOUBLE so both engines compute the identical IEEE value
    (DuckDB's bare 1.0 - 0.85 is exact DECIMAL arithmetic, Spark's is
    binary double); rank is rounded to 6 dp at the very end only."""
    d = "CAST(0.85 AS DOUBLE)"
    parts = [
        """nodes AS (
                -- no top-level UNION: inside WITH RECURSIVE, DuckDB 1.0
                -- gives any UNION-bodied CTE recursive treatment and the
                -- set dedup is lost (verified: 2x rows) — UNION ALL +
                -- explicit DISTINCT sidesteps it
                SELECT DISTINCT node FROM (
                    SELECT src AS node FROM base UNION ALL SELECT dst FROM base
                )
            ),
            nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
            outdeg AS (
                SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM base GROUP BY src
            ),
            pr0 AS (
                SELECT node, CAST(1.0 AS DOUBLE)/(SELECT n FROM nn) AS pr FROM nodes
            )"""
    ]
    for i in range(iters):
        parts.append(
            f"""dg{i} AS (
                SELECT coalesce(sum(pr), CAST(0 AS DOUBLE)) AS dang FROM pr{i}
                WHERE node NOT IN (SELECT src FROM outdeg)
            ),
            pr{i + 1} AS (
                SELECT nodes.node,
                       (CAST(1.0 AS DOUBLE) - {d})/(SELECT n FROM nn)
                       + {d} * (coalesce(c.contrib, CAST(0 AS DOUBLE))
                                + (SELECT dang FROM dg{i})/(SELECT n FROM nn)) AS pr
                FROM nodes LEFT JOIN (
                    SELECT b.dst AS node, sum(r.pr / o.deg) AS contrib
                    FROM base b
                    JOIN pr{i} r ON b.src = r.node
                    JOIN outdeg o ON o.src = b.src
                    GROUP BY b.dst
                ) c USING (node)
            )"""
        )
    return ",\n            ".join(parts)


# Crawl-graph twin: re-synthesize the identical HTML string, re-extract
# hrefs with DuckDB's regexp_extract_all, derive host-grain edges, then
# recursive reachability (connected components) + the unrolled power
# method, joined at node grain — two independent formulations of the
# extraction AND of what operators/components.py + operators/graphrank.py
# compute iteratively.
_CC_PAGERANK_SQL = (
    """
            WITH RECURSIVE crawl AS (
                SELECT
                    'https://h' || CAST(doc_id % 23 AS VARCHAR)
                        || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS url,
                    '<html><body><p>t</p><a href="#f">x</a><a href="/rel">r</a>'
                    || '<a href="https://h' || CAST((doc_id * 7 + 3) % 23 AS VARCHAR)
                        || '.example.com/p/1">d</a>'
                    || '<a href=''https://h' || CAST((doc_id * 11 + 5) % 23 AS VARCHAR)
                        || '.example.com/q''>s</a>'
                    || CASE WHEN doc_id % 10 = 0
                            THEN '<a href="https://sink' || CAST(doc_id % 3 AS VARCHAR)
                                 || '.example.com/">k</a>'
                            ELSE '' END
                    || '</body></html>' AS html
                FROM documents WHERE doc_id < 300
            ),
            hrefs AS (
                SELECT url AS src_url,
                       unnest(list_distinct(list_concat(
                           regexp_extract_all(html,
                               '<[aA]\\s[^>]*href\\s*=\\s*"([^"]*)"', 1),
                           regexp_extract_all(html,
                               '<[aA]\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)
                       ))) AS dst_url
                FROM crawl
            ),
            base AS (
                SELECT DISTINCT
                    lower(regexp_extract(src_url, '^https?://([^/]+)', 1)) AS src,
                    lower(regexp_extract(dst_url, '^https?://([^/]+)', 1)) AS dst
                FROM hrefs
                WHERE (dst_url LIKE 'http://%' OR dst_url LIKE 'https://%')
                  AND lower(regexp_extract(src_url, '^https?://([^/]+)', 1))
                      <> lower(regexp_extract(dst_url, '^https?://([^/]+)', 1))
                  AND regexp_extract(dst_url, '^https?://([^/]+)', 1) <> ''
            ),
            sym AS (
                SELECT src, dst FROM base
                UNION SELECT dst, src FROM base
            ),
            reach AS (
                SELECT src AS node, src AS r FROM sym
                UNION
                SELECT reach.node, sym.dst
                FROM reach JOIN sym ON reach.r = sym.src
            ),
            cc AS (SELECT node, min(r) AS component FROM reach GROUP BY node),
            """
    + _pagerank_ctes(5)
    + """,
            outd AS (SELECT src AS node, count(*) AS c FROM base GROUP BY src),
            ind AS (SELECT dst AS node, count(*) AS c FROM base GROUP BY dst),
            deg AS (
                SELECT coalesce(outd.node, ind.node) AS node,
                       CAST(coalesce(outd.c, 0) AS BIGINT) AS out_deg,
                       CAST(coalesce(ind.c, 0) AS BIGINT) AS in_deg
                FROM outd FULL OUTER JOIN ind ON outd.node = ind.node
            ),
            atags AS (
                SELECT url, unnest(list_concat(
                    regexp_extract_all(html,
                        '<[aA]\\s[^>]*href\\s*=\\s*"[^"]*"[^>]*>[^<]*'),
                    regexp_extract_all(html,
                        '<[aA]\\s[^>]*href\\s*=\\s*''[^'']*''[^>]*>[^<]*')
                )) AS tag FROM crawl
            ),
            apairs AS (
                SELECT coalesce(nullif(regexp_extract(tag,
                           '<[aA]\\s[^>]*href\\s*=\\s*"([^"]*)"', 1), ''),
                       regexp_extract(tag,
                           '<[aA]\\s[^>]*href\\s*=\\s*''([^'']*)''', 1)) AS dst_url,
                       trim(regexp_extract(tag, '>([^<]*)$', 1)) AS anchor
                FROM atags
            ),
            acnt AS (
                SELECT lower(regexp_extract(dst_url, '^https?://([^/]+)', 1)) AS node,
                       anchor, count(*) AS n
                FROM apairs
                WHERE (dst_url LIKE 'http://%' OR dst_url LIKE 'https://%')
                  AND coalesce(anchor, '') <> ''
                  AND coalesce(regexp_extract(dst_url, '^https?://([^/]+)', 1), '') <> ''
                GROUP BY 1, 2
            ),
            atop AS (
                SELECT node, anchor AS top_anchor, CAST(n AS BIGINT) AS n_anchor,
                       row_number() OVER (PARTITION BY node
                           ORDER BY n DESC, anchor ASC) AS rn
                FROM acnt
            )
            SELECT cc.node, cc.component, round(pr5.pr, 6) AS pagerank,
                   deg.out_deg, deg.in_deg,
                   coalesce(atop.top_anchor, '') AS top_anchor,
                   CAST(coalesce(atop.n_anchor, 0) AS BIGINT) AS n_anchor
            FROM cc JOIN pr5 ON cc.node = pr5.node
                    JOIN deg ON cc.node = deg.node
                    LEFT JOIN atop ON cc.node = atop.node AND atop.rn = 1
        """
)

# Exact word-3-gram Jaccard pair CTEs (documents, doc_id < 200): the
# q_minhash_pairs denominator — the twin of operators.dedup.ngram_jaccard_pairs,
# whose exact values the contract re-emits alongside the coverage flag.
_JACCARD_CTES = """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents WHERE doc_id < 200
            ),
            sh AS (
                SELECT DISTINCT doc_id,
                       array_to_string(t[i:i+2], ' ') AS shingle
                FROM toks, LATERAL unnest(range(1, greatest(len(t) - 2, 1) + 1)) AS r(i)
            ),
            df AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 1000),
            sh2 AS (SELECT sh.* FROM sh JOIN df USING (shingle)),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh2 GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                FROM sh2 a JOIN sh2 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
"""

# Contract twin for both ANN invariant queries: the brute-force top-5 per
# query (same computation q_cosine_topk oracles) grouped to (query_id,
# n_exact), with recall_ok asserted true — the Spark side computes recall_ok
# against the live approximate result.
_ANN_RECALL_ORACLE = """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            scored AS (
                SELECT query_id, neighbor_id,
                       list_cosine_similarity(qv, cv) AS cos
                FROM q, c WHERE query_id <> neighbor_id
            ),
            topk AS (
                SELECT query_id FROM (
                    SELECT query_id, row_number() OVER (PARTITION BY query_id
                        ORDER BY cos DESC, neighbor_id ASC) AS rank
                    FROM scored
                ) WHERE rank <= 5
            )
            SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact,
                   true AS recall_ok
            FROM topk GROUP BY query_id
"""


def _stop_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


def oracle_sql() -> dict[str, str]:
    from tabbyld_spark.fixtures.sti_fixture import ensure_sti_fixture
    from tabbyld_spark.fixtures.sti_sql import sti_oracle_queries

    sti = sti_oracle_queries(ensure_sti_fixture())
    norm_p_name = normalize_entry_sql("p_name")
    norm_tok = normalize_entry_sql("tok")
    langs = sorted(STOPWORDS)
    lang_hits = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        f"count(*) FILTER (WHERE lower(tok) IN ({_stop_list(lang)})) AS hits "
        f"FROM toks GROUP BY doc_id"
        for lang in langs
    )

    def _tri_list(lang: str) -> str:
        return ", ".join("'" + g.replace("'", "''") + "'" for g in TRIGRAM_PROFILES[lang])

    tri_hits = "\nUNION ALL\n".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        f"count(*) FILTER (WHERE gram IN ({_tri_list(lang)})) AS hits "
        f"FROM g GROUP BY doc_id"
        for lang in sorted(TRIGRAM_PROFILES)
    )
    from tabbyld_spark.fixtures.gold_fixture import ensure_gold_fixture

    gd = ensure_gold_fixture()
    canon_pq = f"read_parquet('{ensure_sti_fixture()}/canonical.parquet')"
    gold_cols_cta = (
        "columns={'table_id':'VARCHAR','col_pos':'INT','class':'VARCHAR'}"
    )
    gold_cols_cpa = (
        "columns={'table_id':'VARCHAR','col_a_pos':'INT',"
        "'col_b_pos':'INT','pred':'VARCHAR'}"
    )
    return {
        **sti,
        "q_gold_cta": f"""
            WITH cmap AS (
                SELECT DISTINCT table_id, col_idx + 1 AS col_pos, column_heading
                FROM {canon_pq}
            ),
            g AS (SELECT * FROM read_csv('{gd}/cta_gt.csv', header=false, {gold_cols_cta}))
            SELECT DISTINCT g.table_id, cmap.column_heading AS col_heading, g.class
            FROM g JOIN cmap ON g.table_id = cmap.table_id AND g.col_pos = cmap.col_pos
        """,
        "q_gold_cpa": f"""
            WITH cmap AS (
                SELECT DISTINCT table_id, col_idx + 1 AS col_pos, column_heading
                FROM {canon_pq}
            ),
            g AS (SELECT * FROM read_csv('{gd}/cpa_gt.csv', header=false, {gold_cols_cpa}))
            SELECT DISTINCT g.table_id,
                   CASE WHEN g.col_a_pos = 0 THEN 'RowHeading' ELSE a.column_heading END AS col_a,
                   b.column_heading AS col_b,
                   g.pred
            FROM g
            LEFT JOIN cmap a ON g.table_id = a.table_id AND g.col_a_pos = a.col_pos
            JOIN cmap b ON g.table_id = b.table_id AND g.col_b_pos = b.col_pos
            WHERE g.col_a_pos = 0 OR a.column_heading IS NOT NULL
        """,
        "q_dataprep": f"""
            WITH fp AS (
                SELECT doc_id, text,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
                FROM documents
            ),
            s1 AS (
                SELECT doc_id, text FROM (
                    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY f) AS keep FROM fp
                ) WHERE doc_id = keep
            ),
            tok1 AS (
                SELECT doc_id, md5(tok) AS h
                FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM s1)
            ),
            bits AS (
                SELECT doc_id, j,
                       (instr('0123456789abcdef',
                              substring(h, CAST(floor(j / 4) AS INT) + 1, 1)) - 1) AS digit
                FROM tok1, LATERAL unnest(range(0, 32)) AS r(j)
            ),
            votes AS (
                SELECT doc_id, j,
                       sum((CAST(floor(digit / power(2.0, 3 - j % 4)) AS BIGINT) % 2) * 2 - 1) AS vote
                FROM bits GROUP BY doc_id, j
            ),
            sh AS (
                SELECT doc_id,
                       sum(CASE WHEN vote > 0 THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END) AS simhash
                FROM votes GROUP BY doc_id
            ),
            s2 AS (
                SELECT s1.doc_id, s1.text FROM s1 JOIN (
                    SELECT doc_id FROM (
                        SELECT doc_id, min(doc_id) OVER (PARTITION BY simhash) AS keep FROM sh
                    ) WHERE doc_id = keep
                ) k ON s1.doc_id = k.doc_id
            ),
            toks AS (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM s2),
            hits AS ({lang_hits}),
            lid AS (
                SELECT doc_id, lang AS pred_lang FROM (
                    SELECT doc_id, lang, hits,
                           row_number() OVER (PARTITION BY doc_id
                               ORDER BY hits DESC, lang ASC) AS rn
                    FROM hits) WHERE rn = 1
            ),
            q AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       {_TOKENS_SQL} AS t,
                       length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct
                FROM s2
            ),
            surv AS (
                SELECT q.doc_id, lid.pred_lang,
                       CAST(n_chars AS BIGINT) AS n_chars,
                       CAST(len(t) AS BIGINT) AS n_tokens,
                       round(punct / n_chars, 6) AS punct_ratio,
                       round(len(list_filter(t, x -> lower(x) IN ({_stop_list('en')}))) / len(t), 6) AS stopword_ratio
                FROM q JOIN lid ON q.doc_id = lid.doc_id
                WHERE lid.pred_lang = 'en'
                  AND len(t) >= 20
                  AND punct / n_chars <= 0.25
                  AND CAST(len(list_filter(t, x -> lower(x) IN ({_stop_list('en')}))) AS DOUBLE) / len(t) >= 0.01
            ),
            tot AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_src_docs
                FROM documents GROUP BY source
            ),
            keptsrc AS (
                SELECT surv.*, d.source FROM surv
                JOIN documents d ON surv.doc_id = d.doc_id
            ),
            ks AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_src_kept
                FROM keptsrc GROUP BY source
            )
            SELECT keptsrc.*, tot.n_src_docs, ks.n_src_kept,
                   round(ks.n_src_kept * 1.0 / tot.n_src_docs, 6) AS src_keep_rate
            FROM keptsrc JOIN tot USING (source) JOIN ks USING (source)
        """,
        "q_entity_res": """
            WITH p AS (
              SELECT 'p:' || p_partkey AS e,
                     lower(regexp_replace(trim(p_name), '\\s+', ' ', 'g')) AS block,
                     'br:' || p_brand AS a1, 'ty:' || p_type AS a2,
                     'sz:' || CAST(p_size // 10 AS VARCHAR) AS a3,
                     'pr:' || CAST(CAST(floor(p_retailprice / 500) AS BIGINT)
                                   AS VARCHAR) AS a4
              FROM part
            ),
            sized AS (SELECT block, count(*) AS bn FROM p GROUP BY block),
            kept AS (
              SELECT p.* FROM p JOIN sized USING (block) WHERE bn <= 1000
            ),
            pairs AS (
              SELECT a.e AS src, b.e AS dst,
                     (CAST(a.a1 = b.a1 AS INT) + CAST(a.a2 = b.a2 AS INT)
                      + CAST(a.a3 = b.a3 AS INT) + CAST(a.a4 = b.a4 AS INT)) AS i
              FROM kept a JOIN kept b ON a.block = b.block AND a.e < b.e
            )
            SELECT src, dst, round(i * 1.0 / (8 - i), 6) AS jaccard
            FROM pairs WHERE i * 1.0 / (8 - i) >= 0.5
        """,
        "q_agg_groupby": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q_join_multi": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "q_topk_window": """
            SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
                FROM orders
            ) WHERE rk <= 3
        """,
        "q_semi_join": """
            SELECT p_partkey, p_name FROM part
            WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        """,
        "q_sessions": """
            WITH o AS (
                SELECT user_id, ts, value,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events
            ),
            marked AS (
                SELECT user_id, ts, value,
                       CASE WHEN prev_ts IS NULL
                                 OR epoch(ts - prev_ts) > 86400
                            THEN 1 ELSE 0 END AS brk
                FROM o
            ),
            islands AS (
                SELECT user_id, ts, value,
                       sum(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess
                FROM marked
            )
            SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 4) AS sum_value,
                   CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_big
            FROM islands GROUP BY user_id, sess
        """,
        "q_rdfs_entail": """
            WITH RECURSIVE t AS (
                SELECT 'c:' || c_custkey AS subj, 'cust_nation' AS pred,
                       'n:' || c_nationkey AS obj FROM customer
                UNION ALL
                SELECT 's:' || s_suppkey, 'supp_nation',
                       'n:' || s_nationkey FROM supplier
                UNION ALL
                SELECT 'n:' || n_nationkey, 'in_region',
                       'r:' || n_regionkey FROM nation
            ),
            sp_edges(child, parent) AS (
                VALUES ('cust_nation', 'located_in'),
                       ('supp_nation', 'located_in'),
                       ('located_in', 'related_to')
            ),
            sc_edges(child, parent) AS (
                VALUES ('Customer', 'Agent'), ('Supplier', 'Agent'),
                       ('Agent', 'Thing'), ('Nation', 'Place'),
                       ('Region', 'Place'), ('Place', 'Thing')
            ),
            dom(pred, cls) AS (
                VALUES ('cust_nation', 'Customer'),
                       ('supp_nation', 'Supplier'),
                       ('in_region', 'Nation')
            ),
            rng(pred, cls) AS (
                VALUES ('located_in', 'Nation'), ('in_region', 'Region')
            ),
            sp_clo AS (
                SELECT child, parent FROM sp_edges
                UNION
                SELECT c.child, e.parent
                FROM sp_clo c JOIN sp_edges e ON c.parent = e.child
            ),
            sc_clo AS (
                SELECT child, parent FROM sc_edges
                UNION
                SELECT c.child, e.parent
                FROM sc_clo c JOIN sc_edges e ON c.parent = e.child
            ),
            inherited AS (
                SELECT t.subj, s.parent AS pred, t.obj
                FROM t JOIN sp_clo s ON t.pred = s.child
            ),
            dr_input AS (SELECT * FROM t UNION ALL SELECT * FROM inherited),
            dom_types AS (
                SELECT i.subj, 'rdf:type' AS pred, d.cls AS obj
                FROM dr_input i JOIN dom d ON i.pred = d.pred
            ),
            rng_types AS (
                SELECT i.obj AS subj, 'rdf:type' AS pred, r.cls AS obj
                FROM dr_input i JOIN rng r ON i.pred = r.pred
            ),
            type_base AS (
                SELECT * FROM dom_types UNION ALL SELECT * FROM rng_types
            ),
            sc_types AS (
                SELECT b.subj, 'rdf:type' AS pred, s.parent AS obj
                FROM type_base b JOIN sc_clo s ON b.obj = s.child
            )
            SELECT DISTINCT subj, pred, obj FROM (
                SELECT * FROM inherited
                UNION ALL SELECT * FROM type_base
                UNION ALL SELECT * FROM sc_types
            )
        """,
        "q_events_daily": """
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q_normalize": f"""
            SELECT p_partkey, {norm_p_name} AS mention_norm FROM part
        """,
        "q_multivalue_split": """
            WITH packed AS (
                SELECT p_partkey,
                       string_split(concat(p_brand, ' | ', p_type), ' | ') AS parts
                FROM part
            )
            SELECT p_partkey,
                   CAST(i - 1 AS BIGINT) AS pos,
                   parts[i] AS part_value
            FROM packed, LATERAL unnest(range(1, len(parts) + 1)) AS r(i)
        """,
        "q_levenshtein_score": """
            SELECT p_partkey,
                   CAST(levenshtein(p_name, p_type) AS BIGINT) AS lev,
                   round(1 - levenshtein(p_name, p_type) / 100.0, 6) AS lev_score
            FROM part
        """,
        "q_mentions": f"""
            WITH toks AS (
                SELECT lang, unnest({_TOKENS_SQL}) AS tok FROM documents
            )
            SELECT DISTINCT lang, {norm_tok} AS mention_norm
            FROM toks WHERE tok <> '' AND {norm_tok} <> ''
        """,
        "q_candidates_exact": f"""
            WITH mentions AS (
                SELECT tok AS mention, count(*) AS n_occurrences
                FROM (SELECT unnest({_TOKENS_SQL}) AS tok
                      FROM documents WHERE doc_id < 100)
                WHERE tok <> '' GROUP BY tok
            ),
            labels AS (
                SELECT DISTINCT surface, concat('urn:part:', surface) AS entity
                FROM (SELECT unnest(string_split(p_name, ' ')) AS surface FROM part)
            )
            SELECT mention, entity, n_occurrences
            FROM mentions JOIN labels ON mention = surface
        """,
        "q_cea_top1": f"""
            WITH mentions AS (
                SELECT DISTINCT tok AS mention
                FROM (SELECT unnest({_TOKENS_SQL}) AS tok
                      FROM documents WHERE doc_id < 50)
                WHERE length(tok) >= 3
            ),
            ents AS (
                SELECT DISTINCT unnest(string_split(p_name, ' ')) AS surface FROM part
            ),
            cands AS (
                SELECT mention, surface,
                       CAST(levenshtein(mention, surface) AS BIGINT) AS lev
                FROM mentions JOIN ents ON levenshtein(mention, surface) <= 2
            )
            SELECT mention, surface AS entity, lev FROM (
                SELECT *, row_number() OVER (PARTITION BY mention
                    ORDER BY lev ASC, surface ASC) AS rn FROM cands
            ) WHERE rn = 1
        """,
        "q_ner_literal": """
            WITH lab AS (
                SELECT
                  CASE
                    WHEN regexp_matches(CAST(CAST(l_quantity AS INT) AS VARCHAR), '^-?\\d+([.,]\\d+)?%$') THEN 'PERCENT'
                    WHEN regexp_matches(CAST(CAST(l_quantity AS INT) AS VARCHAR), '^-?\\d+([.,]\\d+)?$') THEN 'NUMBER'
                    ELSE NULL END AS ner_qty,
                  CASE
                    WHEN regexp_matches(concat(CAST(l_discount AS VARCHAR), '%'), '^-?\\d+([.,]\\d+)?%$') THEN 'PERCENT'
                    ELSE NULL END AS ner_disc,
                  CASE
                    WHEN regexp_matches(concat('$', CAST(round(l_extendedprice, 2) AS VARCHAR)), '^\\$\\d+([.,]\\d+)?$') THEN 'MONEY'
                    ELSE NULL END AS ner_price
                FROM lineitem
            )
            SELECT ner_qty, ner_disc, ner_price, count(*) AS n
            FROM lab GROUP BY 1, 2, 3
        """,
        "q_dedup_exact": """
            WITH fp AS (
                SELECT doc_id,
                       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS f
                FROM documents
            )
            SELECT doc_id, f AS fp,
                   min(doc_id) OVER (PARTITION BY f) AS keep_id,
                   CAST(count(*) OVER (PARTITION BY f) AS BIGINT) AS group_size
            FROM fp
        """,
        # contract twin of the approximate MinHash surface: same exact-Jaccard
        # denominator, covered-by-MinHash asserted true (see q_minhash_pairs)
        "q_minhash_pairs": f"""
            {_JACCARD_CTES}
            SELECT id_a, id_b,
                   round(i / (sa.sz + sb.sz - i), 6) AS jaccard,
                   true AS found
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE i / (sa.sz + sb.sz - i) >= 0.18
        """,
        # one contract row set per approximate index: methods are a literal
        # cross join over the shared brute-force denominator
        "q_ann_recall": f"""
            WITH contract AS ({_ANN_RECALL_ORACLE})
            SELECT m.method, c.query_id, c.n_exact, c.recall_ok
            FROM contract c CROSS JOIN (VALUES ('ivf'), ('lsh')) AS m(method)
        """,
        "q_simhash": f"""
            WITH tok AS (
                SELECT doc_id, md5(tok) AS h
                FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok
                      FROM documents WHERE doc_id < 150)
            ),
            bits AS (
                SELECT doc_id, j,
                       (instr('0123456789abcdef',
                              substring(h, CAST(floor(j / 4) AS INT) + 1, 1)) - 1) AS digit
                FROM tok, LATERAL unnest(range(0, 32)) AS r(j)
            ),
            votes AS (
                SELECT doc_id, j,
                       sum((CAST(floor(digit / power(2.0, 3 - j % 4)) AS BIGINT) % 2) * 2 - 1) AS vote
                FROM bits GROUP BY doc_id, j
            )
            SELECT doc_id,
                   CAST(sum(CASE WHEN vote > 0
                        THEN CAST(power(2.0, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id
        """,
        "q_doc_profile": f"""
            WITH qbase AS (
                SELECT doc_id,
                       length(text) AS n_chars,
                       {_TOKENS_SQL} AS t,
                       len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_re,
                       length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct
                FROM documents
            ),
            q AS (
                SELECT doc_id,
                       CAST(n_chars AS BIGINT) AS n_chars,
                       CAST(len(t) AS BIGINT) AS n_tokens,
                       CAST(n_re AS BIGINT) AS n_re_tokens,
                       round(n_chars / len(t), 6) AS chars_per_token,
                       round(punct / n_chars, 6) AS punct_ratio,
                       round(len(list_filter(t, x -> lower(x) IN ({_stop_list('en')}))) / len(t), 6) AS stopword_ratio,
                       round(len(list_distinct(t)) / len(t), 6) AS distinct_ratio
                FROM qbase
            ),
            rbase AS (
                SELECT doc_id,
                       regexp_replace(trim(text), '\\s+', ' ', 'g') AS n,
                       regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            feat AS (
                SELECT doc_id, length(n) AS nc,
                       CASE WHEN len(t) < 2 THEN [n]
                            ELSE list_transform(range(1, len(t)),
                                                i -> t[i] || ' ' || t[i+1]) END AS g2,
                       CASE WHEN len(t) < 3 THEN [n]
                            ELSE list_transform(range(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END AS g3
                FROM rbase
            ),
            expl AS (
                SELECT doc_id, nc,
                       1.0 - len(list_distinct(g3)) * 1.0 / len(g3) AS dup3,
                       unnest(g2) AS gram
                FROM feat
            ),
            counts AS (
                SELECT doc_id, nc, dup3, gram, count(*) AS c
                FROM expl GROUP BY doc_id, nc, dup3, gram
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                           ORDER BY c DESC, gram ASC) AS rn
                FROM counts
            ),
            rep AS (
                SELECT doc_id, gram AS top_2gram,
                       CAST(c AS BIGINT) AS top_2gram_count,
                       round(c * length(gram) * 1.0 / nc, 6) AS top_2gram_frac,
                       round(dup3, 6) AS dup_3gram_frac
                FROM ranked WHERE rn = 1
            ),
            sp AS (
                SELECT doc_id,
                       ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
                        + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
                        + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
                        + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % 100 AS bucket
                FROM (SELECT doc_id,
                             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS hx
                      FROM documents)
            ),
            pin AS (
                SELECT doc_id,
                       substr(text, 1, 32) || ' reach me at user'
                       || CAST(doc_id AS VARCHAR) || '@example.com'
                       || CASE WHEN doc_id % 3 = 0
                               THEN ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                               ELSE '' END
                       || CASE WHEN doc_id % 5 = 0
                               THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                                    || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                               ELSE '' END AS t
                FROM documents
            ),
            p1 AS (
                SELECT doc_id, len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
                       regexp_replace(t, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t
                FROM pin
            ),
            p2 AS (
                SELECT doc_id, n_emails,
                       len(regexp_extract_all(t, '{PII_IPV4_RE}')) AS n_ips,
                       regexp_replace(t, '{PII_IPV4_RE}', '<IP>', 'g') AS t
                FROM p1
            ),
            pii AS (
                SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
                       CAST(n_ips AS BIGINT) AS n_ips,
                       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
                       md5(regexp_replace(t, '{PII_PHONE_RE}', '<PHONE>', 'g')) AS pii_scrub_md5
                FROM p2
            ),
            -- ExactSubstr duplicate spans, k=4 (operators/dedup.py
            -- duplicate_span_profile): same window hashes, but the span
            -- merge is an independent gaps-and-islands formulation instead
            -- of the Spark in-expression fold
            ds_pos AS (
                SELECT doc_id, t, unnest(range(1, len(t) - 4 + 2)) AS i
                FROM rbase WHERE len(t) >= 4
            ),
            ds_wins AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(t[i : i + 4 - 1], ' ')) AS wh,
                       doc_id * 4294967296 + (i - 1) AS okey
                FROM ds_pos
            ),
            ds_firsts AS (
                SELECT wh, count(*) AS n_occ, min(okey) AS fk
                FROM ds_wins GROUP BY wh
            ),
            ds_dup AS (
                SELECT w.doc_id, w.pos FROM ds_wins w JOIN ds_firsts f USING (wh)
                WHERE f.n_occ > 1 AND w.okey <> f.fk
            ),
            ds_marks AS (
                SELECT doc_id, pos,
                       CASE WHEN pos > coalesce(max(pos + 4) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                       THEN 1 ELSE 0 END AS brk
                FROM ds_dup
            ),
            ds_isl AS (
                SELECT doc_id, pos,
                       sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
                FROM ds_marks
            ),
            ds_spans AS (
                SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
                FROM ds_isl GROUP BY doc_id, island
            ),
            ds AS (
                SELECT d.doc_id,
                       CAST(coalesce(dw.nw, 0) AS BIGINT) AS n_dup_windows,
                       CAST(coalesce(spn.ns, 0) AS BIGINT) AS n_dup_spans,
                       CAST(coalesce(spn.cov, 0) AS BIGINT) AS n_dup_tokens
                FROM documents d
                LEFT JOIN (SELECT doc_id, count(*) AS nw FROM ds_dup
                           GROUP BY doc_id) dw USING (doc_id)
                LEFT JOIN (SELECT doc_id, count(*) AS ns, sum(e - s) AS cov
                           FROM ds_spans GROUP BY doc_id) spn USING (doc_id)
            ),
            mix0 AS (
                SELECT doc_id,
                       CAST(CASE source WHEN 'src0' THEN 0.25 WHEN 'src1' THEN 2.5
                                        WHEN 'src2' THEN 0.0 ELSE 1.0
                            END AS DOUBLE) AS mix_rate,
                       CAST('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) / 4294967296.0 AS u
                FROM documents
            ),
            mix AS (
                SELECT doc_id, mix_rate,
                       CAST(floor(u * 1000000) AS BIGINT) AS mix_u,
                       CAST(floor(mix_rate)
                            + CASE WHEN u < mix_rate - floor(mix_rate)
                                   THEN 1 ELSE 0 END AS BIGINT) AS mix_copies
                FROM mix0
            ),
            -- DSIR importance weights (operators/importance.py): hashed
            -- word unigram+bigram buckets, add-0.5 smoothing over 512
            -- buckets, target = doc_id%7 slice, raw = whole corpus;
            -- independent re-derivation of fit AND score
            dsw AS (
                SELECT doc_id,
                       regexp_extract_all(lower(coalesce(text, '')),
                                          '[a-z0-9]+') AS ws
                FROM documents
            ),
            dsc AS (
                SELECT doc_id,
                       CAST('0x' || substring(md5(g), 1, 8) AS BIGINT)
                           % 512 AS bucket,
                       count(*) AS cnt
                FROM (SELECT doc_id, unnest(list_concat(ws,
                          list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i+1]))) AS g
                      FROM dsw)
                GROUP BY 1, 2
            ),
            dst AS (
                SELECT bucket, sum(cnt) AS t_cnt FROM dsc
                WHERE doc_id % 7 = 0 GROUP BY bucket
            ),
            dsr AS (
                SELECT bucket, sum(cnt) AS r_cnt FROM dsc GROUP BY bucket
            ),
            dsm AS (
                SELECT b.bucket,
                       ln((coalesce(t.t_cnt, 0) + 0.5)
                          / ((SELECT coalesce(sum(t_cnt), 0) FROM dst) + 256.0))
                     - ln((coalesce(r.r_cnt, 0) + 0.5)
                          / ((SELECT coalesce(sum(r_cnt), 0) FROM dsr) + 256.0))
                           AS lr
                FROM (SELECT unnest(range(0, 512)) AS bucket) b
                LEFT JOIN dst t USING (bucket)
                LEFT JOIN dsr r USING (bucket)
            ),
            dsirw AS (
                SELECT c.doc_id, sum(c.cnt) AS nf, sum(c.cnt * m.lr) AS lw
                FROM dsc c JOIN dsm m USING (bucket) GROUP BY c.doc_id
            ),
            dsir AS (
                SELECT d.doc_id,
                       CAST(coalesce(s.nf, 0) AS BIGINT) AS dsir_nfeat,
                       round(coalesce(s.lw, 0.0), 6) AS dsir_logw,
                       round(coalesce(s.lw, 0.0)
                             - ln(-ln(CAST('0x' || substring(
                                   md5('dsir:' || CAST(d.doc_id AS VARCHAR)),
                                   1, 8) AS BIGINT) / 4294967296.0)), 6)
                           AS dsir_key
                FROM documents d LEFT JOIN dsirw s USING (doc_id)
            )
            SELECT q.*, rep.top_2gram, rep.top_2gram_count, rep.top_2gram_frac,
                   rep.dup_3gram_frac,
                   CAST(sp.bucket AS BIGINT) AS bucket,
                   CASE WHEN sp.bucket < 10 THEN 'val' ELSE 'train' END AS split,
                   pii.n_emails, pii.n_ips, pii.n_phones, pii.pii_scrub_md5,
                   ds.n_dup_windows, ds.n_dup_spans, ds.n_dup_tokens,
                   mix.mix_rate, mix.mix_u, mix.mix_copies,
                   dsir.dsir_nfeat, dsir.dsir_logw, dsir.dsir_key
            FROM q JOIN rep USING (doc_id) JOIN sp USING (doc_id)
                   JOIN pii USING (doc_id) JOIN ds USING (doc_id)
                   JOIN mix USING (doc_id) JOIN dsir USING (doc_id)
        """,
        "q_langid": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
            ),
            hits AS ({lang_hits}),
            ranked AS (
                SELECT doc_id, lang, hits,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY hits DESC, lang ASC) AS rn
                FROM hits
            ),
            sw AS (
                SELECT doc_id, lang AS pred_lang, CAST(hits AS BIGINT) AS stop_hits
                FROM ranked WHERE rn = 1
            ),
            norm AS (
                SELECT doc_id,
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS n
                FROM documents
            ),
            g AS (
                SELECT doc_id, substring(n, CAST(i AS INT), 3) AS gram
                FROM norm,
                     LATERAL unnest(range(1, greatest(length(n) - 2, 1) + 1)) AS r(i)
            ),
            thits AS ({tri_hits}),
            tranked AS (
                SELECT doc_id, lang, hits,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY hits DESC, lang ASC) AS rn
                FROM thits
            ),
            tri AS (
                SELECT doc_id, lang AS pred_lang_ngram, CAST(hits AS BIGINT) AS tri_hits
                FROM tranked WHERE rn = 1
            ),
            lmtok AS (
                SELECT lower(tok) AS token
                FROM (SELECT unnest({_TOKENS_SQL}) AS tok
                      FROM documents WHERE doc_id % 10 = 0)
            ),
            lmcnt AS (SELECT token, count(*) AS c FROM lmtok GROUP BY token),
            lmtot AS (SELECT sum(c) AS n, count(*) AS v FROM lmcnt),
            lm AS (
                SELECT token, ln((c + 0.5) / (n + 0.5 * (v + 1))) AS logp
                FROM lmcnt CROSS JOIN lmtot
            ),
            oov AS (SELECT ln(0.5 / (n + 0.5 * (v + 1))) AS oov_logp FROM lmtot),
            dtok AS (
                SELECT doc_id, lower(tok) AS token
                FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents)
            ),
            lms AS (
                SELECT dtok.doc_id,
                       CAST(floor(avg(-coalesce(lm.logp, oov.oov_logp)) * 1000000)
                            AS BIGINT) AS lm_nll6,
                       CAST(sum(CASE WHEN lm.logp IS NULL THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_oov,
                       CAST(count(*) AS BIGINT) AS n_scored
                FROM dtok LEFT JOIN lm USING (token) CROSS JOIN oov
                GROUP BY dtok.doc_id
            )
            SELECT sw.doc_id, sw.pred_lang, sw.stop_hits,
                   tri.pred_lang_ngram, tri.tri_hits,
                   lms.lm_nll6, lms.n_oov, lms.n_scored
            FROM sw JOIN tri USING (doc_id) JOIN lms USING (doc_id)
        """,
        "q_decontam": """
            WITH tok AS (
                SELECT doc_id,
                       regexp_replace(trim(text), '\\s+', ' ', 'g') AS n,
                       regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ),
            grams AS (
                SELECT doc_id,
                       unnest(CASE WHEN len(t) < 4 THEN [n]
                           ELSE list_distinct(list_transform(range(1, len(t) - 2),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    || ' ' || t[i+3])) END) AS g
                FROM tok
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
            hits AS (
                SELECT gr.doc_id, count(*) AS shared
                FROM grams gr JOIN bench b ON gr.g = b.g
                WHERE gr.doc_id % 20 <> 0
                GROUP BY gr.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(h.shared, 0) AS BIGINT) AS shared_grams,
                   coalesce(h.shared, 0) > 0 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        "q_winnow": """
            WITH norm AS (
                SELECT doc_id,
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS n
                FROM documents WHERE doc_id < 120
            ),
            g AS (
                SELECT doc_id, i, md5(substring(n, CAST(i AS INT), 5)) AS h
                FROM norm,
                     LATERAL unnest(range(1, greatest(length(n) - 5 + 1, 1) + 1)) AS r(i)
            ),
            ng AS (SELECT doc_id, max(i) AS n_g FROM g GROUP BY doc_id),
            win AS (
                SELECT doc_id, j
                FROM ng, LATERAL unnest(range(1, greatest(n_g - 4 + 1, 1) + 1)) AS r(j)
            ),
            wm AS (
                SELECT w.doc_id, w.j, min(g.h) AS fp
                FROM win w JOIN g ON g.doc_id = w.doc_id
                              AND g.i BETWEEN w.j AND w.j + 3
                GROUP BY w.doc_id, w.j
            )
            SELECT DISTINCT wm.doc_id, CAST(min(g.i) AS BIGINT) AS pos, wm.fp
            FROM wm JOIN g ON g.doc_id = wm.doc_id AND g.h = wm.fp
                          AND g.i BETWEEN wm.j AND wm.j + 3
            GROUP BY wm.doc_id, wm.j, wm.fp
        """,
        "q_winnow_pairs": """
            WITH norm AS (
                SELECT doc_id,
                       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS n
                FROM documents WHERE doc_id < 120
            ),
            g AS (
                SELECT doc_id, i, md5(substring(n, CAST(i AS INT), 5)) AS h
                FROM norm,
                     LATERAL unnest(range(1, greatest(length(n) - 5 + 1, 1) + 1)) AS r(i)
            ),
            ng AS (SELECT doc_id, max(i) AS n_g FROM g GROUP BY doc_id),
            win AS (
                SELECT doc_id, j
                FROM ng, LATERAL unnest(range(1, greatest(n_g - 4 + 1, 1) + 1)) AS r(j)
            ),
            fps AS (
                SELECT DISTINCT w.doc_id, min(g.h) AS fp
                FROM win w JOIN g ON g.doc_id = w.doc_id
                              AND g.i BETWEEN w.j AND w.j + 3
                GROUP BY w.doc_id, w.j
            ),
            dfc AS (SELECT fp, count(*) AS df FROM fps GROUP BY fp),
            kept AS (
                SELECT f.doc_id, f.fp FROM fps f JOIN dfc USING (fp)
                WHERE dfc.df <= 1000
            ),
            sz AS (SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       count(*) AS shared
                FROM kept a JOIN kept b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT p.id_a, p.id_b, CAST(p.shared AS BIGINT) AS shared,
                   round(p.shared / least(sa.n_fp, sb.n_fp), 6) AS overlap
            FROM pairs p
            JOIN sz sa ON sa.doc_id = p.id_a
            JOIN sz sb ON sb.doc_id = p.id_b
        """,
        "q_media_meta": """
            WITH g AS (
                SELECT CAST(doc_id AS BIGINT) AS media_id,
                       doc_id % 3 AS k,
                       CAST(doc_id % 37 + 8 AS BIGINT) AS w,
                       CAST(doc_id % 23 + 8 AS BIGINT) AS h,
                       CAST(doc_id % 5 + 2 AS BIGINT) AS nf
                FROM documents WHERE doc_id < 500
            )
            SELECT media_id,
                   CASE k WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                   CASE WHEN k IN (0, 2) THEN w END AS width,
                   CASE WHEN k IN (0, 2) THEN h END AS height,
                   CASE WHEN k = 2 THEN nf END AS n_frames,
                   CASE WHEN k = 1 THEN 16000 END AS sample_rate,
                   CASE k WHEN 0 THEN 12 + w * h
                          WHEN 1 THEN 8 + w * h
                          ELSE 16 + w * h * nf END AS n_bytes
            FROM g
        """,
        "q_text_ranking": f"""
            WITH tft AS (
                SELECT doc_id, lower(t) AS term, count(*) AS tf
                FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS t
                      FROM documents WHERE doc_id < 300)
                WHERE t <> '' GROUP BY 1, 2
            ),
            nd AS (SELECT count(DISTINCT doc_id) AS n
                   FROM documents WHERE doc_id < 300),
            tdf AS (SELECT term, count(*) AS df FROM tft GROUP BY term),
            tscored AS (
                SELECT tft.doc_id, tft.term, tft.tf, d.df,
                       tft.tf * (ln((nd.n + 1) / (d.df + 1.0)) + 1) AS tfidf
                FROM tft JOIN tdf d USING (term) CROSS JOIN nd
                WHERE d.df <= nd.n * 0.9
            ),
            top3 AS (
                SELECT doc_id, term, tf, df, round(tfidf, 6) AS tfidf, rk FROM (
                    SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rk
                    FROM tscored
                ) WHERE rk <= 3
            ),
            btc AS (
                SELECT doc_id, lower(t) AS term, count(*) AS tf
                FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS t FROM documents)
                WHERE t <> '' GROUP BY 1, 2
            ),
            dl AS (SELECT doc_id, sum(tf) AS dl FROM btc GROUP BY doc_id),
            stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
            q AS (SELECT unnest(['hash', 'join', 'vector']) AS term),
            bdf AS (
                SELECT btc.term, count(*) AS df
                FROM btc JOIN q USING (term) GROUP BY btc.term
            ),
            bscored AS (
                SELECT btc.doc_id,
                       sum(
                           ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1)
                           * btc.tf * (1.2 + 1)
                           / (btc.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))
                       ) AS score
                FROM btc
                JOIN bdf d USING (term)
                JOIN dl USING (doc_id)
                CROSS JOIN stats s
                GROUP BY btc.doc_id
            ),
            bm AS (
                SELECT doc_id, round(score, 6) AS score, CAST(rank AS BIGINT) AS rank
                FROM (
                    SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
                    FROM bscored
                ) WHERE rank <= 20
            )
            SELECT COALESCE(top3.doc_id, bm.doc_id) AS doc_id,
                   top3.term, top3.tf, top3.df, top3.tfidf, top3.rk,
                   bm.score, bm.rank
            FROM top3 FULL OUTER JOIN bm ON top3.doc_id = bm.doc_id
        """,
        "q_webprep": """
            WITH docs0 AS (
                SELECT doc_id, source,
                       regexp_replace(
                           trim(regexp_replace(text, '\\s+', ' ', 'g')),
                           '((?:\\S+ ){7}\\S+) ', '\\1' || chr(10), 'g') AS body
                FROM documents
            ),
            pages_all AS (
                SELECT upper('https://d' || CAST(doc_id % 37 AS VARCHAR) || '.'
                           || source || '.example.com')
                           || ':443/p/' || CAST(doc_id AS VARCHAR)
                           || '?utm_source=crawl&fbclid=f'
                           || CAST(doc_id AS VARCHAR)
                           || '#s' || CAST(doc_id % 5 AS VARCHAR) AS url,
                       body,
                       TIMESTAMP '2024-01-02 00:00:00' AS warc_ts
                FROM docs0
                UNION ALL
                SELECT 'https://d' || CAST(doc_id % 37 AS VARCHAR) || '.'
                           || source || '.example.com/p/'
                           || CAST(doc_id AS VARCHAR) AS url,
                       body,
                       TIMESTAMP '2024-01-02 00:00:00' AS warc_ts
                FROM docs0 WHERE doc_id % 4 = 0
                UNION ALL
                -- stale capture of the messy spelling, different content
                SELECT upper('https://d' || CAST(doc_id % 37 AS VARCHAR) || '.'
                           || source || '.example.com')
                           || ':443/p/' || CAST(doc_id AS VARCHAR)
                           || '?utm_source=crawl&fbclid=f'
                           || CAST(doc_id AS VARCHAR)
                           || '#s' || CAST(doc_id % 5 AS VARCHAR) AS url,
                       upper(body) AS body,
                       TIMESTAMP '2024-01-01 00:00:00' AS warc_ts
                FROM docs0 WHERE doc_id % 3 = 0
            ),
            -- W0a twin: newest capture per raw URL (timestamps are distinct
            -- per url in this synthesis, so max_by is unambiguous)
            raw_pages AS (
                SELECT url, max_by(body, warc_ts) AS body
                FROM pages_all GROUP BY url
            ),
            -- W0 twin: independent canonicalization (regex piece extraction
            -- + list_filter/list_sort), then one survivor per canonical url
            pieces AS (
                SELECT url, body,
                    coalesce(lower(regexp_extract(url,
                        '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)), '') AS proto,
                    coalesce(lower(regexp_extract(url,
                        '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#:@]+)', 1)), '') AS host,
                    coalesce(regexp_extract(url,
                        '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*:(\\d+)', 1), '') AS port,
                    coalesce(regexp_extract(url,
                        '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '') AS path,
                    CASE WHEN url LIKE '%?%'
                         THEN regexp_extract(url, '\\?([^#]*)', 1) ELSE '' END AS qr
                FROM raw_pages
            ),
            canon0 AS (
                SELECT body,
                    proto || '://' || host ||
                    CASE WHEN port = '' OR (proto, port) IN
                              (('http','80'),('https','443'),('ftp','21'),
                               ('ws','80'),('wss','443'))
                         THEN '' ELSE ':' || port END ||
                    CASE WHEN path = '' THEN '/' ELSE path END ||
                    CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS url,
                    host
                FROM (
                    SELECT *, coalesce(array_to_string(list_sort(list_filter(
                        string_split(qr, '&'),
                        x -> x <> '' AND NOT lower(string_split(x, '=')[1]) IN (
                            'utm_source','utm_medium','utm_campaign','utm_term',
                            'utm_content','utm_id','gclid','dclid','fbclid',
                            'msclkid','twclid','igshid','mc_cid','mc_eid',
                            '_hsenc','_hsmi','oly_enc_id','oly_anon_id'))),
                        '&'), '') AS qs
                    FROM pieces
                )
            ),
            base AS (
                SELECT url, host, min(body) AS body
                FROM canon0 GROUP BY url, host
            ),
            kept AS (
                SELECT url AS doc_id, body FROM base
                WHERE NOT (host = 'src3.example.com'
                           OR host LIKE '%.src3.example.com')
                  AND NOT (host = 'd7.src0.example.com'
                           OR host LIKE '%.d7.src0.example.com')
            ),
            l0 AS (SELECT doc_id, string_split(body, chr(10)) AS ls FROM kept),
            lines AS (
                SELECT doc_id, i - 1 AS line_no, ls[i] AS line
                FROM l0, LATERAL unnest(range(1, len(ls) + 1)) AS r(i)
                WHERE length(trim(ls[i])) > 0
            ),
            win AS (
                SELECT doc_id, line_no, line,
                       row_number() OVER (PARTITION BY line
                           ORDER BY doc_id, line_no) AS rn
                FROM lines
            ),
            rebuilt AS (
                SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
                FROM win WHERE rn = 1 GROUP BY doc_id
            ),
            tok AS (
                SELECT doc_id,
                       regexp_split_to_array(
                           trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS t
                FROM rebuilt WHERE length(trim(text)) > 0
            ),
            ch AS (
                SELECT doc_id, CAST(r.k AS BIGINT) AS chunk_id,
                       array_to_string(t[k*12+1 : k*12+16], ' ') AS chunk_text,
                       CAST(len(t[k*12+1 : k*12+16]) AS BIGINT) AS n_chunk_tokens
                FROM tok,
                     LATERAL unnest(range(0,
                         CAST(floor((len(t) + 11) / 12) AS BIGINT))) AS r(k)
            ),
            keyed AS (
                SELECT *, doc_id || '#' || CAST(chunk_id AS VARCHAR) AS seq_key
                FROM ch
            ),
            bkt AS (
                SELECT *, CAST((strpos('0123456789abcdef',
                               substr(md5(seq_key), 6, 1)) - 1) % 8 AS BIGINT)
                           AS bucket
                FROM keyed
            )
            SELECT seq_key, doc_id, chunk_id, chunk_text, n_chunk_tokens, bucket,
                   CAST(sum(n_chunk_tokens) OVER w AS BIGINT) AS cum_tokens,
                   CAST(floor((sum(n_chunk_tokens) OVER w - n_chunk_tokens)
                        / 64) AS BIGINT) AS pack_id
            FROM bkt
            WINDOW w AS (PARTITION BY bucket ORDER BY seq_key
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
        "q_media_features": """
            WITH g AS (
                SELECT CAST(doc_id AS BIGINT) AS media_id,
                       CAST(doc_id % 37 + 8 AS INT) AS w,
                       CAST(doc_id % 23 + 8 AS INT) AS h
                FROM documents WHERE doc_id < 400 AND doc_id % 3 = 0
            ),
            d AS (
                SELECT media_id, w, h,
                       sha256(CAST(media_id AS VARCHAR)) AS hx
                FROM g
            ),
            bytes AS (
                SELECT media_id, w, h,
                       (instr('0123456789abcdef',
                              substring(hx, 2 * (r.j % 32) + 1, 1)) - 1) * 16
                       + (instr('0123456789abcdef',
                                substring(hx, 2 * (r.j % 32) + 2, 1)) - 1) AS v
                FROM d, LATERAL unnest(range(0, w * h)) AS r(j)
            ),
            hist AS (
                SELECT media_id, CAST(v // 16 AS INT) AS bin, count(*) AS c
                FROM bytes GROUP BY 1, 2
            ),
            bin_list AS (
                SELECT CAST(r.b AS INT) AS bin FROM unnest(range(0, 16)) AS r(b)
            ),
            bins AS (
                SELECT a.media_id, a.bin, coalesce(h.c, 0) AS c
                FROM (SELECT g.media_id, b.bin FROM g CROSS JOIN bin_list b) a
                LEFT JOIN hist h ON h.media_id = a.media_id AND h.bin = a.bin
            ),
            packed AS (
                SELECT media_id, string_agg(c, ',' ORDER BY bin) AS hist
                FROM bins GROUP BY media_id
            ),
            means AS (
                SELECT media_id, round(avg(v), 6) AS mean_px FROM bytes GROUP BY media_id
            )
            SELECT g.media_id, CAST(g.w AS BIGINT) AS width, CAST(g.h AS BIGINT) AS height,
                   m.mean_px, p.hist
            FROM g JOIN means m ON m.media_id = g.media_id
            JOIN packed p ON p.media_id = g.media_id
        """,
        "q_media_frames": """
            WITH g AS (
                SELECT CAST(doc_id AS BIGINT) AS media_id,
                       CAST(doc_id % 37 + 8 AS BIGINT) AS w,
                       CAST(doc_id % 23 + 8 AS BIGINT) AS h,
                       CAST(doc_id % 5 + 2 AS BIGINT) AS nf
                FROM documents WHERE doc_id < 300 AND doc_id % 3 = 2
            )
            SELECT media_id, CAST(i AS BIGINT) AS frame_idx, w * h AS frame_bytes
            FROM g, LATERAL unnest(range(0, nf, 2)) AS r(i)
        """,
        "q_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 10),
            c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
            scored AS (
                SELECT query_id, neighbor_id,
                       list_cosine_similarity(qv, cv) AS cos
                FROM q, c WHERE query_id <> neighbor_id
            )
            SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id ASC) AS rank
                FROM scored
            ) WHERE rank <= 5
        """,
        "q_closure": """
            WITH RECURSIVE edges AS (
                SELECT DISTINCT CAST(p_partkey AS BIGINT) AS child,
                       CAST(floor(p_partkey / 2) AS BIGINT) AS parent
                FROM part WHERE p_partkey > 0 AND p_partkey < 64
            ),
            nodes AS (
                SELECT child AS n FROM edges UNION SELECT parent FROM edges
            ),
            walk AS (
                SELECT n AS child, n AS parent, CAST(0 AS BIGINT) AS depth FROM nodes
                UNION ALL
                SELECT w.child, e.parent, w.depth + 1
                FROM walk w JOIN edges e ON w.parent = e.child
            )
            SELECT child, parent, min(depth) AS depth
            FROM walk GROUP BY child, parent
        """,
        "q_connected_components": _CC_PAGERANK_SQL,
        "q_kg_pattern": """
            WITH t AS (
                SELECT 'c:' || c_custkey AS subj, 'cust_nation' AS pred,
                       'n:' || c_nationkey AS obj FROM customer
                UNION ALL
                SELECT 's:' || s_suppkey, 'supp_nation',
                       'n:' || s_nationkey FROM supplier
                UNION ALL
                SELECT 'n:' || n_nationkey, 'in_region',
                       'r:' || n_regionkey FROM nation WHERE n_nationkey < 20
            )
            SELECT p1.subj AS c, p1.obj AS n, p2.subj AS s
            FROM t p1
            JOIN t p2 ON p2.obj = p1.obj AND p2.pred = 'supp_nation'
            JOIN t p3 ON p3.subj = p1.obj AND p3.pred = 'in_region'
                     AND p3.obj = 'r:1'
            WHERE p1.pred = 'cust_nation'
        """,
        "q_kg_validate": """
            SELECT 'functional' AS "check", 'p:' || l_partkey AS key,
                   'supplied_by' AS detail,
                   CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n
            FROM lineitem GROUP BY l_partkey
            HAVING count(DISTINCT l_suppkey) > 1
            UNION ALL
            SELECT 'dangling', 'n:' || nk, 'n:', CAST(count(*) AS BIGINT)
            FROM (
                SELECT c_nationkey AS nk FROM customer
                UNION ALL
                SELECT s_nationkey FROM supplier
            ) WHERE nk >= 20 GROUP BY nk
            UNION ALL
            SELECT 'disjoint', 'n:' || n_nationkey, 'Big|Small',
                   CAST(1 AS BIGINT)
            FROM nation WHERE n_nationkey >= 10 AND n_nationkey < 15
        """,
    }
