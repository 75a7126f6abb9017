"""spark-submit entrypoints — the production run shape of the engine.

The north rule's deployment form is::

    zip -qr pipeline.zip tabbyld_spark
    spark-submit --master <cluster> --py-files pipeline.zip job.py <command> ...

``job.py`` (repo root) is a three-line shim around :func:`main`; everything
submit-able lives here so ``--py-files`` ships one artifact.  Under
spark-submit the master, executor sizing, and any ``--conf`` flags come from
the submit command line, so this module builds its session with a plain
``getOrCreate()`` (inheriting the submitted conf) instead of the ``local[N]``
factory that tests and bench use — the same code path a 1000-executor
deployment exercises.

Commands (each prints exactly one JSON summary line on success):

warc-ingest   WARC / .warc.gz crawl files → the input_hint pages table
              (file-grain parallel container decode, sources/warc.py).
synth-pages   deterministic Common-Crawl-shaped fixture input (input_hint
              schema: url, warc_ts, html:binary, text, lang), generated
              DISTRIBUTED (one Arrow batch per id-range slice — content is a
              pure function of (seed, page_id), so any partitioning yields
              identical rows) plus the KG dimension tables and, optionally,
              the gold annotations for evaluation.
annotate      the flagship S1-S6 pages→triples run with per-stage snapshot
              commits (kill it at any stage boundary; the rerun resumes from
              the last committed snapshot — the summary line says which
              stages were resumed vs computed).
webprep       the FineWeb/RefinedWeb-style corpus prep: URL blocklist →
              byte-identical extract → global line dedup → dedup/lang/quality
              gates → chunk + pack into fixed token budgets.
mix           deterministic per-key mixture sampling (the "2 epochs of
              wiki, 0.3 of CC" table): hash-Bernoulli keeps + upsample
              copies, a pure function of the doc id.
graph         the crawl link graph: pages → outlinks → host edges →
              connected components + PageRank at node grain.
diff          recrawl snapshot delta: two pages tables → per-URL
              added/removed/changed/unchanged (digest join — the input
              of an incremental re-run is added ∪ changed).
refresh       incremental annotate: S1-S6 over added ∪ changed pages only,
              invalidate removed ∪ changed rows, commit merged CEA/CTA/CPA
              + re-emitted triples as new catalog snapshots (provably equal
              to a full recompute — annotation is table-local).

Reference parity: the reference drives these flows from console commands
(``php yii spreadsheet/annotate ...``, /root/reference/commands/
SpreadsheetController.php); this module is that surface re-expressed as
spark-submit applications.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import DataFrame, SparkSession

KG_TABLES = ("kg_labels", "kg_types", "kg_subclass", "kg_triples")
GOLD_TABLES = ("gold_cea", "gold_cta", "gold_cpa")


def _session(app_name: str) -> SparkSession:
    """Inherit the spark-submit conf; only fill defaults that are unset.

    ``spark.sql.shuffle.partitions`` is deliberately NOT forced here: on a
    real cluster it must track executor count (set it via ``--conf`` or let
    AQE coalesce), and under plain ``python job.py`` Spark's default applies.
    """
    return SparkSession.builder.appName(app_name).getOrCreate()


def _emit(summary: dict) -> None:
    print(json.dumps(summary, sort_keys=True))


def _read_kg(spark: SparkSession, kg_dir: str) -> dict[str, DataFrame]:
    return {
        t: spark.read.parquet(os.path.join(kg_dir, f"{t}.parquet")) for t in KG_TABLES
    }


# ---------------------------------------------------------------------------
# warc-ingest
# ---------------------------------------------------------------------------


def cmd_warc_ingest(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.sources.warc import read_warc

    spark = _session("tabbyld-warc-ingest")
    pages = read_warc(spark, args.warc)
    pages.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.agg(
        F.count(F.lit(1)).alias("pages"),
        F.countDistinct("url").alias("urls"),
    ).collect()[0]
    return {
        "command": "warc-ingest",
        "out": args.out,
        "pages": agg["pages"],
        "urls": agg["urls"],
    }


# ---------------------------------------------------------------------------
# synth-pages
# ---------------------------------------------------------------------------


def cmd_synth_pages(args: argparse.Namespace) -> dict:
    from tabbyld_spark.fixtures.kg import build_kg
    from tabbyld_spark.fixtures.pages import gen_pages_df, gen_pages_pd

    spark = _session("tabbyld-synth-pages")
    kg = build_kg(seed=args.seed)
    pages = gen_pages_df(
        spark, kg, args.n_pages, seed=args.seed, typo_rate=args.typo_rate,
        partitions=args.partitions,
    )
    pages_path = os.path.join(args.out, "pages")
    pages.write.mode("overwrite").parquet(pages_path)

    kg_dir = os.path.join(args.out, "kg")
    for name, df in kg.to_spark(spark).items():
        # one small file per dimension: these broadcast, they don't scan
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(kg_dir, f"{name}.parquet")
        )

    summary = {
        "command": "synth-pages",
        "pages": pages_path,
        "n_pages": args.n_pages,
        "kg": kg_dir,
        "gold": None,
    }
    if args.with_gold:
        # gold derivation replays the per-page content walk driver-side;
        # it is test/eval tooling, bounded by design — refuse silly sizes
        if args.n_pages > 50_000:
            raise SystemExit("--with-gold is driver-side; use <= 50000 pages")
        fx = gen_pages_pd(kg, n_pages=args.n_pages, seed=args.seed, typo_rate=args.typo_rate)
        gold_dir = os.path.join(args.out, "gold")
        for t in GOLD_TABLES:
            spark.createDataFrame(getattr(fx, t)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(gold_dir, f"{t}.parquet"))
        summary["gold"] = gold_dir
    return summary


# ---------------------------------------------------------------------------
# annotate
# ---------------------------------------------------------------------------


def cmd_annotate(args: argparse.Namespace) -> dict:
    from tabbyld_spark.plans.pipeline import persist_evaluation, run_pipeline_resumable
    from tabbyld_spark.sources.catalog import make_catalog

    spark = _session("tabbyld-annotate")
    pages = spark.read.parquet(args.pages)
    kg = _read_kg(spark, args.kg)
    catalog = make_catalog(spark, args.catalog)

    stages = ("canonical", "cea", "cta", "cpa", "triples")
    resumed = [t for t in ("canonical", "triples") if catalog.exists(t)]
    triples = run_pipeline_resumable(
        spark, pages, kg, catalog, fuzzy_enabled=not args.no_fuzzy
    )
    n_triples = triples.count()

    summary = {
        "command": "annotate",
        "catalog": args.catalog,
        "triples": n_triples,
        "resumed_stages": resumed,
        "computed_stages": [t for t in ("canonical", "triples") if t not in resumed],
        "snapshots": {
            t: (catalog.manifest(t) or {}).get("current") for t in stages
        },
        "evaluation": None,
    }
    if args.gold:
        from types import SimpleNamespace

        # persist_evaluation touches only .cea/.cta/.cpa (the resumable path
        # commits exactly those); a full AnnotationResult would require the
        # uncommitted intermediate frames
        result = SimpleNamespace(
            cea=catalog.read(spark, "cea"),
            cta=catalog.read(spark, "cta"),
            cpa=catalog.read(spark, "cpa"),
        )
        gold = {
            t: spark.read.parquet(os.path.join(args.gold, f"{t}.parquet"))
            for t in GOLD_TABLES
        }
        persist_evaluation(
            catalog, result, gold["gold_cea"], gold["gold_cta"], gold["gold_cpa"]
        )
        # per-table metric rows stay in the catalog; the summary line carries
        # the dataset-grain rollup (one row per task: cea/cta/cpa)
        summary["evaluation"] = {
            row["task"]: {
                "precision": round(row["precision"], 6),
                "recall": round(row["recall"], 6),
            }
            for row in catalog.read(spark, "metrics_dataset").collect()
        }
    return summary


# ---------------------------------------------------------------------------
# webprep
# ---------------------------------------------------------------------------


def cmd_webprep(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.plans.webcorpus import prep_web_corpus

    spark = _session("tabbyld-webprep")
    pages = spark.read.parquet(args.pages)
    blocklist = None
    if args.blocklist:
        with open(args.blocklist) as f:
            domains = [ln.strip() for ln in f if ln.strip() and not ln.startswith("#")]
        blocklist = spark.createDataFrame([(d,) for d in domains], "domain string")
    seqs = prep_web_corpus(
        pages,
        blocklist=blocklist,
        lang=args.lang,
        max_tokens=args.max_tokens,
        overlap=args.overlap,
        seq_len=args.seq_len,
        n_buckets=args.n_buckets,
        exact_substr_k=args.exact_substr_k,
        canonicalize_urls=args.canonicalize_urls,
        lm_nll_max=args.lm_nll_max,
        latest_only=args.latest_only,
        respect_noindex=args.respect_noindex,
        robots=(spark.read.parquet(args.robots) if args.robots else None),
    )
    seqs.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.agg(
        F.count(F.lit(1)).alias("chunks"),
        F.countDistinct("doc_id").alias("docs"),
        F.countDistinct("bucket", "pack_id").alias("packs"),
    ).collect()[0]
    return {
        "command": "webprep",
        "out": args.out,
        "chunks": agg["chunks"],
        "docs": agg["docs"],
        "packs": agg["packs"],
    }


# ---------------------------------------------------------------------------
# graph
# ---------------------------------------------------------------------------


def cmd_mix(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.operators.sampling import sample_corpus

    spark = _session("tabbyld-mix")
    docs = spark.read.parquet(args.docs)
    rates = {k: float(v) for k, v in json.loads(args.rates).items()}
    mixed = sample_corpus(
        docs, rates, key_col=args.key_col, id_col=args.id_col,
        default_rate=args.default_rate, seed=args.seed,
    )
    mixed.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(args.id_col).alias("docs"),
    ).collect()[0]
    return {
        "command": "mix",
        "out": args.out,
        "rows": agg["rows"],
        "docs": agg["docs"],
    }


def cmd_graph(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.extract.links import (
        extract_anchors,
        extract_outlinks,
        host_edges,
        top_anchor_per_host,
    )
    from tabbyld_spark.operators.components import connected_components
    from tabbyld_spark.operators.graphrank import pagerank
    from tabbyld_spark.operators.kgstats import degree_stats

    spark = _session("tabbyld-graph")
    pages = spark.read.parquet(args.pages)
    edges = host_edges(extract_outlinks(pages, drop_nofollow=args.drop_nofollow))
    cc = connected_components(edges, salt=args.salt)
    pr = pagerank(edges, iterations=args.iterations, round_to=6)
    # the published node table carries the full curation profile: component,
    # rank, directed degrees, and the host's top inbound anchor text
    nodes = (
        cc.join(pr, "node", "inner")
        .join(degree_stats(edges), "node", "left")
        .join(top_anchor_per_host(extract_anchors(pages)), "node", "left")
    )
    nodes.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    agg = out.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.countDistinct("component").alias("components"),
    ).collect()[0]
    return {
        "command": "graph",
        "out": args.out,
        "nodes": agg["nodes"],
        "components": agg["components"],
    }


# ---------------------------------------------------------------------------
# refresh (incremental annotate from a recrawl delta)
# ---------------------------------------------------------------------------


def cmd_refresh(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.operators.urls import crawl_diff
    from tabbyld_spark.plans.incremental import refresh_annotations
    from tabbyld_spark.sources.catalog import make_catalog

    spark = _session("tabbyld-refresh")
    old_pages = spark.read.parquet(args.old_pages)
    new_pages = spark.read.parquet(args.pages)
    kg = _read_kg(spark, args.kg)
    catalog = make_catalog(spark, args.catalog)

    prev = {t: catalog.read(spark, t) for t in ("cea", "cta", "cpa")}
    delta_counts = {
        r["status"]: int(r["n"])
        for r in crawl_diff(old_pages, new_pages)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cea, cta, cpa, triples = refresh_annotations(
        old_pages, new_pages, prev["cea"], prev["cta"], prev["cpa"], kg,
        fuzzy_enabled=not args.no_fuzzy,
    )
    snaps = {}
    for name, df in (("cea", cea), ("cta", cta), ("cpa", cpa),
                     ("triples", triples)):
        snaps[name] = catalog.write(
            df, name, lineage={"stage": "refresh", "delta": delta_counts}
        )
    n_triples = catalog.read(spark, "triples").count()
    return {
        "command": "refresh",
        "catalog": args.catalog,
        "delta": {s: delta_counts.get(s, 0)
                  for s in ("added", "removed", "changed", "unchanged")},
        "triples": n_triples,
        "snapshots": snaps,
    }


# ---------------------------------------------------------------------------
# diff
# ---------------------------------------------------------------------------


def cmd_diff(args: argparse.Namespace) -> dict:
    from pyspark.sql import functions as F

    from tabbyld_spark.operators.urls import crawl_diff

    spark = _session("tabbyld-diff")
    delta = crawl_diff(
        spark.read.parquet(args.old), spark.read.parquet(args.new)
    )
    delta.write.mode("overwrite").parquet(args.out)
    counts = {
        r["status"]: r["n"]
        for r in spark.read.parquet(args.out)
        .groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "command": "diff",
        "out": args.out,
        **{s: int(counts.get(s, 0))
           for s in ("added", "removed", "changed", "unchanged")},
    }


# ---------------------------------------------------------------------------
# publish
# ---------------------------------------------------------------------------


def cmd_publish(args: argparse.Namespace) -> dict:
    from tabbyld_spark.plans.kgpublish import KGPublishError, publish_kg
    from tabbyld_spark.sources.catalog import make_catalog

    spark = _session("tabbyld-publish")
    catalog = make_catalog(spark, args.catalog)
    triples = spark.read.parquet(args.triples)

    def _opt(path):
        return spark.read.parquet(path) if path else None

    try:
        res = publish_kg(
            spark,
            catalog,
            triples,
            table=args.table,
            subclass=_opt(args.subclass),
            subproperty=_opt(args.subproperty),
            domain=_opt(args.domain),
            range_=_opt(args.range),
            functional_preds=tuple(args.functional or ()),
            entity_prefix=args.entity_prefix,
            disjoint_pairs=tuple(
                tuple(p.split("|", 1)) for p in (args.disjoint or ())
            ),
            entity_prefixes=tuple(args.range_entity_prefix or ()),
            compact_target_rows=args.compact_target_rows,
        )
    except KGPublishError as e:
        return {
            "command": "publish",
            "published": False,
            "violations": e.violations[:20],
            "n_violations_reported": len(e.violations),
        }
    return {
        "command": "publish",
        "published": True,
        "table": res.table,
        "n_input": res.n_input,
        "n_derived": res.n_derived,
        "snapshot": res.snapshot,
        "compacted_snapshot": res.compacted_snapshot,
        "stats_table": res.stats_table,
    }


# ---------------------------------------------------------------------------
# inc-dedup
# ---------------------------------------------------------------------------


def cmd_inc_dedup(args: argparse.Namespace) -> dict:
    from tabbyld_spark.plans.incdedup import commit_ledger, dedup_against_ledger
    from tabbyld_spark.sources.catalog import make_catalog

    spark = _session("tabbyld-inc-dedup")
    catalog = make_catalog(spark, args.catalog)
    batch = spark.read.parquet(args.batch)
    # crash ordering (plans/incdedup.py): the accepted rows must be durable
    # BEFORE the ledger commit — a committed ledger makes a re-run of the
    # batch accept zero rows, so committing first would lose the batch if
    # the output write crashed
    res = dedup_against_ledger(
        spark,
        catalog,
        batch,
        args.batch_id,
        ledger_table=args.ledger_table,
        text_col=args.text_col,
        id_col=args.id_col,
        commit=False,
    )
    res.accepted.write.mode("overwrite").parquet(args.out)
    if not args.dry_run:
        commit_ledger(spark, catalog, res)
    return {
        "command": "inc-dedup",
        "batch_id": args.batch_id,
        "n_batch": res.n_batch,
        "n_in_batch_dupes": res.n_in_batch_dupes,
        "n_ledger_dupes": res.n_ledger_dupes,
        "n_accepted": res.n_batch - res.n_in_batch_dupes - res.n_ledger_dupes,
        "ledger_snapshot": res.ledger_snapshot,
        "out": args.out,
    }


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="job.py", description="tabbyld_spark spark-submit jobs"
    )
    sub = p.add_subparsers(dest="command", required=True)

    wi = sub.add_parser("warc-ingest", help="WARC crawl files → pages parquet")
    wi.add_argument("--warc", required=True, help="path/glob of .warc / .warc.gz files")
    wi.add_argument("--out", required=True)
    wi.set_defaults(func=cmd_warc_ingest)

    sp = sub.add_parser("synth-pages", help="write deterministic fixture input")
    sp.add_argument("--out", required=True)
    sp.add_argument("--n-pages", type=int, default=2000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--typo-rate", type=float, default=0.08)
    sp.add_argument("--partitions", type=int, default=None)
    sp.add_argument("--with-gold", action="store_true")
    sp.set_defaults(func=cmd_synth_pages)

    an = sub.add_parser("annotate", help="pages → triples with snapshot resume")
    an.add_argument("--pages", required=True)
    an.add_argument("--kg", required=True)
    an.add_argument("--catalog", required=True)
    an.add_argument("--gold", default=None)
    an.add_argument("--no-fuzzy", action="store_true")
    an.set_defaults(func=cmd_annotate)

    wp = sub.add_parser("webprep", help="pages → packed training sequences")
    wp.add_argument("--pages", required=True)
    wp.add_argument("--out", required=True)
    wp.add_argument("--blocklist", default=None, help="text file, one domain per line")
    wp.add_argument("--lang", default="en")
    wp.add_argument("--max-tokens", type=int, default=128)
    wp.add_argument("--overlap", type=int, default=16)
    wp.add_argument("--seq-len", type=int, default=2048)
    wp.add_argument("--n-buckets", type=int, default=1024)
    wp.add_argument(
        "--exact-substr-k", type=int, default=None,
        help="enable the ExactSubstr duplicate-span scrub at this window size",
    )
    wp.add_argument(
        "--robots", default=None,
        help="W1a: parquet of (host, robots_txt) — filter URLs by REP rules "
        "for agent '*' (longest match wins, allow on ties)",
    )
    wp.add_argument(
        "--respect-noindex", action="store_true",
        help="W1b: exclude pages whose robots meta declares noindex/none",
    )
    wp.add_argument(
        "--latest-only", action="store_true",
        help="W0a: collapse multiple captures of a URL to the newest "
        "(max warc_ts, deterministic md5 tiebreak) before any content work",
    )
    wp.add_argument(
        "--lm-nll-max", type=float, default=None,
        help="W3c: drop docs whose mean token NLL under the corpus-trained "
        "unigram LM exceeds this gate (CCNet-style perplexity filter)",
    )
    wp.add_argument(
        "--canonicalize-urls", action="store_true",
        help="W0: collapse URL-spelling aliases (case/ports/tracking/order/"
        "fragments) to one canonical survivor per page before any content work",
    )
    wp.set_defaults(func=cmd_webprep)

    mx = sub.add_parser("mix", help="deterministic per-key mixture sampling")
    mx.add_argument("--docs", required=True, help="input parquet of documents")
    mx.add_argument("--out", required=True)
    mx.add_argument(
        "--rates", required=True,
        help='JSON object of per-key rates, e.g. \'{"wiki": 2.0, "cc": 0.3}\'',
    )
    mx.add_argument("--key-col", default="source")
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--default-rate", type=float, default=1.0)
    mx.add_argument("--seed", default="mix")
    mx.set_defaults(func=cmd_mix)

    gr = sub.add_parser("graph", help="pages → host graph CC + PageRank")
    gr.add_argument("--pages", required=True)
    gr.add_argument("--out", required=True)
    gr.add_argument("--iterations", type=int, default=10)
    gr.add_argument("--salt", type=int, default=1)
    gr.add_argument(
        "--drop-nofollow", action="store_true",
        help="exclude rel=nofollow links from the ranked graph",
    )
    gr.set_defaults(func=cmd_graph)

    rf = sub.add_parser(
        "refresh", help="incremental annotate: re-run S1-S6 on added∪changed "
        "pages only, commit merged CEA/CTA/CPA + re-emitted triples"
    )
    rf.add_argument("--old-pages", required=True, help="previous pages parquet")
    rf.add_argument("--pages", required=True, help="current pages parquet")
    rf.add_argument("--kg", required=True)
    rf.add_argument("--catalog", required=True,
                    help="catalog of a prior annotate run (cea/cta/cpa read, "
                    "new snapshots committed)")
    rf.add_argument("--no-fuzzy", action="store_true")
    rf.set_defaults(func=cmd_refresh)

    df = sub.add_parser("diff", help="recrawl snapshot delta at URL grain")
    df.add_argument("--old", required=True, help="previous pages parquet")
    df.add_argument("--new", required=True, help="current pages parquet")
    df.add_argument("--out", required=True)
    df.set_defaults(func=cmd_diff)

    pb = sub.add_parser(
        "publish", help="triples → entail + integrity gate + snapshot commit"
    )
    pb.add_argument("--triples", required=True, help="triples parquet (subj,pred,obj)")
    pb.add_argument("--catalog", required=True)
    pb.add_argument("--table", default="kg_triples")
    pb.add_argument("--subclass", help="parquet (child,parent)")
    pb.add_argument("--subproperty", help="parquet (child,parent)")
    pb.add_argument("--domain", help="parquet (pred,cls)")
    pb.add_argument("--range", help="parquet (pred,cls)")
    pb.add_argument("--functional", nargs="*", help="functional predicate names")
    pb.add_argument("--entity-prefix", help="dangling-reference check prefix")
    pb.add_argument(
        "--disjoint", nargs="*", help="disjoint class pairs as ClassA|ClassB"
    )
    pb.add_argument(
        "--range-entity-prefix", nargs="*",
        help="prefixes marking entity objects (rdfs3 literal guard)",
    )
    pb.add_argument("--compact-target-rows", type=int, default=1_000_000)
    pb.set_defaults(func=cmd_publish)

    idp = sub.add_parser(
        "inc-dedup", help="dedup a batch against the committed content ledger"
    )
    idp.add_argument("--batch", required=True, help="batch parquet")
    idp.add_argument("--batch-id", required=True)
    idp.add_argument("--catalog", required=True)
    idp.add_argument("--out", required=True, help="accepted-rows parquet")
    idp.add_argument("--ledger-table", default="content_ledger")
    idp.add_argument("--text-col", default="text")
    idp.add_argument("--id-col", default="doc_id")
    idp.add_argument("--dry-run", action="store_true")
    idp.set_defaults(func=cmd_inc_dedup)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _emit(args.func(args))
    return 0


if __name__ == "__main__":
    sys.exit(main())
