"""tabbyld_spark — a from-scratch PySpark-native re-imagining of TabbyLD's
semantic table interpretation (STI) as a web-scale knowledge-graph
construction pipeline.

Reference behavior: tabbydoc/tabbyld (PHP/Yii2/PostgreSQL/DBpedia-SPARQL),
surveyed in /root/repo/SURVEY.md.  This package re-expresses the reference's
*semantics* — candidate generation, five-feature heuristic entity ranking,
CEA/CTA/CPA annotation, triple emission — as declarative Spark DataFrame
plans (Catalyst-optimizable), with exactly one Arrow-vectorized pandas UDF
(HTML → text extraction) on the hot path.

Layout:
    functions/   column-expression builders (normalization, text stats, vectors)
    extract/     HTML → text + table-region extraction (pandas UDF)
    fixtures/    deterministic synthetic data generators (pages, KG, gold)
    operators/   pipeline operators (mentions, candidates, features, CEA/CTA/CPA,
                 dedup, similarity search, connected components, closure)
    sources/     table-format abstraction (parquet + manifest snapshots, resume)
    plans/       end-to-end pipeline orchestration
    streaming/   incremental ingest (Structured Streaming)
"""

__version__ = "0.1.0"
