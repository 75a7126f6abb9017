"""Deterministic Common-Crawl-style ``pages`` fixture generator.

Schema per BASELINE.json input_hint: (url string, warc_ts timestamp,
html binary, text string, lang string).  ``text`` is the *expected* extraction
output computed independently from the content model via
:func:`tabbyld_spark.extract.html.serialize_blocks`; the engine's pandas-UDF
extractor must reproduce it byte-identically from ``html`` (the per-row
invariant).

Each page embeds 0-3 relational ``<table>`` regions drawn from the KG fixture
(entities with known gold annotations): the web-scale stand-in for the
reference's canonical-form XLSX input
(/root/reference/modules/main/models/ExcelFileForm.php:13-15).  Gold
CEA/CTA/CPA mirror the reference's ``DBPEDIA TAGS`` gold sheet
(/root/reference/commands/SpreadsheetController.php:453-494).
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pandas as pd

from tabbyld_spark.extract.html import serialize_blocks
from tabbyld_spark.fixtures import words as W
from tabbyld_spark.fixtures.kg import DBO, KG, NER_INSTANCE
from tabbyld_spark.functions.normalize import normalize_entry_py

_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
_RU_WORDS = (
    "таблица данные строка столбец запрос поиск граф сущность класс метка "
    "текст страница индекс поток узел ребро значение ключ"
).split()

# scenario -> (key header, key NER, [(data header, kind, NER, cta class, cpa pred)])
# kind: 'entity' (object of the scenario relation) or literal generator name
_SCENARIOS = {
    "persons": ("Person", "PERSON", [("Birthplace", "entity", "LOCATION", "City", "birthPlace"), ("Age", "age", "NUMBER", None, None)]),
    "companies": ("Company", "ORGANIZATION", [("City", "entity", "LOCATION", "City", "locationCity"), ("Employees", "count", "NUMBER", None, None)]),
    "albums": ("Album", "NONE", [("Artist", "entity", "PERSON", "MusicalArtist", "artist"), ("Price", "money", "MONEY", None, None)]),
    "cities": ("City", "LOCATION", [("Country", "entity", "LOCATION", "Country", "country"), ("Population", "pop", "NUMBER", None, None)]),
}
_SCEN_KEYS = ["persons", "companies", "albums", "cities", "persons", "cities"]


def _typo(rng: random.Random, s: str) -> str:
    if len(s) < 5:
        return s
    i = rng.randrange(1, len(s) - 2)
    p = rng.random()
    if p < 0.4:
        return s[:i] + s[i + 1 :]
    if p < 0.8:
        return s[:i] + s[i + 1] + s[i] + s[i + 2 :]
    return s[:i] + s[i] + s[i:]


def _literal(rng: random.Random, kind: str) -> str:
    if kind == "age":
        return str(rng.randint(18, 80))
    if kind == "count":
        return str(rng.randint(10, 90000))
    if kind == "pop":
        return str(rng.randint(1000, 9000000))
    if kind == "money":
        return f"${rng.randint(5, 40)}.{rng.randint(0, 9)}9"
    raise ValueError(kind)


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


class _ScenarioPools:
    """Precomputed (subject, object) pairs per scenario, derived from the KG."""

    def __init__(self, kg: KG):
        city_set = set(kg.by_class.get("City", []))
        self.pairs = {
            "persons": kg.rel["birthPlace"],
            "companies": kg.rel["locationCity"],
            "albums": kg.rel["artist"],
            "cities": [(s, o) for s, o in kg.rel["country"] if s in city_set],
        }
        self.names = kg.names
        self.homonym_cities = [
            u for u in kg.by_class.get("City", []) if u.endswith("_(city)")
        ]
        self.homonym_pair = dict(kg.rel["country"])


def _page_content(pools: _ScenarioPools, page_id: int, seed: int, typo_rate: float):
    rng = random.Random((seed << 32) ^ (page_id * 2654435761 % 2**61))
    lang = rng.choice(["en", "en", "en", "en", "de", "fr", "es", "ru"])
    title = f"Web report {page_id}"
    words = _RU_WORDS if lang == "ru" else W.PARA_WORDS
    paras = []
    for _ in range(rng.randint(1, 3)):
        toks = [rng.choice(words) for _ in range(rng.randint(8, 25))]
        if rng.random() < 0.15:
            toks.append("R&D")
        paras.append(" ".join(toks))

    n_tables = rng.choice([0, 1, 1, 2, 2, 3])
    tables = []  # (headers, rows)
    meta = []  # per-table scenario dict for gold derivation
    for t_idx in range(n_tables):
        scen = rng.choice(_SCEN_KEYS)
        key_hdr, key_ner, data_cols = _SCENARIOS[scen]
        pool = pools.pairs[scen]
        n_rows = rng.randint(4, 10)
        picked = rng.sample(pool, min(n_rows, len(pool)))
        if scen == "cities" and pools.homonym_cities and rng.random() < 0.5:
            hc = rng.choice(pools.homonym_cities)
            picked[0] = (hc, pools.homonym_pair[hc])
        headers = [key_hdr] + [d[0] for d in data_cols]
        rows, row_meta = [], []
        for s, o in picked:
            key_name = pools.names[s]
            cells = [key_name]
            cell_meta = [(s, key_ner)]
            for hdr, kind, ner, _cta, _cpa in data_cols:
                if kind == "entity":
                    mention = pools.names[o]
                    if rng.random() < typo_rate:
                        mention = _typo(rng, mention)
                    cells.append(mention)
                    cell_meta.append((o, ner))
                else:
                    cells.append(_literal(rng, kind))
                    cell_meta.append((NER_INSTANCE[ner], ner))
            rows.append(cells)
            row_meta.append(cell_meta)
        tables.append((headers, rows))
        meta.append({"scen": scen, "t_idx": t_idx, "row_meta": row_meta})
    return {
        "lang": lang,
        "title": title,
        "paras": paras,
        "tables": tables,
        "meta": meta,
        "page_id": page_id,
    }


def _render_html(c: dict) -> bytes:
    rng = random.Random(c["page_id"] * 7919 + 13)
    out = [
        "<!DOCTYPE html>",
        f'<html lang="{c["lang"]}"><head><meta charset="utf-8">',
        f"<title>{_esc(c['title'])}</title>",
        "<style>body { font: 14px sans-serif; } table.t { border: 1px solid; }</style>",
        "</head><body>",
        f'<script type="text/javascript">var page = {c["page_id"]}; '
        'if (page >= 0) { console.log("<p>not content</p>"); }</script>',
        f'<h1 id="title">{_esc(c["title"])}</h1>',
        "<!-- fixture page: tables & text are synthetic -->",
    ]
    for i, p in enumerate(c["paras"]):
        out.append(f'<p class="para" id="p{i}">{_esc(p)}</p>')
    for headers, rows in c["tables"]:
        out.append('<table class="t"><thead><tr>')
        out.append("".join(f"<th>{_esc(h)}</th>" for h in headers))
        out.append("</tr></thead><tbody>")
        for r in rows:
            tds = []
            for cell in r:
                body = _esc(cell)
                if rng.random() < 0.2:
                    body = f"<b>{body}</b>"
                elif rng.random() < 0.1:
                    body = f'<a href="#x">{body}</a>'
                tds.append(f"<td>{body}</td>")
            out.append("<tr>" + "".join(tds) + "</tr>")
        out.append("</tbody></table>")
    out.append('<div class="footer">generated &middot; fixture</div>')
    out.append("</body></html>")
    return "\n".join(out).encode("utf-8")


def _url(page_id: int) -> str:
    return f"https://fixture.example.org/page/{page_id:08d}"


@dataclass
class PagesFixture:
    pages: pd.DataFrame        # url, warc_ts, html, text, lang
    canonical: pd.DataFrame    # reference canonical form + NER tag columns
    gold_cea: pd.DataFrame     # table_id, col_role, mention, entity
    gold_cta: pd.DataFrame     # table_id, column, class
    gold_cpa: pd.DataFrame     # table_id, col_a, col_b, pred


def gen_pages_pd(kg: KG, n_pages: int = 200, seed: int = 42, typo_rate: float = 0.08) -> PagesFixture:
    """Driver-side generation with gold tables (test scale, ≤ ~5k pages)."""
    pools = _ScenarioPools(kg)
    pages_rows, canon_rows = [], []
    cea, cta, cpa = set(), set(), set()
    for pid in range(n_pages):
        c = _page_content(pools, pid, seed, typo_rate)
        text = serialize_blocks(c["title"], c["paras"], c["tables"])
        pages_rows.append(
            (_url(pid), _BASE_TS + timedelta(seconds=pid), _render_html(c), text, c["lang"])
        )
        for (headers, rows), m in zip(c["tables"], c["meta"]):
            table_id = f"{_url(pid)}#t{m['t_idx']}"
            scen = m["scen"]
            key_hdr, key_ner, data_cols = _SCENARIOS[scen]
            # gold CTA / CPA per entity data column
            for hdr, kind, ner, cta_cls, cpa_pred in data_cols:
                if kind == "entity":
                    cta.add((table_id, hdr, DBO + cta_cls))
                    cpa.add((table_id, "RowHeading", hdr, DBO + cpa_pred))
            for r_i, (cells, cmeta) in enumerate(zip(rows, m["row_meta"])):
                key_name, (key_entity, key_ner_lab) = cells[0], cmeta[0]
                for c_i, (hdr, kind, ner, _c, _p) in enumerate(data_cols, start=1):
                    data_val = cells[c_i]
                    gold_entity, ner_lab = cmeta[c_i]
                    canon_rows.append(
                        (table_id, r_i, c_i - 1, data_val, key_name, hdr,
                         ner_lab, key_ner_lab, "NONE")
                    )
                    cea.add((table_id, "DATA", data_val, gold_entity))
                cea.add((table_id, "ROW", key_name, key_entity))
            # data-column headings that match a KG class label get heading
            # gold (the key column's header is not a ColumnHeading in
            # canonical form, so headers[0] is excluded)
            from tabbyld_spark.fixtures.kg import CLASS_TREE
            for hdr in headers[1:]:
                if hdr in CLASS_TREE:
                    cea.add((table_id, "COL", hdr, DBO + hdr))

    pages = pd.DataFrame(
        pages_rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    canonical = pd.DataFrame(
        canon_rows,
        columns=["table_id", "row_idx", "col_idx", "data", "row_heading",
                 "column_heading", "data_ner", "row_heading_ner", "column_heading_ner"],
    )
    return PagesFixture(
        pages=pages,
        canonical=canonical,
        gold_cea=pd.DataFrame(sorted(cea), columns=["table_id", "col_role", "mention", "entity"]),
        gold_cta=pd.DataFrame(sorted(cta), columns=["table_id", "column", "class"]),
        gold_cpa=pd.DataFrame(sorted(cpa), columns=["table_id", "col_a", "col_b", "pred"]),
    )


def gen_pages_df(spark, kg: KG, n_pages: int, seed: int = 42, typo_rate: float = 0.08,
                 partitions: int | None = None):
    """Distributed generation (bench scale) — one Arrow batch per id-range
    slice; content is a pure function of (seed, page_id) so any partitioning
    yields identical rows."""
    pools = _ScenarioPools(kg)
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen_batches(batches):
        for pdf in batches:
            rows = []
            for pid in pdf["id"]:
                c = _page_content(pools, int(pid), seed, typo_rate)
                rows.append(
                    (
                        _url(int(pid)),
                        _BASE_TS + timedelta(seconds=int(pid)),
                        _render_html(c),
                        serialize_blocks(c["title"], c["paras"], c["tables"]),
                        c["lang"],
                    )
                )
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (
        spark.range(0, n_pages, numPartitions=parts)
        .mapInPandas(gen_batches, "url string, warc_ts timestamp, html binary, text string, lang string")
    )
