"""XLSX workbook ingest — the reference's 3-sheet canonical-table layout as a
distributed Spark source.

Reference input (/root/reference/modules/main/models/ExcelFileForm.php:13-15;
commands/SpreadsheetController.php:522-538): one workbook per table with sheets

    CANONICAL FORM   header row DATA | RowHeading | ColumnHeading
    NER TAGS         same shape, Stanford-NER labels per cell
    DBPEDIA TAGS     gold annotations — T2Dv2 packs '<entity-uri>,"<value>"'
                     per cell (:471-473), Troy200 mirrors the canonical
                     headings positionally (:411-445)

The parser is stdlib-only (zipfile + ElementTree — no openpyxl in the
container, and none needed: an XLSX is a zip of XML).  Scale shape: a dataset
directory of many small workbooks is read with Spark's ``binaryFile`` source
and parsed inside ``mapInPandas`` — one Arrow batch of (path, bytes) in, one
batch of canonical rows out; the driver never touches file contents, so 10^6
workbooks parse across the cluster.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

SHEET_CANONICAL = "CANONICAL FORM"
SHEET_NER = "NER TAGS"
SHEET_GOLD = "DBPEDIA TAGS"

CANONICAL_SCHEMA = (
    "table_id string, row_idx int, col_idx int, data string, "
    "row_heading string, column_heading string, "
    "data_ner string, row_heading_ner string, column_heading_ner string"
)


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def read_workbook(data: bytes) -> dict[str, list[list[str]]]:
    """Parse one workbook → {sheet name: rows of cell strings}.  Handles
    shared strings, inline strings, and numeric/formula cells; absent cells
    become '' (rows are padded to the rectangle width)."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    # sheet name -> relationship id -> worksheet part path
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target").lstrip("/") for rel in rels.findall("r:Relationship", _REL_NS)
    }
    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in sst.findall("m:si", _NS):
            shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    out: dict[str, list[list[str]]] = {}
    for sheet in wb.findall("m:sheets/m:sheet", _NS):
        name = sheet.get("name")
        target = target_by_rid[sheet.get(_RID)]
        if not target.startswith("xl/"):
            target = "xl/" + target
        ws = ET.fromstring(zf.read(target))
        rows: list[list[str]] = []
        for row in ws.findall("m:sheetData/m:row", _NS):
            # Excel omits fully-empty rows from sheetData; honoring the row
            # 'r' attribute (1-based) keeps positional alignment between the
            # CANONICAL and NER sheets when their sparsity differs (the same
            # way _col_index honors cell refs).  Missing positions become
            # empty rows, padded to the rectangle width below.
            r_attr = row.get("r")
            if r_attr is not None and r_attr.isdigit():
                while len(rows) < int(r_attr) - 1:
                    rows.append([])
            cells: list[str] = []
            for c in row.findall("m:c", _NS):
                idx = _col_index(c.get("r", ""))
                if idx < 0:
                    idx = len(cells)
                while len(cells) <= idx:
                    cells.append("")
                ctype = c.get("t", "n")
                if ctype == "inlineStr":
                    is_el = c.find("m:is", _NS)
                    val = "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else ""
                else:
                    v = c.find("m:v", _NS)
                    val = v.text or "" if v is not None else ""
                    if ctype == "s":
                        val = shared[int(val)]
                cells[idx] = val
            rows.append(cells)
        # Trailing fully-empty rows have no <row> element at all, so the
        # 'r'-attribute backfill above can't see them; the sheet's declared
        # <dimension ref="A1:Cn"/> extent restores them when present.
        dim = ws.find("m:dimension", _NS)
        if dim is not None:
            m = re.search(r"(\d+)\s*$", dim.get("ref") or "")
            if m:
                while len(rows) < int(m.group(1)):
                    rows.append([])
        width = max((len(r) for r in rows), default=0)
        out[name] = [r + [""] * (width - len(r)) for r in rows]
    # Pad every sheet to the workbook's max height: the three sheets are
    # positionally parallel, and Excel drops trailing empty rows per-sheet,
    # so differing heights would silently misalign CANONICAL vs NER at the
    # tail even after the mid-sheet 'r' backfill (each sheet keeps its own
    # width; empty rows are rectangularized with '').
    max_rows = max((len(r) for r in out.values()), default=0)
    for name, rows in out.items():
        width = max((len(r) for r in rows), default=0)
        while len(rows) < max_rows:
            rows.append([""] * width)
    return out


def _keyed(rows: list[list[str]]) -> list[dict[str, str]]:
    """setFirstRecordAsKeys=true semantics: header row → dict keys."""
    if not rows:
        return []
    header = rows[0]
    return [dict(zip(header, r)) for r in rows[1:]]


def workbook_to_canonical_rows(table_id: str, data: bytes) -> list[tuple]:
    """One workbook → canonical-DataFrame rows (engine schema).  The
    reference's canonical form has a single DATA column, so col_idx is 0."""
    sheets = read_workbook(data)
    canon = _keyed(sheets.get(SHEET_CANONICAL, []))
    ner = _keyed(sheets.get(SHEET_NER, []))
    rows = []
    for i, rec in enumerate(canon):
        n = ner[i] if i < len(ner) else {}
        rows.append(
            (
                table_id,
                i,
                0,
                rec.get("DATA", ""),
                rec.get("RowHeading", ""),
                rec.get("ColumnHeading", ""),
                n.get("DATA", "NONE") or "NONE",
                n.get("RowHeading", "NONE") or "NONE",
                n.get("ColumnHeading", "NONE") or "NONE",
            )
        )
    return rows


def xlsx_dataset_to_canonical(spark: SparkSession, path_glob: str) -> DataFrame:
    """Directory of workbooks → canonical DataFrame, parsed on executors.

    ``binaryFile`` ships (path, content) splits; ``mapInPandas`` parses each
    Arrow batch with the stdlib reader.  table_id = file stem, matching the
    reference's pathinfo($file_name, PATHINFO_FILENAME) (:546)."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = re.sub(r"\.[^.]+$", "", path.rsplit("/", 1)[-1])
                out.extend(workbook_to_canonical_rows(stem, bytes(content)))
            yield pd.DataFrame(
                out,
                columns=[
                    "table_id", "row_idx", "col_idx", "data", "row_heading",
                    "column_heading", "data_ner", "row_heading_ner", "column_heading_ner",
                ],
            )

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(parse, CANONICAL_SCHEMA)


# ---------------------------------------------------------------------------
# gold parsing
# ---------------------------------------------------------------------------

def gold_rows_t2dv2(table_id: str, data: bytes) -> list[tuple]:
    """T2Dv2 gold sheet → (table_id, col_role='DATA', mention, entity).

    Reference parse (:471-473): explode(',', cell) — URI is part [0], the
    source value is part [1] with surrounding double quotes trimmed.  The
    naive comma split is a reference quirk (a value containing a comma
    truncates at it) and is preserved byte-for-byte."""
    sheets = read_workbook(data)
    rows = []
    for raw in sheets.get(SHEET_GOLD, []):
        for cell in raw:
            if not cell:
                continue
            parts = cell.split(",")
            if len(parts) < 2:
                continue
            rows.append((table_id, "DATA", parts[1].strip('"'), parts[0]))
    return rows


def gold_rows_troy200(table_id: str, data: bytes) -> list[tuple]:
    """Troy200 gold sheet (headed DATA/RowHeading/ColumnHeading, positional
    rows, headings packed with " | ") → per-part rows
    (table_id, row_idx, col_role, gold_value) for the positional compare
    (:411-445)."""
    sheets = read_workbook(data)
    out = []
    for i, rec in enumerate(_keyed(sheets.get(SHEET_GOLD, []))):
        if rec.get("DATA"):
            out.append((table_id, i, "DATA", rec["DATA"]))
        for role, col in (("ROW", "RowHeading"), ("COL", "ColumnHeading")):
            for part in (rec.get(col) or "").split(" | "):
                if part:
                    out.append((table_id, i, role, part))
    return out


def xlsx_dataset_gold_cea(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed T2Dv2 gold extraction → gold_cea-shaped DataFrame
    (table_id, col_role, mention, entity) for operators/evaluate.py."""
    import pandas as pd

    def parse(batches):
        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                stem = re.sub(r"\.[^.]+$", "", path.rsplit("/", 1)[-1])
                out.extend(gold_rows_t2dv2(stem, bytes(content)))
            yield pd.DataFrame(out, columns=["table_id", "col_role", "mention", "entity"])

    binary = spark.read.format("binaryFile").load(path_glob).select("path", "content")
    return binary.mapInPandas(
        parse, "table_id string, col_role string, mention string, entity string"
    ).filter(F.col("mention") != "")


# ---------------------------------------------------------------------------
# workbook writer (tests / round-tripping — inline strings, stdlib only)
# ---------------------------------------------------------------------------

def write_workbook(path: str, sheets: dict[str, list[list[str]]]) -> None:
    """Minimal XLSX writer: one inline-string worksheet per dict entry, in
    insertion order.  Produces files the reader (and any spreadsheet app)
    accepts; used by tests to synthesize the reference's 3-sheet layout."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    def col_ref(i: int) -> str:
        ref = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            ref = chr(65 + rem) + ref
        return ref

    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        sheet_els = "".join(
            f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_els}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, name in enumerate(names):
            rows_xml = []
            for r, row in enumerate(sheets[name], start=1):
                cells = "".join(
                    f'<c r="{col_ref(ci)}{r}" t="inlineStr"><is><t xml:space="preserve">{esc(v)}</t></is></c>'
                    for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{r}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
            )
