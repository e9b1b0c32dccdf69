"""Minimal XLSX worksheet reader — standard library only.

The reference reads Excel workbooks through openpyxl
(betl/io/excelIO.py:4-35); that library isn't in this container, but an
``.xlsx`` file is just a zip of SpreadsheetML XML, so the live read
path is implemented with ``zipfile`` + ``xml.etree``: sheet-name →
sheet-part lookup via ``xl/workbook.xml`` and its rels, shared and
inline strings resolved, and sparse cells re-densified from their
A1-style refs. Fully-empty rows (which SpreadsheetML simply omits)
come back as empty lists so the caller's stop-at-first-empty-row rule
(excelIO.py:18-24) sees them.

Driver-side by design: workbook inputs are small config/mapping sheets
(the reference's use), not bulk data — bulk data arrives as
CSV/parquet/JDBC and goes straight to executors.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _col_index(cell_ref: str) -> int | None:
    """'C7' → 2 (0-based column). None if the cell has no ref."""
    m = re.match(r"([A-Z]+)[0-9]*$", cell_ref or "")
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    # each <si> may hold one <t> or rich-text runs of <r><t>; concat runs
    return [
        "".join(t.text or "" for t in si.iter(f"{_NS}t"))
        for si in root.findall(f"{_NS}si")
    ]


def _sheet_part(z: zipfile.ZipFile, worksheet: str) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    targets = {r.get("Id"): r.get("Target") for r in rels}
    names = []
    for sh in wb.iter(f"{_NS}sheet"):
        names.append(sh.get("name"))
        if sh.get("name") == worksheet:
            target = targets[sh.get(f"{_REL}id")]
            return target if target.startswith("xl/") else "xl/" + target.lstrip("/")
    raise KeyError(f"worksheet {worksheet!r} not in workbook; have {names}")


def _cell_value(c: ET.Element, shared: list[str]) -> str | None:
    t = c.get("t")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t"))
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    return v.text  # numbers/bools/cached formula results as stored text


def worksheet_names(path: str) -> list[str]:
    """Worksheet titles in workbook order — the EXCEL analogue of
    listing a source system's tables (reference betl/admin.py:285-336
    walks every worksheet of the schema workbook)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        return [sh.get("name") or "" for sh in wb.iter(f"{_NS}sheet")]


def read_worksheet_rows(path: str, worksheet: str) -> list[list[str | None]]:
    """All rows of one worksheet as dense lists (row-major, 0-based
    columns, ``None`` for empty cells). Row gaps in the XML are
    materialized as ``[]`` so empty-row semantics survive the sparse
    encoding."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        ws = ET.fromstring(z.read(_sheet_part(z, worksheet)))
        by_num: dict[int, list[str | None]] = {}
        fallback_num = 0
        for row in ws.iter(f"{_NS}row"):
            fallback_num = int(row.get("r") or fallback_num + 1)
            cells: dict[int, str | None] = {}
            pos = 0
            for c in row.iter(f"{_NS}c"):
                idx = _col_index(c.get("r") or "")
                pos = pos if idx is None else idx
                cells[pos] = _cell_value(c, shared)
                pos += 1
            width = max(cells) + 1 if cells else 0
            by_num[fallback_num] = [cells.get(i) for i in range(width)]
    if not by_num:
        return []
    return [by_num.get(i, []) for i in range(1, max(by_num) + 1)]
