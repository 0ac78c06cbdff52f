"""Minimal stdlib xlsx reader (S1 Excel ingest, reference pro.py:34-44).

An .xlsx file is a zip of XML parts; the subset a tabular ingest needs
is tiny: the first worksheet's ``<row>/<c>`` cells plus the shared-string
table.  Vendoring that subset (zipfile + ElementTree, ~100 lines) lets
the reference's actual input format run with no optional dependency —
the container ships neither openpyxl nor any spreadsheet engine.

Scope (documented, deliberate):
- first worksheet only (workbook order, resolved through the rels part);
- cell types: shared string (t="s"), inline string (t="inlineStr"),
  formula-cached string (t="str"), boolean (t="b"), numeric (default);
- styles/number-formats are NOT interpreted — date cells surface as
  their raw Excel serial numbers (converting them is the caller's rule,
  as in the reference, which reads values row-wise the same way);
- header row 1, data rows 2+, all-empty rows skipped (P5), mirroring
  pro.py's iter_rows usage.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _local(tag: str) -> str:
    """Strip the XML namespace — spreadsheetml producers vary the prefix."""
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 (base-26 bijective column letters)."""
    m = _CELL_REF.match(ref)
    letters = m.group(1) if m else ref
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(data)
    out: list[str] = []
    for si in root:
        # plain <si><t>…</t></si> or rich-text runs <si><r><t>…</t></r>…
        texts = [
            el.text or "" for el in si.iter() if _local(el.tag) == "t"
        ]
        out.append("".join(texts))
    return out


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet in workbook order via the rels part;
    fall back to the conventional path when either part is absent."""
    try:
        wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
        rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except KeyError:
        return "xl/worksheets/sheet1.xml"
    targets = {}
    for rel in rels:
        targets[rel.get("Id")] = rel.get("Target", "")
    for el in wb.iter():
        if _local(el.tag) == "sheet":
            rid = next(
                (v for k, v in el.attrib.items() if k.endswith("}id")), None
            )
            target = targets.get(rid, "")
            if target:
                target = target.lstrip("/")
                if not target.startswith("xl/"):
                    target = "xl/" + target
                return target
    return "xl/worksheets/sheet1.xml"


def _cell_value(cell, shared: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(
            el.text or "" for el in cell.iter() if _local(el.tag) == "t"
        )
    v = next((el for el in cell if _local(el.tag) == "v"), None)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return shared[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text.strip() in ("1", "true", "TRUE")
    return float(v.text)


def read_xlsx_rows(path: str) -> tuple[list[str], list[list]]:
    """Parse the first worksheet into (header, data_rows).

    Header = row 1 (cells stringified); data rows are padded/truncated to
    the header width; rows whose every cell is empty are skipped (P5)."""
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        sheet = ElementTree.fromstring(zf.read(_first_sheet_path(zf)))
    raw: list[list] = []
    for row in sheet.iter():
        if _local(row.tag) != "row":
            continue
        cells: dict[int, object] = {}
        for cell in row:
            if _local(cell.tag) != "c":
                continue
            ref = cell.get("r")
            idx = _col_index(ref) if ref else len(cells)
            cells[idx] = _cell_value(cell, shared)
        width = max(cells) + 1 if cells else 0
        raw.append([cells.get(i) for i in range(width)])
    if not raw:
        return [], []
    header = ["" if v is None else str(v) for v in raw[0]]
    width = len(header)
    rows = []
    for r in raw[1:]:
        r = (r + [None] * width)[:width]
        if all(v is None or v == "" for v in r):
            continue  # P5: all-empty rows skipped
        rows.append(r)
    return header, rows


def write_minimal_xlsx(
    path: str, header: list[str], rows: list[list]
) -> None:
    """Write a minimal valid single-sheet xlsx (inline strings + numbers,
    stdlib only).  Exists so fixtures and round-trip tests can produce
    the reference's input format inside this container; not a styling-
    complete writer."""

    def esc(s: str) -> str:
        return (
            str(s)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>'

    def col_letters(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    all_rows = [list(header)] + [list(r) for r in rows]
    rows_xml = []
    for rn, row in enumerate(all_rows, start=1):
        cells = "".join(
            cell_xml(f"{col_letters(ci)}{rn}", v) for ci, v in enumerate(row)
        )
        rows_xml.append(f'<row r="{rn}">{cells}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    sheet = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{ns}"><sheetData>{"".join(rows_xml)}</sheetData>'
        f"</worksheet>"
    )
    workbook = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
        f'<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", root_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
