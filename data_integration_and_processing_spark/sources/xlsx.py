"""Minimal stdlib XLSX reader (reference O1 parity without openpyxl).

An .xlsx file is a zip of XML parts; for the simple tabular sheets the
reference ingests (`/root/reference/PostgresDatabase.py:130` does a plain
``pd.read_excel``), zipfile + ElementTree cover the format:

- ``xl/workbook.xml``        sheet names -> relationship ids
- ``xl/_rels/workbook.xml.rels``  relationship ids -> worksheet parts
- ``xl/sharedStrings.xml``   the string pool (cells with t="s" index it)
- ``xl/worksheets/sheetN.xml``   rows of cells with A1-style references

Supported cell types: shared strings (t="s"), inline/formula strings
(t="inlineStr"/"str"), booleans (t="b"), and numbers (default). Dates are
stored as numbers with a style — style decoding is out of scope; they come
back numeric, exactly like ``pd.read_excel`` without converters on a
dateless sheet. Sparse rows (missing cells) yield None.

This is a DRIVER-SIDE reader for small control/lookup files — the same
scale posture as the reference's pandas read. Anything big should land as
CSV/parquet and use ``read_file``.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_REL_NS = {"r": "http://schemas.openxmlformats.org/package/2006/relationships"}
_R_ATTR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def xml_escape(s: str, attr: bool = False) -> str:
    """Escape text for interpolation into the hand-rolled XML templates.

    Without this, a cell value containing & < > (or a sheet name with a
    quote) writes malformed XML that ElementTree then rejects on read-back.
    """
    from xml.sax.saxutils import escape

    return escape(s, {'"': "&quot;"} if attr else {})


def _col_index(ref: str) -> int:
    """A1-style column letters -> 0-based index (A=0, Z=25, AA=26...)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell reference: {ref!r}")
    acc = 0
    for ch in m.group(1):
        acc = acc * 26 + (ord(ch) - ord("A") + 1)
    return acc - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall("m:si", _NS):
        # plain <t> or rich-text runs <r><t>; concatenate every text node
        out.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet_name: int | str) -> str:
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    targets = {rel.get("Id"): rel.get("Target") for rel in rels.findall("r:Relationship", _REL_NS)}
    sheets = wb.findall("m:sheets/m:sheet", _NS)
    if isinstance(sheet_name, int):
        if not 0 <= sheet_name < len(sheets):
            raise ValueError(f"sheet index {sheet_name} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet_name]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet_name not in by_name:
            raise ValueError(f"no sheet named {sheet_name!r}; have {sorted(by_name)}")
        chosen = by_name[sheet_name]
    target = targets[chosen.get(_R_ATTR)]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(cell: ElementTree.Element, strings: list[str]):
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in cell.iter(f"{{{_NS['m']}}}t"))
    v = cell.find("m:v", _NS)
    if v is None or v.text is None:
        return None
    if ctype == "s":
        return strings[int(v.text)]
    if ctype == "str":
        return v.text
    if ctype == "b":
        return v.text == "1"
    num = float(v.text)
    return int(num) if num.is_integer() else num


def read_xlsx_rows(path: str, sheet_name: int | str = 0) -> list[list]:
    """Parse one worksheet into a dense list of rows (lists of python
    values), padding sparse rows with None up to the widest row."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        sheet = ElementTree.fromstring(zf.read(_sheet_part(zf, sheet_name)))
        rows: list[list] = []
        width = 0
        for row_el in sheet.findall("m:sheetData/m:row", _NS):
            row: list = []
            for cell in row_el.findall("m:c", _NS):
                idx = _col_index(cell.get("r", ""))
                while len(row) < idx:
                    row.append(None)
                row.append(_cell_value(cell, strings))
            width = max(width, len(row))
            rows.append(row)
        for row in rows:
            row.extend([None] * (width - len(row)))
        return rows


def read_xlsx_pandas(path: str, sheet_name: int | str = 0):
    """Rows -> pandas frame with the first row as header (mirrors the
    ``pd.read_excel`` default the reference relies on)."""
    import pandas as pd  # noqa: PLC0415 — keep pandas off the import hot path

    rows = read_xlsx_rows(path, sheet_name)
    if not rows:
        return pd.DataFrame()
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(rows[0])]
    return pd.DataFrame(rows[1:], columns=header)


def write_minimal_xlsx(path: str, header: list, rows: list, sheet: str = "Sheet1") -> None:
    """Hand-rolled minimal .xlsx writer (no openpyxl in this container):
    shared strings for text cells, numerics/booleans inline, A1-style
    references. Produces exactly the subset read_xlsx_rows parses — used by
    tests and fixture generation for the distributed xlsx source."""
    strings: list[str] = []

    def cell(ref: str, v) -> str:
        if isinstance(v, str):
            if v not in strings:
                strings.append(v)
            return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if v is None:
            return ""
        return f'<c r="{ref}"><v>{v}</v></c>'

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(ord("A") + r) + out
        return out

    all_rows = [header, *rows]
    body = "".join(
        '<row r="%d">%s</row>'
        % (ri + 1, "".join(cell(f"{col_letter(ci)}{ri + 1}", v) for ci, v in enumerate(row)))
        for ri, row in enumerate(all_rows)
    )
    ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
    rns = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
    rid = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    sst = "".join(f"<si><t>{xml_escape(s)}</t></si>" for s in strings)
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr(
            "xl/workbook.xml",
            f'<workbook {ns} {rid}><sheets><sheet name="{xml_escape(sheet, attr=True)}" '
            f'sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships {rns}><Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr("xl/sharedStrings.xml", f"<sst {ns}>{sst}</sst>")
        z.writestr("xl/worksheets/sheet1.xml", f"<worksheet {ns}><sheetData>{body}</sheetData></worksheet>")
