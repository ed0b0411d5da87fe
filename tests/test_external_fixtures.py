"""Reader conformance against fixtures this repo's writers did NOT
produce — breaks the writer→reader circularity of the round-trip tests.

- PDF: a hand-written byte literal in the classic PDF-spec example shape
  (uncompressed content stream, ``TJ`` kerning arrays, ``TD``/``T*``
  line ops, font object declared before the content stream) — none of
  which the repo's writer emits (pdf_from_text uses Flate + Tj/').
- XLSX: a hand-assembled OOXML container using sharedStrings (the repo's
  writer emits inlineStr), multi-run <si> entries, out-of-order sheet
  declaration in workbook.xml, r-less cells, row gaps, and a two-letter
  (AA) column reference.

Expected outputs are hand-verified from the bytes, not regenerated.
"""

import io
import zipfile

from memvid_spark.sources import binary as B
from memvid_spark.sources.readers import READERS, sniff_format

# --- PDF -----------------------------------------------------------------

HAND_PDF = (
    b"%PDF-1.4\n"
    b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]\n"
    b"   /Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Times-Roman >>\nendobj\n"
    b"5 0 obj\n<< /Length 178 >>\nstream\n"
    b"BT\n"
    b"/F1 24 Tf\n"
    b"100 700 Td\n"
    b"[(Quar) 8 (terly) -120 ( revenue climbed)] TJ\n"
    b"0 -28 TD\n"
    b"(in the third fiscal quarter.) Tj\n"
    b"T*\n"
    b"(Final line via star.) Tj\n"
    b"ET\n"
    b"endstream\nendobj\n"
    b"xref\n0 6\n"
    b"0000000000 65535 f \n"
    b"0000000009 00000 n \n"
    b"0000000058 00000 n \n"
    b"0000000115 00000 n \n"
    b"0000000241 00000 n \n"
    b"0000000312 00000 n \n"
    b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n545\n%%EOF\n"
)

HAND_PDF_TEXT = (
    "Quarterly revenue climbed\n"
    "in the third fiscal quarter.\n"
    "Final line via star."
)


def test_hand_written_pdf_extracts():
    assert sniff_format(HAND_PDF) == "pdf"
    assert B.pdf_extract_text(HAND_PDF) == HAND_PDF_TEXT
    assert READERS["pdf"](HAND_PDF) == HAND_PDF_TEXT


# --- XLSX ----------------------------------------------------------------

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Results" sheetId="1" r:id="rId2"/>
  <sheet name="Data" sheetId="2" r:id="rId1"/>
 </sheets>
</workbook>"""

_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

# multi-run <si> (rich text) must concatenate its <t> runs
_SST = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
 <si><t>plain shared</t></si>
 <si><r><t>rich </t></r><r><t>text run</t></r></si>
</sst>"""

# A1 literal string via shared table, gap at B1, C1 rich-text shared,
# AA1 (two-letter column, index 26) numeric
_SHEET1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1">
   <c r="A1" t="s"><v>0</v></c>
   <c r="C1" t="s"><v>1</v></c>
   <c r="AA1"><v>42</v></c>
  </row>
 </sheetData>
</worksheet>"""

# starts at row 2 (row 1 must surface as an empty gap row); second cell
# carries no r attribute (positional append)
_SHEET2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="2">
   <c r="A2"><v>3.5</v></c>
   <c t="inlineStr"><is><t>unreferenced cell</t></is></c>
  </row>
 </sheetData>
</worksheet>"""


def hand_xlsx() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/sharedStrings.xml", _SST)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return buf.getvalue()


def test_hand_assembled_xlsx_extracts():
    payload = hand_xlsx()
    # no extension hint: disambiguated by the xl/ members
    assert sniff_format(payload) == "xlsx"
    sheets = B.xlsx_extract_rows(payload)
    names = [s[0] for s in sheets]
    # workbook.xml declaration order, not part-name order
    assert names == ["Results", "Data"]
    results_rows = sheets[0][1]
    assert results_rows[0] == []  # row 1 gap
    assert results_rows[1] == ["3.5", "unreferenced cell"]
    data_rows = sheets[1][1]
    assert len(data_rows) == 1
    row = data_rows[0]
    assert len(row) == 27  # AA occupies index 26
    assert row[0] == "plain shared"
    assert row[1] == ""  # B1 gap filled
    assert row[2] == "rich text run"  # multi-run si concatenated
    assert row[26] == "42"
    assert all(v == "" for v in row[3:26])


def test_hand_assembled_xlsx_reader_text():
    text = READERS["xlsx"](hand_xlsx())
    assert "plain shared" in text and "rich text run" in text
    assert "unreferenced cell" in text and "42" in text
