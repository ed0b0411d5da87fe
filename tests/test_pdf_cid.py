"""Subsetted-font (ToUnicode CMap) PDF extraction.

Two fixture sources:
- the repo's own CID writer (pdf_from_text_cid) — arbitrary-Unicode
  round-trips through Identity-H 2-byte codes;
- a HAND-WRITTEN byte-literal PDF assembled directly from the PDF 1.7
  spec (not produced by any repo writer) — breaks writer/reader
  circularity: the codes here are deliberately non-Unicode and the
  expected text is hand-mapped.
"""

from memvid_spark.sources import binary as B
from memvid_spark.sources.readers import READERS, sniff_format

# ---- hand-written fixture ------------------------------------------------
# Font F7 maps: 0001→H (bfchar), 0002→i (bfchar), 0003→'!' 0004→'"'
# (bfrange <0003><0004> base <0021>). Content shows <0001000200030004>.
_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0069>
endbfchar
1 beginbfrange
<0003> <0004> <0021>
endbfrange
endcmap end end"""

_CONTENT = b"BT\n/F7 10 Tf\n<0001000200030004> Tj\nET"

HAND_PDF = (
    b"%PDF-1.4\n"
    b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
    b"/Resources << /Font << /F7 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
    b"4 0 obj\n<< /Length " + str(len(_CONTENT)).encode() + b" >>\nstream\n"
    + _CONTENT + b"\nendstream\nendobj\n"
    b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /XYZABC+Foo "
    b"/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n"
    b"6 0 obj\n<< /Length " + str(len(_CMAP)).encode() + b" >>\nstream\n"
    + _CMAP + b"\nendstream\nendobj\n"
    b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
)


def test_hand_written_cid_fixture():
    assert B.pdf_extract_text(HAND_PDF) == 'Hi!"'


def test_hand_fixture_through_reader_registry():
    assert sniff_format(HAND_PDF) == "pdf"
    assert READERS["pdf"](HAND_PDF) == 'Hi!"'


# ---- writer round-trips --------------------------------------------------


def test_cid_roundtrip_unicode():
    t = "Résumé — Σπαρκ 日本語\nsecond líne\tokay"
    for compress in (False, True):
        assert B.pdf_extract_text(B.pdf_from_text_cid(t, compress)) == t


def test_cid_roundtrip_exercises_bfrange():
    # introduce chars in alphabetical order so the writer emits a range
    t = "abcdef"
    payload = B.pdf_from_text_cid(t, compress=False)
    assert b"beginbfrange" in payload
    assert B.pdf_extract_text(payload) == t


def test_simple_font_tier_unaffected():
    t = "plain latin-1: caf\xe9"
    assert B.pdf_extract_text(B.pdf_from_text(t)) == t


def test_mixed_fonts_in_one_document():
    # simple font for line 1, CID font for line 2, switching via Tf
    cmap = (
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0007> <004F>\n<0008> <006B>\nendbfchar\n"
    )
    content = b"BT\n/F1 10 Tf\n(ascii) Tj\n/F2 10 Tf\n<00070008> '\nET"
    pdf = (
        b"%PDF-1.4\n"
        b"3 0 obj\n<< /Type /Page /Resources << /Font << "
        b"/F1 9 0 R /F2 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"9 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
    )
    assert B.pdf_extract_text(pdf) == "ascii\nOk"


def test_unmapped_codes_degrade_visibly():
    # code 0009 absent from the CMap: decodes as latin-1 of its bytes,
    # not dropped (honest-degradation contract)
    cmap = (
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfchar\n<0001> <0041>\nendbfchar\n"
    )
    content = b"BT\n/F2 10 Tf\n<00010009> Tj\nET"
    pdf = (
        b"%PDF-1.4\n"
        b"3 0 obj\n<< /Resources << /Font << /F2 5 0 R >> >> >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Font /ToUnicode 6 0 R >>\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(cmap)).encode() + b" >>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
    )
    assert B.pdf_extract_text(pdf) == "A\x00\x09"


# ---- /ObjStm (compressed object streams, PDF 1.5+) -----------------------
# Same CMap and content as HAND_PDF, but the page (with its /Font
# resource dict) and the font object live INSIDE a compressed object
# stream — the layout modern PDF writers actually emit. Assembled by
# hand from ISO 32000-1 §7.5.7; no repo writer produces ObjStm files.


def _objstm_pdf(compress: bool) -> bytes:
    import zlib as _z

    inner_page = (
        b"<< /Type /Page /Parent 2 0 R "
        b"/Resources << /Font << /F7 5 0 R >> >> /Contents 4 0 R >>"
    )
    inner_font = (
        b"<< /Type /Font /Subtype /Type0 /BaseFont /XYZABC+Foo "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>"
    )
    # pair table: "3 0 5 <off>" then bodies at /First
    off2 = len(inner_page) + 1
    header = b"3 0 5 " + str(off2).encode()
    first = len(header) + 1
    stm = header + b"\n" + inner_page + b"\n" + inner_font
    filt = b""
    if compress:
        stm = _z.compress(stm)
        filt = b" /Filter /FlateDecode"
    return (
        b"%PDF-1.5\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"7 0 obj\n<< /Type /ObjStm /N 2 /First " + str(first).encode()
        + filt + b" /Length " + str(len(stm)).encode() + b" >>\nstream\n"
        + stm + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(_CONTENT)).encode()
        + b" >>\nstream\n" + _CONTENT + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(_CMAP)).encode()
        + b" >>\nstream\n" + _CMAP + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )


def test_objstm_packed_font_resolves():
    for compress in (False, True):
        assert B.pdf_extract_text(_objstm_pdf(compress)) == 'Hi!"'


def test_objstm_indirect_n_skipped_gracefully():
    # /N as an indirect reference: the expander must skip, not misparse
    pdf = _objstm_pdf(False).replace(b"/N 2 /First", b"/N 8 0 R /First")
    out = B.pdf_extract_text(pdf)
    assert out == "\x00\x01\x00\x02\x00\x03\x00\x04"  # raw-code fallback
