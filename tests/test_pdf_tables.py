"""PDF positional-layout table detection (sources/pdf_layout.py).

Round-trip tests run the positional writer's output through detection;
the hand-written fixtures break that circularity: they use operator
shapes the writer never emits (relative ``Td`` cell walks, uncompressed
streams, ``/Contents`` arrays, ``re``-drawn grids, fonts declared before
pages) with geometry verified by hand against ISO 32000-1 §9.4.
"""

import pytest

from memvid_spark.sources.pdf_layout import (
    cluster_values,
    merge_multi_page_tables,
    pdf_extract_tables,
    pdf_from_table,
    pdf_layout,
)

HDR = ["item", "qty", "price"]


def _rows(n, d=7):
    return [
        [f"it{d}_{i}", str(d + i), f"{d + i}.5"] for i in range(1, n + 1)
    ]


# --- round trips ---------------------------------------------------------


def test_stream_single_page_round_trip():
    t, = pdf_extract_tables(pdf_from_table(HDR, _rows(4)))
    assert (t["mode"], t["page_start"], t["page_end"]) == ("stream", 1, 1)
    assert t["headers"] == HDR
    assert t["rows"] == _rows(4)
    assert (t["n_rows"], t["n_cols"]) == (4, 3)


def test_lattice_round_trip():
    t, = pdf_extract_tables(pdf_from_table(HDR, _rows(3), ruled=True))
    assert t["mode"] == "lattice"
    assert t["headers"] == HDR
    assert t["rows"] == _rows(3)


@pytest.mark.parametrize("ruled", [False, True])
def test_multi_page_continuation_merges(ruled):
    """A 5-row table at 3 rows/page prints on 2 pages with the header
    reprinted; extraction must return ONE logical table spanning both
    pages with the repeated header dropped (src/table/multi_page.rs)."""
    payload = pdf_from_table(HDR, _rows(5), rows_per_page=3, ruled=ruled)
    tables = pdf_extract_tables(payload)
    assert len(tables) == 1
    t = tables[0]
    assert (t["page_start"], t["page_end"]) == (1, 2)
    assert t["headers"] == HDR
    assert t["rows"] == _rows(5)


def test_no_merge_across_different_column_counts():
    a = {"page_start": 1, "page_end": 1, "mode": "stream", "headers": ["a", "b"],
         "rows": [["1", "2"]], "n_rows": 1, "n_cols": 2, "quality": 0.8}
    b = {"page_start": 2, "page_end": 2, "mode": "stream", "headers": ["x", "y", "z"],
         "rows": [["1", "2", "3"]], "n_rows": 1, "n_cols": 3, "quality": 0.8}
    assert len(merge_multi_page_tables([a, b])) == 2


def test_no_merge_nonconsecutive_pages():
    a = {"page_start": 1, "page_end": 1, "mode": "stream", "headers": ["a", "b"],
         "rows": [["1", "2"]], "n_rows": 1, "n_cols": 2, "quality": 0.8}
    b = {"page_start": 4, "page_end": 4, "mode": "stream", "headers": ["a", "b"],
         "rows": [["3", "4"]], "n_rows": 1, "n_cols": 2, "quality": 0.8}
    assert len(merge_multi_page_tables([a, b])) == 2


def test_cells_with_pdf_special_chars_round_trip():
    rows = [["a(1)", "b\\c", "50"], ["d(2)", "e\\f", "60"]]
    t, = pdf_extract_tables(pdf_from_table(["n", "v", "w"], rows))
    assert t["rows"] == rows


def test_cluster_values():
    assert cluster_values([10.0, 11.0, 12.0, 50.0, 51.0, 100.0], 5.0) == [
        11.0, 50.5, 100.0,
    ]
    assert cluster_values([], 5.0) == []


# --- geometry evaluator --------------------------------------------------


def test_tj_kerning_advances_cursor():
    """A large negative TJ adjustment moves the cursor right by
    adj/1000 × size (ISO 32000-1 §9.4.4) — two runs in one TJ land as
    two boxes with a real gap between them."""
    content = b"BT /F1 10 Tf 1 0 0 1 100 500 Tm [(ab) -2000 (cd)] TJ ET"
    pdf = _envelope([content])
    (lay,) = pdf_layout(pdf)
    boxes = sorted(lay["boxes"], key=lambda b: b.x)
    assert [b.text for b in boxes] == ["ab", "cd"]
    # ab: x=100 w=0.5*10*2=10 → cursor 110; gap 2000/1000*10 = 20 → cd at 130
    assert boxes[0].x == pytest.approx(100.0)
    assert boxes[1].x == pytest.approx(130.0)
    assert boxes[0].y == boxes[1].y == pytest.approx(500.0)


# --- hand-written fixtures (non-circular) --------------------------------


def _envelope(contents, fonts_first=True, contents_array=False):
    """Minimal valid multi-page envelope assembled in-test, deliberately
    NOT the writer's: font object declared before the page tree, object
    numbers in a different order, streams uncompressed, and optionally
    a /Contents ARRAY (one-element) — shapes pdf_from_table never
    produces."""
    n = len(contents)
    objs = []
    # 1 font, 2 catalog, 3 pages, 4..3+n pages, 4+n..3+2n contents
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")
    objs.append(b"<< /Type /Catalog /Pages 3 0 R >>")
    kids = b" ".join(b"%d 0 R" % (4 + i) for i in range(n))
    objs.append(b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n))
    for i in range(n):
        ref = (
            b"[%d 0 R]" % (4 + n + i) if contents_array else b"%d 0 R" % (4 + n + i)
        )
        objs.append(
            b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 1 0 R >> >> /Contents %s >>" % ref
        )
    for c in contents:
        objs.append(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(c), c))
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += b"trailer\n<< /Size %d /Root 2 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, xref_at,
    )
    return bytes(buf)


# Cells positioned by RELATIVE Td walks (never emitted by the writer,
# which uses absolute Tm): col lefts at x=72 and x=200, rows at
# y=700/680/660. Hand-traced: "128 0 Td" from (72,700) → (200,700);
# "-128 -20 Td" → (72,680); etc.
HAND_TABLE_PAGE = (
    b"BT\n/F1 12 Tf\n"
    b"72 700 Td (Name) Tj\n"
    b"128 0 Td (Score) Tj\n"
    b"-128 -20 Td (alice) Tj\n"
    b"128 0 Td (91) Tj\n"
    b"-128 -20 Td (bob) Tj\n"
    b"128 0 Td (87) Tj\n"
    b"ET"
)


def test_hand_written_td_walk_table():
    pdf = _envelope([HAND_TABLE_PAGE], contents_array=True)
    t, = pdf_extract_tables(pdf)
    assert t["mode"] == "stream"
    assert t["headers"] == ["Name", "Score"]
    assert t["rows"] == [["alice", "91"], ["bob", "87"]]


HAND_PAGE2 = (
    b"BT\n/F1 12 Tf\n"
    b"72 700 Td (Name) Tj\n"
    b"128 0 Td (Score) Tj\n"
    b"-128 -20 Td (carol) Tj\n"
    b"128 0 Td (78) Tj\n"
    b"-128 -20 Td (dave) Tj\n"
    b"128 0 Td (65) Tj\n"
    b"ET"
)


def test_hand_written_two_page_continuation():
    """Two hand-written pages, same Td-walk layout, header repeated —
    must come back as one 4-row logical table."""
    pdf = _envelope([HAND_TABLE_PAGE, HAND_PAGE2])
    tables = pdf_extract_tables(pdf)
    assert len(tables) == 1
    t = tables[0]
    assert (t["page_start"], t["page_end"]) == (1, 2)
    assert t["rows"] == [
        ["alice", "91"], ["bob", "87"], ["carol", "78"], ["dave", "65"],
    ]


# Grid drawn with `re` rectangles (writer strokes m/l paths): a 3×2
# grid of cells, each its own 100×20 rect; text centered in each cell.
# Rect edges: x ∈ {70,170,270}, y ∈ {655,675,695,715}.
HAND_LATTICE_PAGE = (
    b"BT /F1 12 Tf\n"
    b"1 0 0 1 80 700 Tm (City) Tj\n"
    b"1 0 0 1 180 700 Tm (Pop) Tj\n"
    b"1 0 0 1 80 680 Tm (Oslo) Tj\n"
    b"1 0 0 1 180 680 Tm (700) Tj\n"
    b"1 0 0 1 80 660 Tm (Bergen) Tj\n"
    b"1 0 0 1 180 660 Tm (280) Tj\n"
    b"ET\n"
    b"70 695 100 20 re S\n"
    b"170 695 100 20 re S\n"
    b"70 675 100 20 re S\n"
    b"170 675 100 20 re S\n"
    b"70 655 100 20 re S\n"
    b"170 655 100 20 re S\n"
)


def test_hand_written_re_grid_lattice():
    pdf = _envelope([HAND_LATTICE_PAGE])
    t, = pdf_extract_tables(pdf)
    assert t["mode"] == "lattice"
    assert t["headers"] == ["City", "Pop"]
    assert t["rows"] == [["Oslo", "700"], ["Bergen", "280"]]


def test_line_based_fallback_on_flowed_text():
    """Linearized label/value text (every cell its own line, no usable
    geometry spread) falls back to the 2-column pair heuristic
    (pdf_extractor.rs:608-930)."""
    from memvid_spark.sources.binary import pdf_from_text

    text = "Gross Pay\n2500.00\nFederal Tax\n312.50\nNet Pay\n2187.50"
    tables = pdf_extract_tables(pdf_from_text(text))
    assert len(tables) == 1
    t = tables[0]
    assert t["mode"] == "lines"
    assert t["rows"] == [
        ["Gross Pay", "2500.00"],
        ["Federal Tax", "312.50"],
        ["Net Pay", "2187.50"],
    ]


# --- Spark surface + routing into the sheet tier -------------------------


def test_pdf_table_cells_df(spark):
    from memvid_spark.sources.readers import (
        extract_pdf_table_cells,
        pdf_table_payloads,
    )

    docs = spark.range(0, 30).withColumnRenamed("id", "doc_id")
    cells = extract_pdf_table_cells(pdf_table_payloads(docs)).collect()
    by_doc = {}
    for r in cells:
        by_doc.setdefault(r.doc_id, []).append(r)
    # docs 1,4,...,28 selected
    assert set(by_doc) == {d for d in range(30) if d % 3 == 1}
    for d, rows in by_doc.items():
        n = d % 4 + 2
        n_cols = (d // 3) % 3 + 2
        assert len(rows) == n_cols * (n + 1)  # header + n data rows
        mode = "lattice" if d % 2 == 0 else "stream"
        assert {r.mode for r in rows} == {mode}
        assert {r.page_end for r in rows} == {2 if n > 3 else 1}
        hdr = sorted(
            (r for r in rows if r.rn == 1), key=lambda r: r.col_index
        )
        assert [r.cell for r in hdr] == [
            "item", "qty", "price", "note"
        ][:n_cols]


def test_pdf_tables_route_into_sheet_tier(spark):
    """Detected PDF tables render as sheet text and flow through the
    XLSX tier's sheet_tables + sheet_chunks unchanged — structural
    chunking is format-agnostic."""
    from memvid_spark.sources.readers import (
        pdf_sheet_texts,
        pdf_table_payloads,
        sheet_chunks,
        sheet_tables,
    )

    docs = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    sheets = pdf_sheet_texts(pdf_table_payloads(docs)).cache()
    cols = {
        (r.doc_id, r.col_index): r
        for r in sheet_tables(sheets).collect()
    }
    d = 13  # stream-mode doc (odd), n = 13 % 4 + 2 = 3 data rows
    assert cols[(d, 0)].header == "item"
    assert cols[(d, 0)].dtype == "str"
    assert cols[(d, 1)].header == "qty"
    assert cols[(d, 1)].dtype == "int"
    assert cols[(d, 2)].header == "price"
    assert cols[(d, 2)].dtype == "double"
    assert cols[(d, 0)].n_rows == 3
    chunks = sheet_chunks(sheets).filter("doc_id = 13").collect()
    assert len(chunks) == 1
    assert "[Table: t0]" in chunks[0].chunk_text
    assert "item | qty | price" in chunks[0].chunk_text
    assert "item: it13_1 | qty: 14 | price: 14.5" in chunks[0].chunk_text


# --- facade table storage (src/table/storage.rs) -------------------------


def test_put_pdf_tables_store_search_get_export(spark, tmp_path):
    """store_table semantics: meta frame + one searchable frame per data
    row, list/get reconstruction, CSV/JSON export, and persistence
    through save/open (storage.rs:44-600)."""
    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    payload = pdf_from_table(
        ["city", "population", "country"],
        [["Oslo", "700000", "Norway"], ["Bergen", "280000", "Norway"],
         ["Malmo", "350000", "Sweden"]],
    )
    tids = mv.put_pdf_tables(payload, "cities.pdf")
    assert tids == ["tbl_cities_pdf_1"]

    # summaries
    s, = mv.list_tables().collect()
    assert (s.table_id, s.source_file, s.n_rows, s.n_cols, s.mode) == (
        "tbl_cities_pdf_1", "cities.pdf", 3, 3, "stream",
    )
    assert s.headers == ["city", "population", "country"]

    # row frames are searchable documents
    hit_ids = [r.doc_id for r in mv.search("bergen", top_k=5).collect()]
    assert hit_ids
    texts = {
        r.doc_id: r.text
        for r in mv.docs().collect()
        if r.doc_id in hit_ids
    }
    assert any("280000" in t for t in texts.values())

    # exact reconstruction
    t = mv.get_table("tbl_cities_pdf_1")
    assert t["rows"][0] == ["Oslo", "700000", "Norway"]

    # exports
    csv = mv.export_table("tbl_cities_pdf_1", "csv")
    assert csv.splitlines()[0] == "city,population,country"
    assert "Malmo,350000,Sweden" in csv
    import json as _json

    recs = _json.loads(mv.export_table("tbl_cities_pdf_1", "json"))
    assert recs[1]["city"] == "Bergen"
    cols = _json.loads(mv.export_table("tbl_cities_pdf_1", "json_columns"))
    assert cols["population"] == ["700000", "280000", "350000"]

    # persistence
    path = str(tmp_path / "store")
    mv.save(path)
    back = MemvidSpark.open(spark, path)
    assert back.get_table("tbl_cities_pdf_1") == t
    assert back.export_table("tbl_cities_pdf_1", "csv") == csv

    # read-only store rejects table mutation
    ro = MemvidSpark.open(spark, path, read_only=True)
    import pytest as _pytest

    with _pytest.raises(PermissionError):
        ro.put_pdf_tables(payload, "again.pdf")


def test_extraction_options_surface():
    """TableExtractionOptions parity (types.rs:270-390): mode routing,
    max_pages truncation, min_quality filtering, find_continuation
    report."""
    from memvid_spark.sources.pdf_layout import find_continuation_candidates

    ruled = pdf_from_table(HDR, _rows(4), ruled=True)
    # lattice-only on a ruled table finds it; stream-only also works
    # (the text alignment is there regardless of ruling)
    assert pdf_extract_tables(ruled, mode="lattice")[0]["mode"] == "lattice"
    assert pdf_extract_tables(ruled, mode="stream")[0]["mode"] == "stream"
    # lattice-only on an unruled table finds nothing (no line fallback)
    assert pdf_extract_tables(pdf_from_table(HDR, _rows(4)), mode="lattice") == []
    # max_pages truncates: 5 rows at 3/page = 2 pages; page 1 alone has 3
    two_page = pdf_from_table(HDR, _rows(5), rows_per_page=3)
    t, = pdf_extract_tables(two_page, max_pages=1)
    assert (t["page_end"], t["n_rows"]) == (1, 3)
    # min_quality above lattice's 0.9 drops everything
    assert pdf_extract_tables(ruled, min_quality=0.95) == []
    # continuation candidates without merging
    parts = pdf_extract_tables(two_page, merge=False)
    assert len(parts) == 2
    cands = find_continuation_candidates(parts)
    assert cands and cands[0][:2] == (0, 1) and cands[0][2] == 1.0


def test_matrix_composition_scaling_and_rotation():
    """Full §9.4.2 matrix state: a cm scale transforms text origins and
    advances; 90°-rotated Tm places the baseline origin correctly; q/Q
    restores the CTM."""
    content = (
        b"q 2 0 0 2 10 20 cm "           # CTM: scale 2x, translate (10,20)
        b"BT /F1 10 Tf 1 0 0 1 50 100 Tm (ab) Tj ET "
        b"Q "                             # restore identity
        b"BT /F1 10 Tf 0 1 -1 0 300 400 Tm (cd) Tj ET"  # rotate 90deg
    )
    pdf = _envelope([content])
    (lay,) = pdf_layout(pdf)
    by_text = {b.text: b for b in lay["boxes"]}
    # scaled: origin (50,100) -> (2*50+10, 2*100+20) = (110, 220);
    # advance w=0.5*10*2=10 text units -> 20 device units; height 20
    ab = by_text["ab"]
    assert (ab.x, ab.y) == pytest.approx((110.0, 220.0))
    assert ab.width == pytest.approx(20.0)
    assert ab.height == pytest.approx(20.0)
    # rotated: origin at (300, 400), advance points along +y
    cd = by_text["cd"]
    assert (cd.x, cd.y) == pytest.approx((300.0, 400.0))
    assert cd.width == pytest.approx(10.0)  # device length of advance


def test_cm_scaled_table_still_detected():
    """A whole table emitted under a uniform cm scale (the common
    'work in 1/100ths then scale' generator pattern) must still
    detect — geometry is evaluated in device space."""
    inner = pdf_from_table(HDR, _rows(3))
    # rebuild the content with a wrapping scale: extract the page
    # stream, wrap in q .5 0 0 .5 36 360 cm ... Q
    from memvid_spark.sources.pdf_layout import _page_streams

    (stream,) = _page_streams(inner)
    wrapped = b"q .5 0 0 .5 36 360 cm\n" + stream + b"\nQ"
    t, = pdf_extract_tables(_envelope([wrapped]))
    assert t["headers"] == HDR
    assert t["rows"] == _rows(3)


# --- property fuzz: random tables round-trip -----------------------------

from hypothesis import given, settings, strategies as st

# printable latin-1, no control chars; cells non-blank after strip.
# Length ≤ 16 keeps estimated widths (0.5em × 12pt × 16 = 96pt) inside
# the 140pt column pitch, mirroring real tables where text fits its
# column.
_cell = st.text(
    alphabet=st.characters(
        min_codepoint=0x21, max_codepoint=0xFF,
        blacklist_characters="\x7f\x80\x81\x82\x83\x84\x85\x86\x87\x88"
        "\x89\x8a\x8b\x8c\x8d\x8e\x8f\x90\x91\x92\x93\x94\x95\x96\x97"
        "\x98\x99\x9a\x9b\x9c\x9d\x9e\x9f\xad"
        # NBSP is Unicode whitespace: an NBSP-only cell trims to empty
        # on extraction (same as the reference's Rust str::trim), so it
        # can't be a planted cell value
        "\xa0",
    ),
    min_size=1, max_size=16,
).filter(lambda s: s.strip())


@settings(max_examples=30, deadline=None)
@given(
    n_cols=st.integers(2, 4),
    n_rows=st.integers(2, 7),
    ruled=st.booleans(),
    per_page=st.sampled_from([0, 3]),
    data=st.data(),
)
def test_fuzz_table_round_trip(n_cols, n_rows, ruled, per_page, data):
    """Any table of printable-latin-1 cells that fit their columns must
    survive write→extract exactly: same headers, same cells, same
    order — across both detectors and page splits."""
    headers = [data.draw(_cell) for _ in range(n_cols)]
    rows = [
        [data.draw(_cell) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    col_x = tuple(72.0 + 140.0 * i for i in range(n_cols))
    payload = pdf_from_table(
        headers, rows, col_x=col_x,
        rows_per_page=(per_page or None), ruled=ruled,
    )
    tables = pdf_extract_tables(payload)
    assert len(tables) == 1
    t = tables[0]
    assert t["headers"] == headers
    assert t["rows"] == rows


def test_text_state_spacing_params():
    """Tc/Tw/Tz advances (§9.4.4): char spacing adds per glyph, word
    spacing per ASCII space, Tz scales horizontally — and q/Q restores
    them."""
    content = (
        b"BT /F1 10 Tf "
        b"2 Tc 3 Tw 200 Tz "
        b"1 0 0 1 100 500 Tm (a b) Tj (X) Tj ET"
    )
    pdf = _envelope([content])
    (lay,) = pdf_layout(pdf)
    a, x = sorted(lay["boxes"], key=lambda b: b.x)
    assert a.text == "a b" and x.text == "X"
    # advance of "a b": (0.5*10*3 + 2*3 + 3*1) * 2.0 = (15+6+3)*2 = 48
    assert x.x == pytest.approx(100.0 + 48.0)


def test_flowed_text_follows_page_tree_order():
    """Content objects stored in REVERSE file order still extract in
    /Kids reading order (the raw file-order scan would reverse them);
    an unreferenced BT stream (a Form XObject) is appended, not lost."""
    from memvid_spark.sources.binary import pdf_extract_text

    page1 = b"BT /F1 12 Tf 72 700 Td (first page) Tj ET"
    page2 = b"BT /F1 12 Tf 72 700 Td (second page) Tj ET"
    xobj = b"BT /F1 12 Tf 72 650 Td (form text) Tj ET"
    # hand assembly: content objects in REVERSED file order vs Kids
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 7 0 R >> >> /Contents 6 0 R >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 7 0 R >> >> /Contents 5 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(page2), page2),
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(page1), page1),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /XObject /Subtype /Form /Length %d >>\nstream\n%s\nendstream"
        % (len(xobj), xobj),
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, xref_at,
    )
    text = pdf_extract_text(bytes(buf))
    assert text.splitlines() == ["first page", "second page", "form text"]


def test_search_tables_resolves_row_hits(spark):
    """Lexical hits on stored table-row frames map back to
    (table_id, row_index) with rendered header:value text."""
    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    mv.put("an unrelated document about bergen weather")
    payload = pdf_from_table(
        ["city", "population"],
        [["Oslo", "700000"], ["Bergen", "280000"]],
    )
    mv.put_pdf_tables(payload, "cities.pdf")
    out = mv.search_tables("bergen", top_k=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.table_id, r.row_index) == ("tbl_cities_pdf_1", 1)
    assert r.row_text == "city: Bergen | population: 280000"


@pytest.mark.parametrize("ruled", [False, True])
def test_landscape_rotated_table_detected(ruled):
    """A table drawn under the standard landscape rotation
    (0 1 -1 0 cm, 90° CCW) detects via the axis-swap retry — both
    detectors, exact cells."""
    from memvid_spark.sources.pdf_layout import _page_streams

    inner = pdf_from_table(HDR, _rows(3), ruled=ruled)
    (stream,) = _page_streams(inner)
    wrapped = b"q 0 1 -1 0 612 0 cm\n" + stream + b"\nQ"
    t, = pdf_extract_tables(_envelope([wrapped]))
    assert t["headers"] == HDR
    assert t["rows"] == _rows(3)


def test_clockwise_rotated_table_detected():
    """The opposite rotation direction (90° CW, baselines along −y)
    un-rotates with the mirrored transform."""
    from memvid_spark.sources.pdf_layout import _page_streams

    inner = pdf_from_table(HDR, _rows(3), ruled=True)
    (stream,) = _page_streams(inner)
    wrapped = b"q 0 -1 1 0 0 792 cm\n" + stream + b"\nQ"
    t, = pdf_extract_tables(_envelope([wrapped]))
    assert t["headers"] == HDR
    assert t["rows"] == _rows(3)


def test_inline_image_bytes_do_not_tokenize():
    """Raw inline-image sample data containing operator-lookalike bytes
    ("(junk) Tj") must be skipped in both evaluators (§8.9.7)."""
    from memvid_spark.sources.binary import pdf_extract_text

    img = b"BI /W 4 /H 2 /BPC 8 /CS /G ID \x00(junk) Tj 5 5 Td\xff\x01 EI"
    content = (
        b"BT /F1 12 Tf 72 700 Td (before) Tj ET\n"
        + img
        + b"\nBT /F1 12 Tf 72 680 Td (after) Tj ET"
    )
    pdf = _envelope([content])
    (lay,) = pdf_layout(pdf)
    assert [b.text for b in lay["boxes"]] == ["before", "after"]
    assert pdf_extract_text(pdf).splitlines() == ["before", "after"]


def test_prose_pages_yield_no_tables():
    """A text-only PDF must NOT produce a table: one line cluster fails
    min_rows in stream mode, and prose has no label/value pairs for the
    line fallback."""
    from memvid_spark.sources.binary import pdf_from_text

    prose = "\n".join([
        "The quarterly report shows steady growth across regions.",
        "Revenue climbed in the third fiscal quarter by a wide margin.",
        "Management expects continued expansion next year.",
        "Operating costs remained flat despite inflation pressure.",
    ])
    assert pdf_extract_tables(pdf_from_text(prose)) == []
