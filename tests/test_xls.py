"""Legacy .xls (CFB + BIFF8) codec pins: writer→reader round trips,
CONTINUE-spill SST, mini vs regular stream placement, and — critically
— hand-assembled spec bytes the writer never emits (RK, MULRK, LABEL,
FORMULA cached results), so reader conformance is not self-referential.
Reference surface: src/reader/xls.rs (calamine-backed)."""

from __future__ import annotations

import struct

import pytest

from memvid_spark.sources import xls as X


def test_roundtrip_strings_numbers_bools_multisheet():
    sheets = [
        ("Alpha", [["name", "qty", "ok"],
                   ["widget", "42", "true"],
                   ["gizmo", "3.5", "false"],
                   ["", "", ""]]),
        ("Beta", [["hello, world"], ["second line"]]),
    ]
    assert X.xls_extract_rows(X.xls_from_rows(sheets)) == sheets


def test_roundtrip_text_identity():
    t = "line one\n42\ntrue\nlast, comma\n\nafter blank"
    assert X.xls_extract_text(X.xls_from_text(t)) == t


def test_mini_stream_placement_small_file():
    b = X.xls_from_rows([("S", [["tiny"]])])
    cfb = X.CfbFile(b)
    entry = next(e for e in cfb.entries if e["name"] == "Workbook")
    assert entry["size"] < X.MINI_CUTOFF  # stored via miniFAT
    assert cfb.minifat  # miniFAT present
    assert X.xls_extract_rows(b) == [("S", [["tiny"]])]


def test_regular_stream_large_file_multi_fat():
    big = [("S", [[f"cell {i} {j} padpad" for j in range(8)]
                  for i in range(3000)])]
    b = X.xls_from_rows(big)
    assert len(b) > 512 * 128  # needs more than one FAT sector
    assert X.xls_extract_rows(b) == big


def test_sst_continue_spill_roundtrip():
    # enough distinct strings to force SST across CONTINUE records
    sheets = [("S", [[f"unique string number {i} with some padding"]
                     for i in range(600)])]
    b = X.xls_from_rows(sheets)
    assert X.xls_extract_rows(b) == sheets


def test_surrogate_pair_split_across_continue():
    sheets = [("E", [["😀" * 200 + f"tag{i}"] for i in range(200)])]
    assert X.xls_extract_rows(X.xls_from_rows(sheets)) == sheets


def _sheet_stream(cell_records: bytes) -> bytes:
    bof = X._rec(X.R_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    return bof + cell_records + X._rec(X.R_EOF, b"")


def _book_with_sheet(cell_records: bytes, sst_strings=()) -> bytes:
    """Hand-assemble a globals+sheet workbook stream from the spec —
    independent of xls_from_rows' record choices."""
    sheet = _sheet_stream(cell_records)

    def globals_stream(pos: int) -> bytes:
        g = X._rec(X.R_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        name = "Hand"
        g += X._rec(
            X.R_BOUNDSHEET,
            struct.pack("<IH", pos, 0)
            + bytes([len(name), 0])  # compressed ShortXLUnicodeString
            + name.encode("latin-1"),
        )
        if sst_strings:
            payload = struct.pack("<II", len(sst_strings), len(sst_strings))
            for s in sst_strings:
                # compressed (8-bit) flavor — writer always emits wide
                payload += struct.pack("<H", len(s)) + b"\x00" + s.encode("latin-1")
            g += X._rec(X.R_SST, payload)
        g += X._rec(X.R_EOF, b"")
        return g

    glen = len(globals_stream(0))
    return globals_stream(glen) + sheet


def test_hand_assembled_rk_mulrk_label_formula():
    def rk_int(v: int) -> int:  # 30-bit integer RK
        return ((v & 0x3FFFFFFF) << 2) | 0x02

    def rk_double(v: float) -> int:  # top 30 bits of the IEEE double
        (bits,) = struct.unpack("<Q", struct.pack("<d", v))
        return (bits >> 32) & ~0x3

    cells = b""
    # RK: integer 100 at (0,0); 1.25 (exactly representable) at (0,1)
    cells += X._rec(X.R_RK, struct.pack("<HHHI", 0, 0, 0, rk_int(100)))
    cells += X._rec(X.R_RK, struct.pack("<HHHI", 0, 1, 0, rk_double(1.25)))
    # RK with the /100 flag: 314 -> 3.14
    cells += X._rec(
        X.R_RK, struct.pack("<HHHI", 0, 2, 0, rk_int(314) | 0x01)
    )
    # MULRK: row 1, cols 0..2 = 7, 8, 9
    mulrk = struct.pack("<HH", 1, 0)
    for v in (7, 8, 9):
        mulrk += struct.pack("<HI", 0, rk_int(v))
    mulrk += struct.pack("<H", 2)
    cells += X._rec(X.R_MULRK, mulrk)
    # LABEL: inline compressed string at (2,0)
    s = "inline"
    cells += X._rec(
        X.R_LABEL,
        struct.pack("<HHH", 2, 0, 0)
        + struct.pack("<H", len(s)) + b"\x00" + s.encode("latin-1"),
    )
    # LABELSST referencing the hand-built compressed SST
    cells += X._rec(X.R_LABELSST, struct.pack("<HHHI", 2, 1, 0, 0))
    # FORMULA with cached numeric result 6.5
    cells += X._rec(
        X.R_FORMULA,
        struct.pack("<HHH", 3, 0, 0) + struct.pack("<d", 6.5) + b"\x00" * 8,
    )
    # FORMULA with cached string result + STRING record
    cells += X._rec(
        X.R_FORMULA,
        struct.pack("<HHH", 3, 1, 0)
        + bytes([0, 0, 0, 0, 0, 0, 0xFF, 0xFF])
        + b"\x00" * 8,
    )
    fs = "calc"
    cells += X._rec(
        X.R_STRING,
        struct.pack("<H", len(fs)) + b"\x00" + fs.encode("latin-1"),
    )
    # FORMULA with cached bool result true
    cells += X._rec(
        X.R_FORMULA,
        struct.pack("<HHH", 3, 2, 0)
        + bytes([1, 0, 1, 0, 0, 0, 0xFF, 0xFF])
        + b"\x00" * 8,
    )

    book = _book_with_sheet(cells, sst_strings=("from sst",))
    payload = X.cfb_write("Workbook", book)
    got = X.xls_extract_rows(payload)
    assert got == [
        ("Hand", [
            ["100", "1.25", "3.14"],
            ["7", "8", "9"],
            ["inline", "from sst"],
            ["6.5", "calc", "true"],
        ])
    ]


def test_book_stream_name_accepted():
    # BIFF5-era files use a "Book" stream name
    book = _book_with_sheet(
        X._rec(X.R_NUMBER, struct.pack("<HHH", 0, 0, 0) + struct.pack("<d", 5.0))
    )
    payload = X.cfb_write("Book", book)
    assert X.xls_extract_rows(payload) == [("Hand", [["5"]])]


def test_corrupt_payloads_fail_closed():
    with pytest.raises(X.CfbError):
        X.CfbFile(b"not a compound file at all")
    # magic-prefixed garbage must raise, not crash or return junk
    junk = X.CFB_MAGIC + bytes(range(256)) * 8
    with pytest.raises((X.CfbError, struct.error)):
        X.xls_extract_rows(junk)
    assert X.xls_extract_text(junk) is None  # text tier: error channel


def test_sniff_and_registry_routing():
    from memvid_spark.sources.readers import READERS, sniff_format

    b = X.xls_from_rows([("S", [["a", "1"]])])
    assert sniff_format(b) == "xls"
    assert READERS["xls"](b) == "a,1"
    # CFB without a Workbook stream is not an xls
    other = X.cfb_write("WordDocument", b"\x00" * 64)
    assert sniff_format(other) == "binary"
    # OOXML bytes behind an .xls name still extract (fallback chain)
    from memvid_spark.sources.binary import xlsx_from_rows

    z = xlsx_from_rows([("S", [["z", "9"]])])
    assert READERS["xls"](z) == "z,9"


def test_num_text_rendering():
    assert X.num_text(42.0) == "42"
    assert X.num_text(3.5) == "3.5"
    assert X.num_text(-0.125) == "-0.125"
    assert X.num_text(float("inf")) == "inf"
