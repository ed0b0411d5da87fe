"""Legacy Excel 97-2003 (.xls) codec: CFB compound-file container +
BIFF8 workbook stream, pure stdlib, reader AND writer.

Reference parity: ``src/reader/xls.rs`` reads .xls via calamine and
renders per-sheet cell text; this module implements the same surface
from scratch against the public [MS-CFB] and [MS-XLS] specifications.
The extracted shape matches the engine's .xlsx tier
(sources/binary.py::xlsx_extract_rows): ``[(sheet_name, rows)]`` with
gap cells filled ``''``, so the sheet-table detector and structural
chunker work on .xls input unchanged.

Coverage (reader): CFB v3 with DIFAT chains, FAT chains, directory
tree, mini-stream; BIFF8 globals (SST with CONTINUE spill, BOUNDSHEET)
and worksheet substreams (LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR,
FORMULA cached results + STRING). Writer emits a minimal valid CFB +
BIFF8 file (SST strings, NUMBER, BOOLERR) used for fixtures and the
put_bytes round-trip; the reader is additionally pinned against
hand-assembled spec bytes the writer did not produce.
"""

from __future__ import annotations

import struct

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
MINI_CUTOFF = 4096


# ---------------------------------------------------------------------------
# CFB container — reader
# ---------------------------------------------------------------------------


class CfbError(ValueError):
    pass


def _u32s(data: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(data) // 4}I", data[: len(data) // 4 * 4]))


class CfbFile:
    """Minimal [MS-CFB] reader: directory + stream extraction."""

    def __init__(self, payload: bytes) -> None:
        if not payload.startswith(CFB_MAGIC):
            raise CfbError("not a compound file (bad magic)")
        if len(payload) < 512:
            raise CfbError("truncated compound file header")
        (sector_shift,) = struct.unpack_from("<H", payload, 30)
        (mini_shift,) = struct.unpack_from("<H", payload, 32)
        self.sec = 1 << sector_shift
        self.mini = 1 << mini_shift
        (self.n_fat,) = struct.unpack_from("<I", payload, 44)
        (self.first_dir,) = struct.unpack_from("<I", payload, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", payload, 56)
        (self.first_minifat,) = struct.unpack_from("<I", payload, 60)
        (self.n_minifat,) = struct.unpack_from("<I", payload, 64)
        (self.first_difat,) = struct.unpack_from("<I", payload, 68)
        (self.n_difat,) = struct.unpack_from("<I", payload, 72)
        self.payload = payload

        # DIFAT: 109 entries in the header, then a chained overflow
        difat = _u32s(payload[76:512])
        sect = self.first_difat
        for _ in range(self.n_difat):
            if sect in (ENDOFCHAIN, FREESECT):
                break
            raw = self._sector(sect)
            entries = _u32s(raw)
            difat.extend(entries[:-1])
            sect = entries[-1]
        self.fat: list[int] = []
        for fs in difat[: self.n_fat]:
            if fs == FREESECT:
                break
            self.fat.extend(_u32s(self._sector(fs)))

        # directory entries
        self.entries: list[dict] = []
        for raw in self._chain_sectors(self.first_dir):
            for off in range(0, self.sec, 128):
                e = raw[off : off + 128]
                if len(e) < 128:
                    break
                (name_len,) = struct.unpack_from("<H", e, 64)
                etype = e[66]
                if etype == 0:
                    continue
                name = e[: max(name_len - 2, 0)].decode("utf-16-le", "replace")
                (start,) = struct.unpack_from("<I", e, 116)
                (size,) = struct.unpack_from("<Q", e, 120)
                self.entries.append(
                    {"name": name, "type": etype, "start": start,
                     "size": size & 0xFFFFFFFF}
                )
        root = next((e for e in self.entries if e["type"] == 5), None)
        if root is None:
            raise CfbError("no root directory entry")
        self._ministream = self._read_chain(root["start"], root["size"])
        self.minifat: list[int] = []
        for raw in self._chain_sectors(self.first_minifat):
            self.minifat.extend(_u32s(raw))

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.sec
        raw = self.payload[off : off + self.sec]
        if len(raw) < self.sec:
            raise CfbError(f"sector {n} out of bounds")
        return raw

    def _chain_sectors(self, start: int):
        sect, seen = start, 0
        while sect not in (ENDOFCHAIN, FREESECT):
            if seen > len(self.payload) // 64:
                raise CfbError("FAT chain cycle")
            yield self._sector(sect)
            if sect >= len(self.fat):
                raise CfbError("chain beyond FAT")
            sect = self.fat[sect]
            seen += 1

    def _read_chain(self, start: int, size: int) -> bytes:
        out = b"".join(self._chain_sectors(start))
        return out[:size]

    def _read_mini(self, start: int, size: int) -> bytes:
        out, sect, seen = [], start, 0
        while sect not in (ENDOFCHAIN, FREESECT):
            if seen > len(self._ministream) // 8 + 16:
                raise CfbError("miniFAT chain cycle")
            out.append(self._ministream[sect * self.mini : (sect + 1) * self.mini])
            if sect >= len(self.minifat):
                raise CfbError("chain beyond miniFAT")
            sect = self.minifat[sect]
            seen += 1
        return b"".join(out)[:size]

    def stream_names(self) -> list[str]:
        return [e["name"] for e in self.entries if e["type"] == 2]

    def stream(self, name: str) -> bytes:
        e = next(
            (x for x in self.entries if x["type"] == 2 and x["name"] == name),
            None,
        )
        if e is None:
            raise CfbError(f"no stream {name!r}")
        if e["size"] < self.mini_cutoff:
            return self._read_mini(e["start"], e["size"])
        return self._read_chain(e["start"], e["size"])


# ---------------------------------------------------------------------------
# CFB container — writer (one stream, v3 layout, proper mini stream)
# ---------------------------------------------------------------------------


def cfb_write(stream_name: str, data: bytes) -> bytes:
    """Minimal valid CFB v3 holding one stream. Streams below the 4096
    cutoff go through the mini stream + miniFAT as the spec requires."""
    sec, mini = 512, 64
    use_mini = len(data) < MINI_CUTOFF

    def pad(b: bytes, unit: int) -> bytes:
        rem = len(b) % unit
        return b if rem == 0 else b + b"\x00" * (unit - rem)

    if use_mini:
        ministream = pad(data, mini)
        n_minisect = len(ministream) // mini
        mini_regular = pad(ministream, sec)
        n_mini_regular = len(mini_regular) // sec
        stream_sectors = b""
        n_stream_sectors = 0
    else:
        ministream = b""
        n_minisect = 0
        mini_regular = b""
        n_mini_regular = 0
        stream_sectors = pad(data, sec)
        n_stream_sectors = len(stream_sectors) // sec

    # sector layout: [FAT sectors][directory][miniFAT (if mini)], then
    # data sectors (ministream or the stream itself). FAT sector count
    # depends on the total, so iterate to a fixed point; the header
    # DIFAT carries up to 109 FAT sector ids (plenty — no DIFAT chain).
    has_minifat = 1 if use_mini else 0
    n_data = n_mini_regular if use_mini else n_stream_sectors
    per_fat = sec // 4
    n_fat = 1
    while n_fat * per_fat < n_fat + 1 + has_minifat + n_data:
        n_fat += 1
    if n_fat > 109:
        raise CfbError("cfb_write: header-DIFAT limit exceeded")
    dir_sect = n_fat
    minifat_sect = n_fat + 1 if use_mini else ENDOFCHAIN
    first_data = n_fat + 1 + has_minifat
    n_sectors = first_data + n_data

    fat = [FREESECT] * (n_fat * per_fat)
    for i in range(n_fat):
        fat[i] = FATSECT
    fat[dir_sect] = ENDOFCHAIN  # directory: one sector
    if use_mini:
        fat[minifat_sect] = ENDOFCHAIN  # miniFAT: one sector
    for i in range(first_data, n_sectors):
        fat[i] = i + 1 if i + 1 < n_sectors else ENDOFCHAIN

    def dirent(
        name: str, etype: int, color: int, left: int, right: int,
        child: int, start: int, size: int,
    ) -> bytes:
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = nm.ljust(64, b"\x00")
        e += struct.pack("<H", len(nm))
        e += bytes([etype, color])
        e += struct.pack("<III", left, right, child)
        e += b"\x00" * 16  # CLSID
        e += b"\x00" * 4  # state bits
        e += b"\x00" * 16  # create/modify times
        e += struct.pack("<IQ", start, size)
        return e

    root_start = first_data if use_mini else ENDOFCHAIN
    root_size = len(ministream)
    strm_start = 0 if use_mini else first_data
    directory = (
        dirent("Root Entry", 5, 1, NOSTREAM, NOSTREAM, 1, root_start, root_size)
        + dirent(stream_name, 2, 1, NOSTREAM, NOSTREAM, NOSTREAM,
                 strm_start, len(data))
    )
    directory = directory.ljust(sec, b"\x00")

    minifat = b""
    if use_mini:
        entries = [FREESECT] * (sec // 4)
        for i in range(n_minisect):
            entries[i] = i + 1 if i + 1 < n_minisect else ENDOFCHAIN
        minifat = struct.pack(f"<{len(entries)}I", *entries)

    header = CFB_MAGIC
    header += b"\x00" * 16  # CLSID
    header += struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
    header += struct.pack("<H", 0xFFFE)  # little-endian
    header += struct.pack("<HH", 9, 6)  # sector 512, mini 64
    header += b"\x00" * 6
    header += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    header += struct.pack("<I", n_fat)
    header += struct.pack("<I", dir_sect)
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", MINI_CUTOFF)
    header += struct.pack("<I", minifat_sect)
    header += struct.pack("<I", has_minifat)
    header += struct.pack("<I", ENDOFCHAIN)  # first DIFAT sector
    header += struct.pack("<I", 0)  # num DIFAT sectors
    difat = list(range(n_fat)) + [FREESECT] * (109 - n_fat)
    header += struct.pack("<109I", *difat)
    assert len(header) == 512

    body = struct.pack(f"<{len(fat)}I", *fat) + directory + minifat
    body += mini_regular if use_mini else stream_sectors
    return header + body


# ---------------------------------------------------------------------------
# BIFF8 — reader
# ---------------------------------------------------------------------------

R_BOF = 0x0809
R_EOF = 0x000A
R_SST = 0x00FC
R_CONTINUE = 0x003C
R_BOUNDSHEET = 0x0085
R_LABELSST = 0x00FD
R_LABEL = 0x0204
R_NUMBER = 0x0203
R_RK = 0x027E
R_MULRK = 0x00BD
R_BOOLERR = 0x0205
R_FORMULA = 0x0006
R_STRING = 0x0207


def _records(stream: bytes, start: int = 0):
    """Yield (type, data, next_offset) from a BIFF record stream."""
    i = start
    n = len(stream)
    while i + 4 <= n:
        rtype, rlen = struct.unpack_from("<HH", stream, i)
        if rtype == 0:
            return
        data = stream[i + 4 : i + 4 + rlen]
        i += 4 + rlen
        yield rtype, data, i


class _SstCursor:
    """Reads XLUnicodeRichExtendedString data across SST/CONTINUE
    boundaries; each CONTINUE restarts with a fresh grbit byte."""

    def __init__(self, segments: list[bytes]) -> None:
        self.segments = segments
        self.seg = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segments[self.seg]) - self.pos

    def _advance_segment(self) -> None:
        self.seg += 1
        self.pos = 0
        if self.seg >= len(self.segments):
            raise CfbError("SST truncated")

    def read_raw(self, n: int) -> bytes:
        """Read n bytes that may span segments WITHOUT a grbit restart
        (used for fixed fields — the spec splits only character data)."""
        out = b""
        while n > 0:
            if self._remaining() == 0:
                self._advance_segment()
            take = min(n, self._remaining())
            s = self.segments[self.seg]
            out += s[self.pos : self.pos + take]
            self.pos += take
            n -= take
        return out

    def read_string(self) -> str:
        cch = struct.unpack("<H", self.read_raw(2))[0]
        grbit = self.read_raw(1)[0]
        crun = struct.unpack("<H", self.read_raw(2))[0] if grbit & 0x08 else 0
        cbext = struct.unpack("<i", self.read_raw(4))[0] if grbit & 0x04 else 0
        # accumulate everything as UTF-16LE bytes and decode ONCE at
        # the end: a surrogate pair may legally split across a
        # CONTINUE boundary (cch counts code units, and the spec's
        # no-split rule is per code unit, not per code point)
        u16: list[bytes] = []
        remaining = cch
        wide = bool(grbit & 0x01)
        while remaining > 0:
            if self._remaining() == 0:
                self._advance_segment()
                wide = bool(self.segments[self.seg][self.pos] & 0x01)
                self.pos += 1
            unit = 2 if wide else 1
            avail = self._remaining() // unit
            take = min(remaining, avail)
            if take == 0:
                raise CfbError("SST malformed split")
            s = self.segments[self.seg]
            raw = s[self.pos : self.pos + take * unit]
            u16.append(
                raw if wide else raw.decode("latin-1").encode("utf-16-le")
            )
            self.pos += take * unit
            remaining -= take
        self.read_raw(crun * 4)  # rich-text runs
        self.read_raw(max(cbext, 0))  # phonetic/ext block
        return b"".join(u16).decode("utf-16-le", "surrogatepass")


def _short_string(data: bytes, off: int) -> tuple[str, int]:
    """ShortXLUnicodeString (1-byte cch), used by BOUNDSHEET."""
    cch = data[off]
    grbit = data[off + 1]
    if grbit & 0x01:
        raw = data[off + 2 : off + 2 + cch * 2]
        return raw.decode("utf-16-le"), off + 2 + cch * 2
    raw = data[off + 2 : off + 2 + cch]
    return raw.decode("latin-1"), off + 2 + cch


def _unicode_string(data: bytes, off: int) -> str:
    """XLUnicodeString (2-byte cch) within one record (LABEL, STRING)."""
    cch = struct.unpack_from("<H", data, off)[0]
    grbit = data[off + 2]
    if grbit & 0x01:
        return data[off + 3 : off + 3 + cch * 2].decode("utf-16-le")
    return data[off + 3 : off + 3 + cch].decode("latin-1")


def _rk_value(rk: int) -> float:
    cents = rk & 0x01
    if rk & 0x02:  # 30-bit signed integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = float(v)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0]
    return val / 100.0 if cents else val


def num_text(v: float) -> str:
    """Render a BIFF double the way the engine renders sheet numbers:
    integral values without a trailing .0 (xls.rs prints Rust's {v})."""
    import math

    if math.isfinite(v) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def xls_extract_rows(payload: bytes) -> list[tuple[str, list[list[str]]]]:
    """Real .xls parse → [(sheet_name, rows)], gap cells filled ''.

    Raises :class:`CfbError` on non-CFB/containerless input so the
    reader registry's error channel can surface it (readers.py:95).
    """
    cfb = CfbFile(payload)
    names = cfb.stream_names()
    book_name = next(
        (n for n in ("Workbook", "Book") if n in names), None
    )
    if book_name is None:
        raise CfbError("no Workbook/Book stream in compound file")
    book = cfb.stream(book_name)

    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    it = _records(book)
    for rtype, data, nxt in it:
        if rtype == R_BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", data, 0)
            name, _ = _short_string(data, 6)
            sheets.append((name, pos))
        elif rtype == R_SST:
            segments = [data[8:]]
            (cst_unique,) = struct.unpack_from("<I", data, 4)
            # absorb immediately-following CONTINUE records
            probe = nxt
            while probe + 4 <= len(book):
                t2, l2 = struct.unpack_from("<HH", book, probe)
                if t2 != R_CONTINUE:
                    break
                segments.append(book[probe + 4 : probe + 4 + l2])
                probe += 4 + l2
            cur = _SstCursor(segments)
            for _ in range(cst_unique):
                sst.append(cur.read_string())
        elif rtype == R_EOF:
            break

    out: list[tuple[str, list[list[str]]]] = []
    for name, pos in sheets:
        cells: dict[tuple[int, int], str] = {}
        pending_string_cell: tuple[int, int] | None = None
        for rtype, data, _ in _records(book, pos):
            if rtype == R_EOF:
                break
            if rtype == R_LABELSST:
                rw, col, _ixfe, isst = struct.unpack_from("<HHHI", data, 0)
                cells[(rw, col)] = sst[isst] if isst < len(sst) else ""
            elif rtype == R_LABEL:
                rw, col = struct.unpack_from("<HH", data, 0)
                cells[(rw, col)] = _unicode_string(data, 6)
            elif rtype == R_NUMBER:
                rw, col = struct.unpack_from("<HH", data, 0)
                (v,) = struct.unpack_from("<d", data, 6)
                cells[(rw, col)] = num_text(v)
            elif rtype == R_RK:
                rw, col = struct.unpack_from("<HH", data, 0)
                (rk,) = struct.unpack_from("<I", data, 6)
                cells[(rw, col)] = num_text(_rk_value(rk))
            elif rtype == R_MULRK:
                rw, col_first = struct.unpack_from("<HH", data, 0)
                (col_last,) = struct.unpack_from("<H", data, len(data) - 2)
                for j in range(col_last - col_first + 1):
                    (rk,) = struct.unpack_from("<I", data, 4 + j * 6 + 2)
                    cells[(rw, col_first + j)] = num_text(_rk_value(rk))
            elif rtype == R_BOOLERR:
                rw, col = struct.unpack_from("<HH", data, 0)
                val, is_err = data[6], data[7]
                if is_err:
                    cells[(rw, col)] = f"#ERR{val:02X}"
                else:
                    cells[(rw, col)] = "true" if val else "false"
            elif rtype == R_FORMULA:
                rw, col = struct.unpack_from("<HH", data, 0)
                result = data[6:14]
                if result[6:8] == b"\xff\xff":
                    kind = result[0]
                    if kind == 0:  # string result in a STRING record
                        pending_string_cell = (rw, col)
                    elif kind == 1:
                        cells[(rw, col)] = "true" if result[2] else "false"
                    elif kind == 2:
                        cells[(rw, col)] = f"#ERR{result[2]:02X}"
                    # kind 3: blank
                else:
                    (v,) = struct.unpack("<d", result)
                    cells[(rw, col)] = num_text(v)
            elif rtype == R_STRING and pending_string_cell is not None:
                cells[pending_string_cell] = _unicode_string(data, 0)
                pending_string_cell = None
        rows: list[list[str]] = []
        if cells:
            max_r = max(r for r, _ in cells)
            for r in range(max_r + 1):
                row_cols = [c for (rr, c) in cells if rr == r]
                width = (max(row_cols) + 1) if row_cols else 0
                rows.append([cells.get((r, c), "") for c in range(width)])
        out.append((name, rows))
    return out


def xls_extract_text(payload: bytes) -> str | None:
    """Same text shape as the .xlsx tier: cells comma-joined, rows
    newline-joined, sheets separated by a blank line."""
    try:
        sheets = xls_extract_rows(payload)
    except (CfbError, struct.error, IndexError, UnicodeDecodeError):
        return None
    if not sheets:
        return None
    return "\n\n".join(
        "\n".join(",".join(r) for r in rows) for _, rows in sheets
    )


# ---------------------------------------------------------------------------
# BIFF8 — writer (fixtures + put_bytes round trip)
# ---------------------------------------------------------------------------


def _rec(rtype: int, data: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(data)) + data


def _wide_string(s: str, short: bool) -> bytes:
    raw = s.encode("utf-16-le")
    # cch counts UTF-16 code units (surrogate pairs count 2)
    cch = struct.pack("<B" if short else "<H", len(raw) // 2)
    return cch + b"\x01" + raw


_REC_LIMIT = 8224  # max record data size ([MS-XLS] 2.1.4)


def _sst_records(strings: list[str], total_refs: int) -> bytes:
    """SST + CONTINUE emission. Strings split only at character
    boundaries; every continuation segment restarts with a fresh grbit
    byte; the fixed header fields of a string never straddle records —
    the [MS-XLS] 2.5.293 continuation rules the reader's cursor
    implements from the other side."""
    segments: list[bytearray] = [bytearray(struct.pack("<II", total_refs, len(strings)))]

    def room() -> int:
        return _REC_LIMIT - len(segments[-1])

    for s in strings:
        raw = s.encode("utf-16-le")
        if room() < 3 + 2:  # header + at least one wide char
            segments.append(bytearray())
        segments[-1] += struct.pack("<H", len(raw) // 2) + b"\x01"
        i = 0
        while i < len(raw):
            if room() < 2:
                segments.append(bytearray(b"\x01"))  # fresh grbit: wide
            take = min(len(raw) - i, room() // 2 * 2)
            segments[-1] += raw[i : i + take]
            i += take
    out = _rec(R_SST, bytes(segments[0]))
    for seg in segments[1:]:
        out += _rec(R_CONTINUE, bytes(seg))
    return out


def xls_from_rows(sheets: list[tuple[str, list[list[str]]]]) -> bytes:
    """Serialize sheets of string cells into a minimal valid .xls.

    Cells that parse as numbers are written as NUMBER records,
    true/false as BOOLERR, everything else through the SST as LABELSST
    — so a round trip re-renders the same text the reader would emit
    for any spreadsheet-shaped corpus.
    """
    strings: list[str] = []
    index: dict[str, int] = {}
    total_refs = 0

    def sst_id(s: str) -> int:
        nonlocal total_refs
        total_refs += 1
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    def cell_record(r: int, c: int, text: str) -> bytes:
        if text in ("true", "false"):
            return _rec(
                R_BOOLERR,
                struct.pack("<HHH", r, c, 0)
                + bytes([1 if text == "true" else 0, 0]),
            )
        import math

        try:
            v = float(text)
        except ValueError:
            pass
        else:
            if math.isfinite(v) and num_text(v) == text:
                return _rec(
                    R_NUMBER, struct.pack("<HHH", r, c, 0) + struct.pack("<d", v)
                )
        return _rec(
            R_LABELSST, struct.pack("<HHHI", r, c, 0, sst_id(text))
        )

    sheet_streams: list[bytes] = []
    for _name, rows in sheets:
        body = _rec(R_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
        for r, row in enumerate(rows):
            for c, text in enumerate(row):
                body += cell_record(r, c, text)
        body += _rec(R_EOF, b"")
        sheet_streams.append(body)

    def globals_stream(positions: list[int]) -> bytes:
        g = _rec(R_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))
        for (name, _rows), pos in zip(sheets, positions):
            g += _rec(
                R_BOUNDSHEET,
                struct.pack("<IH", pos, 0) + _wide_string(name, short=True),
            )
        if strings:
            g += _sst_records(strings, total_refs)
        g += _rec(R_EOF, b"")
        return g

    # two passes: globals length depends only on record sizes, which are
    # independent of the position values written into BOUNDSHEET
    glen = len(globals_stream([0] * len(sheets)))
    positions, acc = [], glen
    for s in sheet_streams:
        positions.append(acc)
        acc += len(s)
    book = globals_stream(positions) + b"".join(sheet_streams)
    return cfb_write("Workbook", book)


def _canon(text: str) -> str:
    from .binary import _canon_newlines

    return _canon_newlines(text)


def xls_from_text(text: str) -> bytes:
    """One sheet, one cell per line — the put_bytes fixture shape."""
    return xls_from_rows(
        [("Sheet1", [[line] for line in _canon(text).split("\n")])]
    )
