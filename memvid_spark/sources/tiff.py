"""Pure-stdlib TIFF codec: real raster decode + encode.

Adds the archival/scanner image tier to the multimodal column surface
(PNG/BMP/GIF/JPEG landed earlier in sources/image.py, sources/jpeg.py;
the reference ingests images for its CLIP path, src/clip.rs:99-102, and
records media metadata, src/types/metadata.rs).

Implements TIFF 6.0 (the Adobe spec):

Decoder:
- both byte orders (``II`` little / ``MM`` big endian), first IFD
- inline and offset field values, BYTE/SHORT/LONG entry types
- gray (1 sample), RGB (3), RGBA via ExtraSamples (4); 8 bits/sample
- any strip layout (RowsPerStrip + StripOffsets/StripByteCounts)
- Compression 1 (none), 5 (TIFF-LZW: MSB-first variable codes with the
  spec's early code-width change), 32773 (PackBits)
- Predictor 2 (horizontal differencing) for LZW strips

Encoder: same matrix — byte order, compression (none/lzw/packbits),
rows-per-strip, optional predictor 2 — always emitting spec-valid files.

Like every codec under sources/, these are bytes->array kernels run per
Arrow batch inside mapInPandas; payloads never shuffle.
"""

from __future__ import annotations

import struct


class TiffError(ValueError):
    """Malformed or unsupported TIFF payload."""


# tags
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER, _STRIP_CNT = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _EXTRA = 284, 317, 338

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4}


def _read_ifd(payload: bytes, bo: str, off: int) -> dict[int, list[int]]:
    if off + 2 > len(payload):
        raise TiffError("IFD offset out of range")
    (n,) = struct.unpack_from(bo + "H", payload, off)
    entries: dict[int, list[int]] = {}
    pos = off + 2
    for _ in range(n):
        if pos + 12 > len(payload):
            raise TiffError("truncated IFD entry")
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, pos)
        size = _TYPE_SIZE.get(typ)
        if size is None:  # rational/other — skip tags we don't use
            pos += 12
            continue
        total = size * cnt
        if total <= 4:
            raw = payload[pos + 8 : pos + 8 + total]
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, pos + 8)
            if voff + total > len(payload):
                raise TiffError("field value out of range")
            raw = payload[voff : voff + total]
        fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
        entries[tag] = list(struct.unpack(bo + fmt * cnt, raw))
        pos += 12
    return entries


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-LZW (spec §13): MSB-first variable-width codes, Clear=256,
    EOI=257, EARLY code-width change (width bumps when the next code to
    be added is 2^w - 1, one earlier than GIF)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = next_code = 0

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        next_code = 258

    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out)
            if code < len(table) and (code < 256 or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise TiffError(f"corrupt LZW stream (code {code})")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                next_code += 1
                # early change, lag-adjusted: the decoder's table count
                # trails the encoder's by one (it adds entry k only when
                # reading code k+1), so it must widen at 2^w - 2 to read
                # the encoder's first (w+1)-bit code — the encoder
                # widens at 2^w - 1, i.e. after adding entry 510 for
                # w=9, the documented TIFF early-change point
                if next_code == (1 << width) - 2 and width < 12:
                    width += 1
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            bits -= 8
            out.append((acc >> bits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    width, next_code = 9, 258
    emit(CLEAR, width)
    cur = b""
    for b in bytes(data):
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the table saturates
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            width, next_code = 9, 258
        cur = bytes([b])
    if cur:
        emit(table[cur], width)
    emit(EOI, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise TiffError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def tiff_decode(payload: bytes):
    """Decode a TIFF payload to (h, w, channels) uint8 pixels (channels
    axis dropped for grayscale? no — always 3-D, matching bmp/gif)."""
    import numpy as np

    if len(payload) < 8:
        raise TiffError("short TIFF payload")
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("missing II/MM byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    e = _read_ifd(payload, bo, ifd_off)
    try:
        w, h = e[_W][0], e[_H][0]
        offs, cnts = e[_STRIP_OFF], e[_STRIP_CNT]
    except KeyError as k:
        raise TiffError(f"missing required tag {k}") from None
    spp = e.get(_SPP, [1])[0]
    bits = e.get(_BITS, [8] * spp)
    comp = e.get(_COMP, [1])[0]
    planar = e.get(_PLANAR, [1])[0]
    predictor = e.get(_PREDICTOR, [1])[0]
    rows_per = e.get(_ROWS_PER, [h])[0] or h
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported bits-per-sample {bits}")
    if planar != 1:
        raise TiffError("planar configuration 2 unsupported")
    if spp not in (1, 3, 4):
        raise TiffError(f"unsupported samples-per-pixel {spp}")
    if predictor not in (1, 2):
        raise TiffError(f"unsupported predictor {predictor}")
    if len(offs) != len(cnts):
        raise TiffError("strip offset/count mismatch")
    rows = bytearray()
    row_bytes = w * spp
    for si, (off, cnt) in enumerate(zip(offs, cnts)):
        if off + cnt > len(payload):
            raise TiffError("strip out of range")
        raw = payload[off : off + cnt]
        if comp == 1:
            data = raw
        elif comp == 5:
            data = _lzw_decode(raw)
        elif comp == 32773:
            data = _packbits_decode(raw)
        else:
            raise TiffError(f"unsupported compression {comp}")
        n_rows = min(rows_per, h - si * rows_per)
        if len(data) < n_rows * row_bytes:
            raise TiffError("strip too short")
        rows += data[: n_rows * row_bytes]
    arr = np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    return arr


def tiff_encode(
    pixels,
    byte_order: str = "II",
    compression: str = "none",
    rows_per_strip: int = 32,
    predictor: bool = False,
) -> bytes:
    """Encode (h, w[, channels]) uint8 pixels as a valid TIFF.

    ``compression``: 'none' | 'lzw' | 'packbits'; ``predictor`` applies
    horizontal differencing before LZW (ignored otherwise — the spec
    ties predictor 2 to LZW strips)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3, 4):
        raise TiffError(f"unsupported samples-per-pixel {spp}")
    bo = "<" if byte_order == "II" else ">"
    comp_tag = {"none": 1, "lzw": 5, "packbits": 32773}[compression]
    use_pred = bool(predictor) and compression == "lzw"
    src = px
    if use_pred:
        d = px.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - px.astype(np.int16)[:, :-1, :]
        src = (d % 256).astype(np.uint8)

    strips: list[bytes] = []
    for y0 in range(0, h, rows_per_strip):
        chunk = src[y0 : y0 + rows_per_strip].tobytes()
        if comp_tag == 5:
            chunk = _lzw_encode(chunk)
        elif comp_tag == 32773:
            chunk = _packbits_encode(chunk)
        strips.append(chunk)

    # strip data starts right after the 8-byte header; IFD follows it
    data = bytearray()
    offs, cnts = [], []
    pos = 8
    for s in strips:
        offs.append(pos)
        cnts.append(len(s))
        data += s
        pos += len(s)
    header = struct.pack(bo + "2sHI", byte_order.encode(), 42, pos)

    photo = 1 if spp == 1 else 2
    fields: list[tuple[int, int, list[int]]] = [
        (_W, 4, [w]), (_H, 4, [h]),
        (_BITS, 3, [8] * spp),
        (_COMP, 3, [comp_tag]),
        (_PHOTO, 3, [photo]),
        (_STRIP_OFF, 4, offs),
        (_SPP, 3, [spp]),
        (_ROWS_PER, 4, [rows_per_strip]),
        (_STRIP_CNT, 4, cnts),
    ]
    if spp == 4:
        fields.append((_EXTRA, 3, [1]))  # associated alpha
    if use_pred:
        fields.append((_PREDICTOR, 3, [2]))
    fields.sort()

    ifd_off = pos
    # out-of-line values land after the IFD
    n = len(fields)
    tail_off = ifd_off + 2 + 12 * n + 4
    tail = bytearray()
    entries = bytearray(struct.pack(bo + "H", n))
    for tag, typ, vals in fields:
        size = _TYPE_SIZE[typ] * len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if size <= 4:
            field = packed + b"\x00" * (4 - size)
        else:
            field = struct.pack(bo + "I", tail_off + len(tail))
            tail += packed
        entries += struct.pack(bo + "HHI", tag, typ, len(vals)) + field
    entries += struct.pack(bo + "I", 0)  # no next IFD
    return header + bytes(data) + bytes(entries) + bytes(tail)


def tiff_metadata(payload: bytes) -> dict:
    """Header-only parse for the describe/metadata path."""
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise TiffError("missing II/MM byte-order mark")
    magic, ifd_off = struct.unpack_from(bo + "HI", payload, 2)
    if magic != 42:
        raise TiffError("bad TIFF magic")
    e = _read_ifd(payload, bo, ifd_off)
    comp = {1: "none", 5: "lzw", 32773: "packbits"}.get(
        e.get(_COMP, [1])[0], str(e.get(_COMP, [1])[0])
    )
    return {
        "width": e.get(_W, [0])[0],
        "height": e.get(_H, [0])[0],
        "channels": e.get(_SPP, [1])[0],
        "compression": comp,
        "byte_order": "II" if bo == "<" else "MM",
    }


def tiff_describe(payload: bytes) -> str:
    m = tiff_metadata(payload)
    return (
        f"tiff image {m['width']}x{m['height']} {m['channels']}ch "
        f"{m['compression']} ({m['byte_order']})"
    )
