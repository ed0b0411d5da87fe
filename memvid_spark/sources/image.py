"""Pure-stdlib PNG codec + image feature extraction.

Reference: the image ingestion path decodes real pixels before CLIP
embedding (src/clip.rs:99-102, image metadata in src/types/metadata.rs);
this module makes PNG a genuinely first-class format in this container
(no PIL/ffmpeg installed) — decode is a real zlib inflate + per-row
unfilter, not a stub.

Coverage: all five color types (gray / RGB / palette / gray+alpha /
RGBA), bit depths 1/2/4/8/16 (sub-byte gray scales to full range,
16-bit keeps the high byte), non-interlaced AND Adam7 interlaced
(seven independently-filtered sub-images recomposed); tRNS ignored
(features are computed over stored channels). Also here: BMP pixel
codec (BI_RGB tiers), GIF codec (full LZW), and the resize transforms.

Scale: decode runs inside Arrow batches (mapInPandas) — one Python call
per batch, output strictly columnar. The unfilter hot loop is NumPy-
vectorized along each row for filters 0/1/2 (None/Sub/Up via cumsum) and
falls back to a per-pixel lane loop only for Average/Paeth rows.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type → channels stored in the filtered scanlines
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngError(ValueError):
    pass


@dataclass
class PngImage:
    width: int
    height: int
    bit_depth: int
    color_type: int
    channels: int  # channels of `pixels` (palette already expanded)
    pixels: "object"  # np.ndarray (height, width, channels) uint8


def png_chunks(payload: bytes):
    """Yield (type, data) for each chunk; validates magic and CRCs."""
    if not payload.startswith(PNG_MAGIC):
        raise PngError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        crc = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND chunk")


def png_metadata(payload: bytes) -> dict:
    """Header-only parse (no IDAT inflate) — the cheap scan path for
    metadata columns: width/height/bit_depth/color_type/channels."""
    for ctype, data in png_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            return {
                "width": w,
                "height": h,
                "bit_depth": depth,
                "color_type": color,
                "channels": _CHANNELS.get(color, 0),
                "interlace": interlace,
            }
    raise PngError("missing IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 pass grid: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(np, raw: bytes, h: int, w: int, ch: int, depth: int):
    """Undo per-scanline filtering for one (sub-)image; returns the
    reconstructed bytes as an (h, stride) int array. ``bpp`` — the
    left-neighbor distance — is in BYTES (1 for sub-byte depths, per
    spec)."""
    stride = (w * ch * depth + 7) // 8
    bpp = max(1, (ch * depth) // 8)
    if len(raw) != h * (1 + stride):
        raise PngError("IDAT payload size mismatch")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = buf[:, 0]
    rows = buf[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    lanes = stride // bpp if stride % bpp == 0 else None
    for y in range(h):
        ft = int(ftypes[y])
        row = rows[y]
        if ft == 0:  # None
            cur = row
        elif ft == 1 and lanes:  # Sub via lane cumsum
            cur = (row.reshape(lanes, bpp).cumsum(axis=0) % 256).reshape(stride)
        elif ft == 2:  # Up
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):  # Average / Paeth (or ragged Sub) — serial
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ft == 1:
                    cur[i] = (row[i] + a) % 256
                elif ft == 3:
                    cur[i] = (row[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    cur[i] = (row[i] + _paeth(a, b, c)) % 256
        else:
            raise PngError(f"unknown filter type {ft} in row {y}")
        out[y] = cur
        prev = cur
    return out


def _samples_from_rows(np, rows, h: int, w: int, ch: int, depth: int):
    """(h, stride) reconstructed bytes → (h, w, ch) sample array.
    Sub-byte depths unpack MSB-first; 16-bit keeps the high byte (the
    standard 8-bit downconvert)."""
    if depth == 8:
        return rows[:, : w * ch].reshape(h, w, ch).astype(np.uint8)
    if depth == 16:
        return rows[:, : w * ch * 2].reshape(h, w, ch, 2)[:, :, :, 0].astype(
            np.uint8
        )
    # 1/2/4-bit: unpack bits per byte, MSB first
    per_byte = 8 // depth
    bits = np.zeros((h, rows.shape[1] * per_byte), dtype=np.uint8)
    for k in range(per_byte):
        shift = 8 - depth * (k + 1)
        bits[:, k::per_byte] = (rows >> shift) & ((1 << depth) - 1)
    return bits[:, : w * ch].reshape(h, w, ch)


def png_decode(payload: bytes) -> PngImage:
    """Full decode: inflate IDAT, unfilter scanlines (including the
    seven independently-filtered Adam7 sub-images), unpack sub-byte
    depths, expand palette.

    Returns pixels as (height, width, channels) uint8. Gray samples at
    depth < 8 scale to full range (PNG's display convention); 16-bit
    keeps the high byte; palette indices map through PLTE at any
    depth."""
    import numpy as np

    ihdr = None
    idat = bytearray()
    plte = None
    for ctype, data in png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise PngError("missing IHDR chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise PngError("unsupported compression/filter method")
    if color not in _CHANNELS:
        raise PngError(f"unknown color type {color}")
    if depth not in (1, 2, 4, 8, 16):
        raise PngError(f"bit depth {depth} not supported")
    if depth < 8 and color not in (0, 3):
        raise PngError(f"sub-byte depth invalid for color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    samples = np.zeros((h, w, ch), dtype=np.uint8)
    if interlace == 0:
        rows = _unfilter(np, raw, h, w, ch, depth)
        samples = _samples_from_rows(np, rows, h, w, ch, depth)
    elif interlace == 1:
        pos = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            stride = (pw * ch * depth + 7) // 8
            n = ph * (1 + stride)
            rows = _unfilter(np, raw[pos : pos + n], ph, pw, ch, depth)
            pos += n
            sub = _samples_from_rows(np, rows, ph, pw, ch, depth)
            samples[y0::ys, x0::xs] = sub
        if pos != len(raw):
            raise PngError("IDAT payload size mismatch (interlaced)")
    else:
        raise PngError(f"unknown interlace method {interlace}")
    if color == 3:  # expand palette indices → RGB
        if plte is None:
            raise PngError("palette image without PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if samples.max() >= len(pal):
            raise PngError("palette index out of range")
        px = pal[samples.reshape(h, w)]
        ch = 3
    elif color == 0 and depth < 8:
        # scale to full 8-bit range (255 / (2^d - 1) is exact for 1/2/4)
        px = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        px = samples
    return PngImage(
        width=w, height=h, bit_depth=depth, color_type=color, channels=ch,
        pixels=px,
    )


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_encode(pixels, cycle_filters: bool = True) -> bytes:
    """Serialize a (h, w, ch) uint8 array into a valid PNG.

    ch 1 → grayscale, 2 → gray+alpha, 3 → RGB, 4 → RGBA. With
    ``cycle_filters`` each row uses filter type y % 5, exercising every
    unfilter path on decode — the fixture-generator role (decode tests
    are only as strong as the filters the fixtures contain). Forward
    filtering is fully vectorized (the predictors read original, not
    reconstructed, neighbors)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = px.reshape(h, w * ch).astype(np.int32)
    stride = w * ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        ft = y % 5 if cycle_filters else 0
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
            enc = (row - left) % 256
        elif ft == 2:  # Up
            enc = (row - prev) % 256
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
            enc = (row - (left + prev) // 2) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, dtype=np.int32), row[:-ch]])
            ul = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (row - pred) % 256
        lines.append(ft)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )


def png_describe(payload: bytes) -> str:
    """One-line text surrogate for the put_bytes text path: real header
    parse, no decode — what a text-first store records about an image."""
    m = png_metadata(payload)
    kind = {0: "gray", 2: "rgb", 3: "palette", 4: "gray+alpha", 6: "rgba"}.get(
        m["color_type"], "?"
    )
    return (
        f"png image {m['width']}x{m['height']} {kind} "
        f"depth={m['bit_depth']}"
    )


# ---------------------------------------------------------------------------
# JPEG / GIF / BMP — header-only metadata (dimensions without decode)
# ---------------------------------------------------------------------------

JPEG_MAGIC = b"\xff\xd8"
GIF_MAGICS = (b"GIF87a", b"GIF89a")
BMP_MAGIC = b"BM"

# SOF markers carrying frame dimensions (baseline, progressive, etc.)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
     0xCE, 0xCF]
)


def jpeg_metadata(payload: bytes) -> dict:
    """Walk JPEG marker segments to the SOF header: (height, width,
    components) live at fixed offsets inside it — the cheap header-only
    scan path. Full baseline pixel decode lives in sources/jpeg.py
    (huffman + dequant + IDCT, routed via multimodal.decode_image)."""
    if not payload.startswith(JPEG_MAGIC):
        raise PngError("not a JPEG (bad signature)")
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if marker in _JPEG_SOF and i + 9 <= n:
            _, h, w, comp = struct.unpack(">BHHB", payload[i + 4 : i + 10])
            return {"width": w, "height": h, "channels": comp}
        if marker == 0xDA:  # start of scan — SOF must precede it
            break
        i += 2 + seglen
    raise PngError("no SOF frame header found in JPEG")


def gif_metadata(payload: bytes) -> dict:
    if payload[:6] not in GIF_MAGICS:
        raise PngError("not a GIF (bad signature)")
    w, h = struct.unpack("<HH", payload[6:10])
    return {"width": w, "height": h, "channels": 3}


_BMP_DIB_SIZES = (12, 16, 40, 52, 56, 64, 108, 124)


def bmp_metadata(payload: bytes) -> dict:
    if (
        not payload.startswith(BMP_MAGIC)
        or len(payload) < 26
        or struct.unpack("<I", payload[14:18])[0] not in _BMP_DIB_SIZES
    ):
        raise PngError("not a BMP (bad signature)")
    dib = struct.unpack("<I", payload[14:18])[0]
    if dib == 12:  # OS/2 BITMAPCOREHEADER: uint16 dims
        w, h = struct.unpack("<HH", payload[18:22])
    else:
        w, h = struct.unpack("<ii", payload[18:26])
    return {"width": w, "height": abs(h), "channels": 3}


def image_metadata(payload: bytes) -> dict:
    """Magic-dispatched header metadata for any supported image format;
    the cheap scan path for typed media columns."""
    if payload.startswith(PNG_MAGIC):
        return png_metadata(payload)
    if payload.startswith(JPEG_MAGIC):
        return jpeg_metadata(payload)
    if payload[:6] in GIF_MAGICS:
        return gif_metadata(payload)
    if payload.startswith(BMP_MAGIC):
        return bmp_metadata(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import tiff_metadata

        m = tiff_metadata(payload)
        return {"format": "tiff", "width": m["width"],
                "height": m["height"], "channels": m["channels"]}
    raise PngError("unrecognized image format")


def jpeg_describe(payload: bytes) -> str:
    m = jpeg_metadata(payload)
    return f"jpeg image {m['width']}x{m['height']} {m['channels']}ch"


def gif_describe(payload: bytes) -> str:
    m = gif_metadata(payload)
    return f"gif image {m['width']}x{m['height']}"


def bmp_describe(payload: bytes) -> str:
    m = bmp_metadata(payload)
    return f"bmp image {m['width']}x{m['height']}"


# ---------------------------------------------------------------------------
# BMP — real pixel decode + writer (BI_RGB uncompressed tiers)
# ---------------------------------------------------------------------------


def bmp_decode(payload: bytes):
    """Decode an uncompressed (BI_RGB) BMP to (h, w, ch) uint8 RGB(A)
    pixels: 24-bit BGR, 32-bit BGRA, and 8-bit palette rows, bottom-up
    (positive height) or top-down (negative), with 4-byte row stride
    padding — the layouts real BI_RGB files ship. RLE/bitfield
    compressions raise (inject PIL via multimodal.decode_image for
    those). Reference: real pixels feed the embedding path
    (src/clip.rs:99-102)."""
    import numpy as np

    if not payload.startswith(BMP_MAGIC) or len(payload) < 54:
        raise PngError("not a BMP (bad signature)")
    data_off = struct.unpack("<I", payload[10:14])[0]
    dib = struct.unpack("<I", payload[14:18])[0]
    if dib < 40:
        raise PngError(f"unsupported BMP DIB header size {dib}")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0:
        raise PngError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise PngError(f"unsupported BMP bit depth {bpp}")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * (bpp // 8) + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=stride * h, offset=data_off)
    rows = raw.reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        n_colors = struct.unpack("<I", payload[46:50])[0] or 256
        pal_off = 14 + dib
        pal = np.frombuffer(payload, dtype=np.uint8, count=n_colors * 4,
                            offset=pal_off).reshape(n_colors, 4)
        idx = rows[:, :w]
        return pal[idx][:, :, [2, 1, 0]].copy()  # BGRX → RGB
    ch = bpp // 8
    px = rows[:, : w * ch].reshape(h, w, ch)
    if ch == 3:
        return px[:, :, [2, 1, 0]].copy()  # BGR → RGB
    return px[:, :, [2, 1, 0, 3]].copy()  # BGRA → RGBA


def bmp_encode(pixels) -> bytes:
    """24-bit BI_RGB bottom-up writer (the ubiquitous BMP flavor)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, ch = px.shape
    bgr = px[:, :, [2, 1, 0]] if ch >= 3 else px
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + bytes(body)


# ---------------------------------------------------------------------------
# GIF — real pixel decode (full GIF-LZW) + writer
# ---------------------------------------------------------------------------


def _gif_lzw_decode(min_code_size: int, data: bytes) -> list:
    """Variable-width GIF-LZW: clear/EOI codes, dictionary growth to
    4096, early-exit on EOI. Returns the index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    table: list[bytes] = []

    def reset():
        nonlocal table, width, next_code
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        next_code = eoi + 1

    width = next_code = 0
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            bits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table) and (code < clear or table[code]):
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                raise PngError(f"corrupt GIF LZW stream (code {code})")
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return out


def gif_decode(payload: bytes):
    """Decode the first frame of a GIF87a/89a to (h, w, 3) uint8 RGB:
    real LZW expansion, global/local color tables, interlace reorder,
    extension-block skipping. Animation beyond frame 0 is out of scope
    (the features path consumes stills)."""
    import numpy as np

    if payload[:6] not in GIF_MAGICS:
        raise PngError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, ip = struct.unpack("<HHHHB", payload[pos + 1 : pos + 10])
            pos += 10
            ct = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ct is None:
                raise PngError("GIF image without a color table")
            min_code = payload[pos]
            pos += 1
            stream = bytearray()
            while payload[pos]:
                size = payload[pos]
                stream += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            idx = _gif_lzw_decode(min_code, bytes(stream))
            if len(idx) < w * h:
                raise PngError("GIF pixel data truncated")
            arr = np.asarray(idx[: w * h], dtype=np.uint16).reshape(h, w)
            if ip & 0x40:  # interlaced: 4-pass row shuffle
                deinter = np.empty_like(arr)
                row = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    for y in range(start, h, step):
                        deinter[y] = arr[row]
                        row += 1
                arr = deinter
            return ct[arr].astype(np.uint8)
        elif block == 0x3B:  # trailer
            break
        else:
            raise PngError(f"unexpected GIF block 0x{block:02x}")
    raise PngError("GIF contains no image data")


def _gif_lzw_encode(min_code_size: int, indices) -> bytes:
    """GIF-LZW compressor with dictionary reset at 4096 — a real
    encoder, so decoder tests cover multi-width code streams."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run = b""
    for i in indices:
        cand = run + bytes([int(i)])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([int(i)])
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(indices, palette) -> bytes:
    """Single-frame GIF89a writer: ``indices`` (h, w) into ``palette``
    (n ≤ 256, 3) — non-interlaced, global color table."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    depth = max((len(pal) - 1).bit_length(), 1)
    n = 1 << depth
    table = np.zeros((n, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(depth, 2)
    out.append(min_code)
    data = _gif_lzw_encode(min_code, idx.ravel())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Resize — the transform tier of the multimodal pipeline (decode →
# resize → feature/model input). Nearest-neighbor is integer-exact
# (oracle-able); bilinear is the model-input path, pinned by tests.
# ---------------------------------------------------------------------------


def resize_nearest(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize with the floor convention
    src = (dst * src_extent) // dst_extent — integer-exact, so a SQL
    oracle can pin resized pixels in closed form (q129)."""
    import numpy as np

    px = np.asarray(pixels)
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]


def resize_bilinear(pixels, out_h: int, out_w: int):
    """Bilinear resize (align_corners=False, the ML-preprocessing
    convention): the real model-input path for CLIP-style towers
    (src/clip.rs:99-102 resizes decoded pixels before embedding)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    squeeze = px.ndim == 2
    if squeeze:
        px = px[:, :, None]
    h, w, _ = px.shape
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    top = px[y0][:, x0] * (1 - wx) + px[y0][:, x1] * wx
    bot = px[y1][:, x0] * (1 - wx) + px[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out
