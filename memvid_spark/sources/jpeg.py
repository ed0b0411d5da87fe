"""Pure-stdlib baseline JPEG codec (ITU-T T.81): real entropy decode,
dequantization, IDCT and color conversion — no codec library.

Reference parity: the reference's image ingestion decodes real JPEG
pixels before CLIP embedding (src/clip.rs:99-102); until now this repo
parsed JPEG headers only (sources/image.py:jpeg_metadata) and pixel
decode was an injection seam. This module closes that seam for baseline
sequential DCT JPEGs — the overwhelmingly common flavor:

- markers: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS/RSTn/EOI; byte-stuffing
  (FF 00) and restart-interval handling in the entropy stream
- huffman: DHT-built canonical code tables, DC magnitude categories
  with one's-complement negatives, AC run/size with ZRL and EOB
- 8-bit quant tables, zigzag order, orthonormal 2D IDCT (NumPy matrix
  form), level shift + clamp, YCbCr→RGB (BT.601 full range, the JFIF
  convention) for 3-component scans

Supported: grayscale, 4:4:4, 4:2:2 and 4:2:0 (general h×v sampling
factors — interleaved multi-block MCUs, per-component plane
reconstruction, nearest-neighbor chroma upsample). Progressive (SOF2)
and arithmetic coding raise a clear error; a deployment swaps in PIL
via the same seam as before (multimodal.decode_image).

The encoder exists for fixtures and the sink tier: standard Annex K
huffman tables, all-ones quant by default — for images constant within
each 8x8 block the DCT has a single DC coefficient and the round trip
is EXACT, which is what lets q128's DuckDB oracle pin the decode in
closed form; general images round-trip within ±2/channel (IDCT
rounding), pinned by tests.

Scale: decode runs inside Arrow batches (mapInPandas) like every other
codec here; payloads never shuffle.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K typical huffman tables: (bits[1..16], values)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


class JpegError(ValueError):
    pass


def _dct_matrix():
    import numpy as np

    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m *= np.sqrt(2.0 / 8.0)
    m[0] *= np.sqrt(0.5)
    return m  # orthonormal: block = M.T @ coeffs @ M


# --- huffman -------------------------------------------------------------


def _build_codes(bits, values):
    """Canonical huffman: {(length, code): value}."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return codes


def _encode_codes(bits, values):
    """value → (code, length) for the encoder."""
    return {v: (c, l) for (l, c), v in _build_codes(bits, values).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing and
    RSTn awareness."""

    def __init__(self, payload: bytes, pos: int):
        self.p = payload
        self.pos = pos
        self.acc = 0
        self.bits = 0

    def _fill(self):
        b = self.p[self.pos]
        if b == 0xFF:
            nxt = self.p[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker mid-stream
                raise _Restart()
            else:
                raise JpegError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, codes) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            v = codes.get((length, code))
            if v is not None:
                return v
        raise JpegError("invalid huffman code in scan")

    def sync_restart(self):
        """Skip to just past the next RSTn marker and reset bit state."""
        self.bits = 0
        self.acc = 0
        while True:
            if self.p[self.pos] == 0xFF and 0xD0 <= self.p[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


class _Restart(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude decode: one's-complement negatives (T.81 F.2.2.1)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# --- decoder -------------------------------------------------------------


def jpeg_decode(payload: bytes):
    """Decode a baseline JPEG to (h, w) or (h, w, 3) uint8 pixels."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (bad signature)")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) → codes
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise JpegError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_codes(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, _tq in comps:
                if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
                    raise JpegError(
                        f"non-integer sampling ratio {hi}x{vi} vs "
                        f"{hmax}x{vmax} unsupported"
                    )
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("progressive/extended JPEG unsupported (SOF0 only)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                np, payload, pos + 2 + seglen, frame, qt, huff, scan_tabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise JpegError("no scan data found")


def _decode_block(reader, dc_codes, ac_codes):
    zz = [0] * 64
    size = reader.read_code(dc_codes)
    diff = _extend(reader.read_bits(size), size) if size else 0
    zz[0] = diff  # caller adds the DC predictor
    k = 1
    while k < 64:
        rs = reader.read_code(ac_codes)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC index overflow")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz


def _decode_scan(np, payload, pos, frame, qt, huff, scan_tabs, restart_interval):
    """General interleaved baseline scan: each MCU carries h_i×v_i
    blocks per component (4:4:4 / 4:2:2 / 4:2:0 all fall out of the
    sampling factors); subsampled planes are reconstructed at their own
    resolution and replicated up to full size (the nearest-neighbor
    chroma upsample)."""
    h, w, comps = frame
    M = _dct_matrix()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.float64)
        for _cid, hi, vi, _tq in comps
    ]
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            try:
                for ci, (cid, hi, vi, tq) in enumerate(comps):
                    dc_id, ac_id = scan_tabs[cid]
                    dc_codes = huff[(0, dc_id)]
                    ac_codes = huff[(1, ac_id)]
                    q = qt[tq]
                    for by in range(vi):
                        for bx in range(hi):
                            zz = _decode_block(reader, dc_codes, ac_codes)
                            pred[ci] += zz[0]
                            zz[0] = pred[ci]
                            coeffs = np.zeros(64, dtype=np.float64)
                            for i in range(64):
                                coeffs[ZIGZAG[i]] = zz[i] * q[i]
                            block = M.T @ coeffs.reshape(8, 8) @ M
                            py = (my * vi + by) * 8
                            px = (mx * hi + bx) * 8
                            planes[ci][py : py + 8, px : px + 8] = block
            except _Restart:
                raise JpegError("restart marker misaligned with DRI interval")
            mcu += 1
    out = []
    for (cid, hi, vi, _tq), p in zip(comps, planes):
        up = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(np.clip(np.round(up[:h, :w] + 128.0), 0, 255))
    if len(out) == 1:
        return out[0].astype(np.uint8)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder (fixtures + sink tier) --------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            b = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.bits -= 8
        self.acc &= (1 << self.bits) - 1

    def flush(self):
        if self.bits:
            pad = 8 - self.bits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) with one's-complement negatives."""
    size = abs(v).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def jpeg_encode(
    pixels, quant: int = 1, restart_interval: int = 0, subsample: str = "444"
) -> bytes:
    """Baseline sequential encoder: grayscale (h, w) or RGB (h, w, 3),
    uniform quantization value ``quant`` (1 → images constant per 8x8
    block round-trip exactly in 4:4:4). ``subsample`` picks the chroma
    layout: '444' (every block full-res), '422' (chroma halved
    horizontally), '420' (halved both ways — the layout nearly all real
    photos ship); chroma is box-averaged down, MCUs interleave
    h_i×v_i blocks per component. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N MCUs (exercises the decoder's
    restart resync)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px - 128.0]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    M = _dct_matrix()
    q = [quant] * 64
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes(q))
    nc = 1 if gray else 3
    if gray or subsample == "444":
        factors = [(1, 1)] * nc
    elif subsample == "420":
        factors = [(2, 2), (1, 1), (1, 1)]
    elif subsample == "422":
        factors = [(2, 1), (1, 1), (1, 1)]
    else:
        raise JpegError(f"unknown subsampling {subsample!r}")
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += _seg(0xC0, sof)
    tables = [(0x00, DC_LUM), (0x10, AC_LUM)]
    if not gray:
        tables += [(0x01, DC_CHROM), (0x11, AC_CHROM)]
    dht = b""
    for tid, (bits, values) in tables:
        dht += bytes([tid]) + bytes(bits) + bytes(values)
    out += _seg(0xC4, dht)
    sos = bytes([nc])
    for ci in range(nc):
        dc_id, ac_id = (0, 0) if ci == 0 else (1, 1)
        sos += bytes([ci + 1, (dc_id << 4) | ac_id])
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    enc_dc = [_encode_codes(*DC_LUM), _encode_codes(*DC_CHROM)]
    enc_ac = [_encode_codes(*AC_LUM), _encode_codes(*AC_CHROM)]
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component plane: edge-replicate to the full MCU grid at full
    # resolution, then box-average down by the sampling ratio (the
    # standard chroma downsample)
    padded = []
    for ci, p in enumerate(planes):
        hi, vi = factors[ci]
        fh, fw = mcuy * 8 * vmax, mcux * 8 * hmax
        full = np.zeros((fh, fw))
        full[:h, :w] = p
        full[h:, :w] = p[h - 1 : h, :]
        full[:, w:] = full[:, w - 1 : w]
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            full = full.reshape(fh // ry, ry, fw // rx, rx).mean(axis=(1, 3))
        padded.append(full)

    def encode_block(writer, block, ci):
        t = 0 if ci == 0 else 1
        coeffs = M @ block @ M.T
        zz = [
            int(np.round(coeffs.ravel()[ZIGZAG[i]])) // quant
            for i in range(64)
        ]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        size, bits_v = _magnitude(diff)
        code, length = enc_dc[t][size]
        writer.write(code, length)
        if size:
            writer.write(bits_v, size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, length = enc_ac[t][0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits_v = _magnitude(zz[k])
            code, length = enc_ac[t][(run << 4) | size]
            writer.write(code, length)
            writer.write(bits_v, size)
            run = 0
        if last_nz < 63:
            code, length = enc_ac[t][0x00]  # EOB
            writer.write(code, length)

    writer = _BitWriter()
    pred = [0] * nc
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                writer = _BitWriter()
                pred = [0] * nc
            mcu += 1
            for ci in range(nc):
                hi, vi = factors[ci]
                for by in range(vi):
                    for bx in range(hi):
                        py = (my * vi + by) * 8
                        px_ = (mx * hi + bx) * 8
                        encode_block(
                            writer, padded[ci][py : py + 8, px_ : px_ + 8], ci
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
