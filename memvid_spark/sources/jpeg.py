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
reconstruction, nearest-neighbor chroma upsample), and PROGRESSIVE
(SOF2, T.81 Annex G): spectral selection, successive approximation
(DC first/refine, AC first/refine with EOB-run coding and correction
bits), multi-scan coefficient accumulation — the flavor large web
images actually ship. A matching progressive ENCODER
(jpeg_encode_progressive) emits all four scan kinds for round-trip
tests; hierarchical and arithmetic coding raise a clear error.

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
    progressive = False
    coefs: list = []  # progressive: per-component (by, bx, 64) zigzag ints
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
        elif marker == 0xC2:  # SOF2 progressive DCT
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
                    raise JpegError("non-integer sampling ratio unsupported")
            frame = (h, w, comps)
            progressive = True
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                for _cid, hi, vi, _tq in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegError("hierarchical/arithmetic JPEG unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            scan_comps = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tt >> 4, tt & 0x0F)
                scan_comps.append(cs)
            if not progressive:
                return _decode_scan(
                    np, payload, pos + 2 + seglen, frame, qt, huff,
                    scan_tabs, restart_interval,
                )
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            pos = _progressive_scan(
                np, payload, pos + 2 + seglen, frame, huff, scan_tabs,
                scan_comps, coefs, ss, se, ahal >> 4, ahal & 0x0F,
                restart_interval,
            )
            continue
        pos += 2 + seglen
    if progressive and frame is not None:
        return _reconstruct_progressive(np, frame, qt, coefs)
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


# --- progressive decoder (T.81 Annex G) ----------------------------------


def _comp_block_grid(frame, ci):
    """True (rows, cols) of a component's block grid for NON-interleaved
    scans (can be smaller than the MCU-padded grid)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, hi, vi, _tq = comps[ci]
    cw = (-(-(w * hi) // hmax) + 7) // 8
    ch = (-(-(h * vi) // vmax) + 7) // 8
    return ch, cw


def _ac_first_block(reader, ac_codes, blk, ss, se, al, eobrun):
    """AC first scan for one block (G.1.2.2): returns new EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_code(ac_codes)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                return (1 << r) - 1 + (reader.read_bits(r) if r else 0)
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC index overflow in progressive scan")
        blk[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine_block(reader, ac_codes, blk, ss, se, al, eobrun):
    """AC refinement for one block (G.1.2.3): newly-significant
    coefficients arrive as ±1<<Al; previously-significant ones receive
    one correction bit each (two's-complement magnitude append, the
    libjpeg-documented convention). Returns new EOBRUN."""
    p1 = 1 << al
    m1 = -p1

    def correct(k):
        if reader.read_bit():
            if (int(blk[k]) & p1) == 0:
                blk[k] += p1 if blk[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_code(ac_codes)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r < 15:
                    eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("AC refinement magnitude != 1")
                newval = p1 if reader.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k] != 0:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _progressive_scan(
    np, payload, pos, frame, huff, scan_tabs, scan_comps, coefs,
    ss, se, ah, al, ri,
):
    """Decode ONE progressive scan into the coefficient store; returns
    the offset of the next marker. DC scans may interleave all frame
    components; AC scans are single-component per T.81 G.1."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    idx = {c[0]: ci for ci, c in enumerate(comps)}
    members = [idx[cs] for cs in scan_comps]
    reader = _BitReader(payload, pos)
    eobrun = 0
    try:
        if ss == 0:
            if se != 0:
                raise JpegError("DC scan with Se != 0")
            pred = {ci: 0 for ci in members}
            if len(members) > 1:  # interleaved over the MCU grid
                unit = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if ri and unit and unit % ri == 0:
                            reader.sync_restart()
                            pred = {ci: 0 for ci in members}
                        for ci in members:
                            cid, hi, vi, _tq = comps[ci]
                            dc_codes = huff[(0, scan_tabs[cid][0])]
                            for by in range(vi):
                                for bx in range(hi):
                                    blk = coefs[ci][my * vi + by, mx * hi + bx]
                                    if ah == 0:
                                        size = reader.read_code(dc_codes)
                                        diff = (
                                            _extend(reader.read_bits(size), size)
                                            if size
                                            else 0
                                        )
                                        pred[ci] += diff
                                        blk[0] = pred[ci] << al
                                    else:
                                        blk[0] = int(blk[0]) | (
                                            reader.read_bit() << al
                                        )
                        unit += 1
            else:  # non-interleaved single component
                ci = members[0]
                cid = comps[ci][0]
                dc_codes = huff[(0, scan_tabs[cid][0])]
                ch, cw = _comp_block_grid(frame, ci)
                unit = 0
                for by in range(ch):
                    for bx in range(cw):
                        if ri and unit and unit % ri == 0:
                            reader.sync_restart()
                            pred[ci] = 0
                        blk = coefs[ci][by, bx]
                        if ah == 0:
                            size = reader.read_code(dc_codes)
                            diff = (
                                _extend(reader.read_bits(size), size)
                                if size
                                else 0
                            )
                            pred[ci] += diff
                            blk[0] = pred[ci] << al
                        else:
                            blk[0] = int(blk[0]) | (reader.read_bit() << al)
                        unit += 1
        else:
            if len(members) != 1:
                raise JpegError("interleaved AC progressive scan")
            ci = members[0]
            cid = comps[ci][0]
            ac_codes = huff[(1, scan_tabs[cid][1])]
            ch, cw = _comp_block_grid(frame, ci)
            unit = 0
            for by in range(ch):
                for bx in range(cw):
                    if ri and unit and unit % ri == 0:
                        reader.sync_restart()
                        eobrun = 0
                    blk = coefs[ci][by, bx]
                    if ah == 0:
                        eobrun = _ac_first_block(
                            reader, ac_codes, blk, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine_block(
                            reader, ac_codes, blk, ss, se, al, eobrun
                        )
                    unit += 1
    except _Restart:
        raise JpegError("restart marker misaligned with DRI interval")
    # skip padding bits / restart markers up to the next true marker
    p = reader.pos
    while p + 1 < len(payload):
        if payload[p] == 0xFF and payload[p + 1] != 0x00:
            if 0xD0 <= payload[p + 1] <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    raise JpegError("unterminated progressive scan")


def _reconstruct_progressive(np, frame, qt, coefs):
    """All scans consumed: dequantize the coefficient store, IDCT every
    block (one einsum per component), upsample and color-convert —
    identical math to the baseline tail."""
    h, w, comps = frame
    M = _dct_matrix()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out = []
    for (cid, hi, vi, tq), arr in zip(comps, coefs):
        if tq not in qt:
            raise JpegError(f"missing quant table {tq}")
        q = qt[tq]
        by_n, bx_n, _ = arr.shape
        nat = np.zeros((by_n, bx_n, 64), dtype=np.float64)
        for i in range(64):
            nat[:, :, ZIGZAG[i]] = arr[:, :, i] * float(q[i])
        blocks = nat.reshape(by_n, bx_n, 8, 8)
        idct = np.einsum("ij,abjk,kl->abil", M.T, blocks, M)
        plane = idct.transpose(0, 2, 1, 3).reshape(by_n * 8, bx_n * 8)
        up = np.repeat(
            np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
        )
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


def _quantized_zigzag(np, planes, factors, h, w, mcuy, mcux, M, quant):
    """Per-component quantized zigzag coefficient arrays (bh, bw, 64).

    SHARED by the baseline and progressive encoders: float summation
    order changes which side of a rounding boundary a coefficient lands
    on (observed: a DC term computing 27.5 via einsum but 27.4999... via
    per-block matmul), so both encoders must derive their coefficients
    from this exact computation or identical inputs can quantize
    differently between them."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    out = []
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
        bh, bw = full.shape[0] // 8, full.shape[1] // 8
        blocks = full.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
        C = np.einsum("ij,abjk,kl->abil", M, blocks, M.T)
        Cn = np.floor_divide(np.round(C).astype(np.int64), quant)
        arr = np.zeros((bh, bw, 64), dtype=np.int32)
        flat = Cn.reshape(bh, bw, 64)
        for i in range(64):
            arr[:, :, i] = flat[:, :, ZIGZAG[i]]
        out.append(arr)
    return out


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
    coef_arrays = _quantized_zigzag(
        np, planes, factors, h, w, mcuy, mcux, M, quant
    )

    def encode_block(writer, zz, ci):
        t = 0 if ci == 0 else 1
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
                        encode_block(
                            writer,
                            [int(v) for v in
                             coef_arrays[ci][my * vi + by, mx * hi + bx]],
                            ci,
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (fixtures: spectral selection + successive
# approximation, T.81 Annex G encode side) --------------------------------

# Flat custom tables: Annex K's AC tables lack the EOBn symbols
# (0x10..0xE0) progressive needs, so fixtures carry uniform-length
# canonical tables covering the full progressive alphabet. 12 DC size
# categories at 4 bits; all 176 (run, size<=10) AC symbols at 8 bits —
# valid canonical prefix sets (incomplete trees; all-ones code unused).
PROG_DC = (
    [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _trunc_pt(v: int, al: int) -> int:
    """AC point transform: magnitude shift, sign preserved (G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def jpeg_encode_progressive(
    pixels, quant: int = 1, subsample: str = "444",
    dc_al: int = 1, ac_al: int = 1,
) -> bytes:
    """Progressive encoder covering ALL four scan kinds the decoder
    implements: interleaved DC first (Al=dc_al) + DC refinements down
    to 0, then per-component AC first (Ss=1..63, Al=ac_al) + AC
    refinements with EOB-run coding and correction bits. Set
    dc_al=ac_al=0 for a spectral-selection-only stream."""
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
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    M = _dct_matrix()

    # per-component quantized zigzag coefficients over the padded grid
    # (shared with the baseline encoder — see _quantized_zigzag)
    coef_arrays = _quantized_zigzag(
        np, planes, factors, h, w, mcuy, mcux, M, quant
    )

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([quant] * 64))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += _seg(0xC2, sof)
    dht = bytes([0x00]) + bytes(PROG_DC[0]) + bytes(PROG_DC[1])
    dht += bytes([0x10]) + bytes(PROG_AC[0]) + bytes(PROG_AC[1])
    out += _seg(0xC4, dht)
    enc_dc = _encode_codes(*PROG_DC)
    enc_ac = _encode_codes(*PROG_AC)

    def sos_header(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def comp_grid(ci):
        hi, vi = factors[ci]
        cw = (-(-(w * hi) // hmax) + 7) // 8
        ch = (-(-(h * vi) // vmax) + 7) // 8
        return ch, cw

    # --- scan 1: interleaved DC first ------------------------------------
    out += sos_header(list(range(1, nc + 1)), 0, 0, 0, dc_al)
    wtr = _BitWriter()
    pred = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = factors[ci]
                for by in range(vi):
                    for bx in range(hi):
                        v = int(coef_arrays[ci][my * vi + by, mx * hi + bx, 0])
                        v >>= dc_al  # arithmetic shift (G.1.2.1)
                        diff = v - pred[ci]
                        pred[ci] = v
                        size, bits_v = _magnitude(diff)
                        code, length = enc_dc[size]
                        wtr.write(code, length)
                        if size:
                            wtr.write(bits_v, size)
    wtr.flush()
    out += wtr.out

    # --- DC refinement scans ---------------------------------------------
    for al in range(dc_al - 1, -1, -1):
        out += sos_header(list(range(1, nc + 1)), 0, 0, al + 1, al)
        wtr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(nc):
                    hi, vi = factors[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            v = int(
                                coef_arrays[ci][my * vi + by, mx * hi + bx, 0]
                            )
                            wtr.write((v >> al) & 1, 1)
        wtr.flush()
        out += wtr.out

    # --- AC scans: per component, first then refinements ------------------
    for ci in range(nc):
        ch, cw = comp_grid(ci)
        arr = coef_arrays[ci]

        # AC first at Al=ac_al with EOB-run coding
        out += sos_header([ci + 1], 1, 63, 0, ac_al)
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rr = eobrun.bit_length() - 1
                code, length = enc_ac[rr << 4]
                wtr.write(code, length)
                if rr:
                    wtr.write(eobrun - (1 << rr), rr)
                eobrun = 0

        for by in range(ch):
            for bx in range(cw):
                vals = [_trunc_pt(int(arr[by, bx, k]), ac_al) for k in range(64)]
                last_nz = max((k for k in range(1, 64) if vals[k]), default=0)
                if last_nz == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(1, last_nz + 1):
                    v = vals[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[0xF0]
                        wtr.write(code, length)
                        run -= 16
                    size, bits_v = _magnitude(v)
                    if size > 10:
                        raise JpegError("AC magnitude too large for table")
                    code, length = enc_ac[(run << 4) | size]
                    wtr.write(code, length)
                    wtr.write(bits_v, size)
                    run = 0
                if last_nz < 63:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        wtr.flush()
        out += wtr.out

        # AC refinements (jcphuff-style correction-bit emission)
        for al in range(ac_al - 1, -1, -1):
            out += sos_header([ci + 1], 1, 63, al + 1, al)
            wtr = _BitWriter()
            eobrun = 0
            pending_bits: list[int] = []

            def flush_eob_refine():
                nonlocal eobrun, pending_bits
                if eobrun:
                    rr = eobrun.bit_length() - 1
                    code, length = enc_ac[rr << 4]
                    wtr.write(code, length)
                    if rr:
                        wtr.write(eobrun - (1 << rr), rr)
                    eobrun = 0
                for bit in pending_bits:
                    wtr.write(bit, 1)
                pending_bits = []

            for by in range(ch):
                for bx in range(cw):
                    absv = [
                        abs(_trunc_pt(int(arr[by, bx, k]), al)) for k in range(64)
                    ]
                    eob = 0
                    for k in range(1, 64):
                        if absv[k] == 1:
                            eob = k
                    run = 0
                    br: list[int] = []
                    for k in range(1, 64):
                        t = absv[k]
                        if t == 0:
                            run += 1
                            continue
                        # ZRL check runs at EVERY nonzero coefficient
                        # (G.7): a history coefficient sitting past the
                        # 16th zero must get its correction bit buffered
                        # AFTER the ZRL that covers those zeros, or the
                        # decoder's skip loop reads it one code early
                        while run > 15 and k <= eob:
                            flush_eob_refine()
                            code, length = enc_ac[0xF0]
                            wtr.write(code, length)
                            run -= 16
                            for bit in br:
                                wtr.write(bit, 1)
                            br = []
                        if t > 1:  # history coefficient: correction bit
                            br.append(t & 1)
                            continue
                        # newly significant (t == 1)
                        flush_eob_refine()
                        code, length = enc_ac[(run << 4) | 1]
                        wtr.write(code, length)
                        wtr.write(1 if arr[by, bx, k] >= 0 else 0, 1)
                        for bit in br:
                            wtr.write(bit, 1)
                        br = []
                        run = 0
                    if run > 0 or br:
                        eobrun += 1
                        pending_bits.extend(br)
                        if eobrun == 0x7FFF:
                            flush_eob_refine()
            flush_eob_refine()
            wtr.flush()
            out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)
