"""Pure-stdlib FLAC codec: real lossless audio decode + encode.

The reference ingests audio for Whisper transcription (src/whisper.rs:
49-116) and stores media blobs with typed metadata (src/types/
metadata.rs); round 3 made WAV/PCM first-class (sources/audio.py).
This module adds the compressed lossless tier — FLAC — so an audio
corpus stored the way audio is actually stored round-trips through the
engine losslessly.

Implements the FLAC format (https://xiph.org/flac/format.html):

Decoder (spec subset wide enough for real-world files):
- STREAMINFO metadata block (+ skipping all other block types)
- frame headers: both blocking strategies, every block-size and
  sample-rate code (incl. 8/16-bit explicit forms), UTF-8-coded
  frame/sample numbers, CRC-8 verification
- channel assignments: 1-8 independent, left/side, right/side,
  mid/side (side channel decoded at bps+1 per the spec)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients, arithmetic-shift prediction), wasted bits
- residuals: 4-bit (method 0) and 5-bit (method 1) rice parameters,
  any partition order, escape-coded raw partitions
- frame CRC-16 verification and optional STREAMINFO MD5 verification

Encoder (always produces spec-valid files the decoder and any player
can read):
- block-sized frames, per-subframe predictor search: CONSTANT /
  FIXED orders 0-4 / LPC (autocorrelation + Levinson-Durbin, order 8,
  12-bit quantized coefficients), picked by exact rice-cost
- per-partition rice parameter search (partition order 0), VERBATIM
  fallback
- stereo decorrelation search: independent / left-side / right-side /
  mid-side, picked by cost (or forced via ``stereo_mode`` — the tests
  force each mode so every decode path round-trips)
- STREAMINFO with the interleaved-sample MD5 the spec requires

Everything is stdlib + NumPy-for-arithmetic; no audio libraries.
"""

from __future__ import annotations

import hashlib
import struct
from dataclasses import dataclass


class FlacError(ValueError):
    """Malformed or unsupported FLAC payload."""


# ---------------------------------------------------------------------------
# CRCs (FLAC: CRC-8 poly 0x07 over the frame header, CRC-16 poly 0x8005
# over the whole frame; both init 0, MSB-first, no reflection)
# ---------------------------------------------------------------------------


def _make_crc8_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
        tbl.append(r)
    return tbl


def _make_crc16_table() -> list[int]:
    tbl = []
    for b in range(256):
        r = b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
        tbl.append(r)
    return tbl


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# Bit IO (MSB-first, no byte stuffing — unlike JPEG's)
# ---------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0  # bits consumed within current byte (0-7)

    def read(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        v = 0
        data, pos, bit = self.data, self.pos, self.bit
        while n > 0:
            if pos >= len(data):
                raise FlacError("unexpected end of stream")
            avail = 8 - bit
            take = avail if avail < n else n
            cur = data[pos]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            bit += take
            n -= take
            if bit == 8:
                bit = 0
                pos += 1
        self.pos, self.bit = pos, bit
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count zero bits up to the terminating one bit."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# UTF-8-style frame/sample number coding (spec: like UTF-8, up to 36 bits)
# ---------------------------------------------------------------------------


def _utf8_encode(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    marks = [(0x7FF, 2), (0xFFFF, 3), (0x1FFFFF, 4), (0x3FFFFFF, 5),
             (0x7FFFFFFF, 6), (0xFFFFFFFFF, 7)]
    for limit, size in marks:
        if n <= limit:
            out = bytearray(size)
            for i in range(size - 1, 0, -1):
                out[i] = 0x80 | (n & 0x3F)
                n >>= 6
            lead = (0xFF << (8 - size)) & 0xFF if size < 8 else 0xFE
            out[0] = lead | n
            return bytes(out)
    raise FlacError("frame number too large")


def _utf8_decode(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    size = 0
    mask = 0x80
    while b0 & mask:
        size += 1
        mask >>= 1
    if size < 2 or size > 7:
        raise FlacError("bad UTF-8 coded number")
    n = b0 & (0xFF >> (size + 1))
    for _ in range(size - 1):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("bad UTF-8 continuation")
        n = (n << 6) | (b & 0x3F)
    return n


# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

_SAMPLE_RATES = {
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}
_SAMPLE_RATE_CODE = {v: k for k, v in _SAMPLE_RATES.items()}

_SAMPLE_SIZES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24,
                 0b111: 32}
_SAMPLE_SIZE_CODE = {v: k for k, v in _SAMPLE_SIZES.items()}

# fixed predictor coefficients by order (spec §restricted linear predictors)
_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


@dataclass
class FlacAudio:
    """Decoded FLAC stream: per-channel sample lists (ints)."""

    channels: list  # list of per-channel sample sequences
    sample_rate: int
    bits_per_sample: int

    @property
    def n_channels(self) -> int:
        return len(self.channels)

    @property
    def n_samples(self) -> int:
        return len(self.channels[0]) if self.channels else 0


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_streaminfo(r: _BitReader) -> dict:
    info = {
        "min_block": r.read(16), "max_block": r.read(16),
        "min_frame": r.read(24), "max_frame": r.read(24),
        "sample_rate": r.read(20),
        "channels": r.read(3) + 1,
        "bps": r.read(5) + 1,
        "total_samples": r.read(36),
    }
    info["md5"] = bytes(r.read(8) for _ in range(16))
    return info


def _decode_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if block_size % n_parts:
        raise FlacError("partition order does not divide block size")
    residual: list[int] = []
    for p in range(n_parts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        k = r.read(pbits)
        if k == escape:
            raw = r.read(5)
            if raw == 0:
                residual.extend([0] * n)
            else:
                residual.extend(r.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << k) | r.read(k) if k else q
                residual.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return residual


def _decode_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise FlacError("subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        bps -= wasted
    if ftype == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        out = warm[:]
        coefs = _FIXED_COEFS[order]
        for i in range(order, block_size):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * out[i - 1 - j]
            out.append(pred + res[i - order])
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _decode_residual(r, block_size, order)
        out = warm[:]
        for i in range(order, block_size):
            acc = 0
            for j in range(order):
                acc += coefs[j] * out[i - 1 - j]
            out.append((acc >> shift) + res[i - order])
    else:
        raise FlacError(f"reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def flac_decode(payload: bytes, verify_md5: bool = False) -> FlacAudio:
    """Decode a FLAC byte stream to per-channel integer samples."""
    if payload[:4] != b"fLaC":
        raise FlacError("missing fLaC marker")
    r = _BitReader(payload, 4)
    info = None
    while True:
        last = r.read(1)
        btype = r.read(7)
        length = r.read(24)
        if btype == 0:
            info = _read_streaminfo(r)
        else:
            for _ in range(length):
                r.read(8)
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    channels = [[] for _ in range(info["channels"])]
    total = info["total_samples"]
    while r.pos < len(payload) and (total == 0 or len(channels[0]) < total):
        _decode_frame(r, info, channels)
    if total and len(channels[0]) > total:
        channels = [ch[:total] for ch in channels]
    audio = FlacAudio(channels, info["sample_rate"], info["bps"])
    if verify_md5 and info["md5"] != b"\x00" * 16:
        if _samples_md5(channels, info["bps"]) != info["md5"]:
            raise FlacError("STREAMINFO MD5 mismatch")
    return audio


def _decode_frame(r: _BitReader, info: dict, channels: list) -> None:
    start = r.pos
    if r.bit:
        raise FlacError("frame not byte-aligned")
    sync = r.read(14)
    if sync != 0x3FFE:
        raise FlacError("bad frame sync")
    if r.read(1) != 0:
        raise FlacError("reserved bit set")
    r.read(1)  # blocking strategy (number semantics, not needed here)
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_code = r.read(4)
    ss_code = r.read(3)
    if r.read(1) != 0:
        raise FlacError("reserved bit set")
    _utf8_decode(r)  # frame/sample number
    if bs_code == 0:
        raise FlacError("reserved block size")
    elif bs_code == 1:
        block_size = 192
    elif bs_code <= 5:
        block_size = 576 << (bs_code - 2)
    elif bs_code == 6:
        block_size = r.read(8) + 1
    elif bs_code == 7:
        block_size = r.read(16) + 1
    else:
        block_size = 256 << (bs_code - 8)
    if sr_code == 0:
        pass
    elif sr_code in _SAMPLE_RATES:
        pass
    elif sr_code == 0b1100:
        r.read(8)
    elif sr_code in (0b1101, 0b1110):
        r.read(16)
    else:
        raise FlacError("invalid sample rate code")
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SAMPLE_SIZES:
        bps = _SAMPLE_SIZES[ss_code]
    else:
        raise FlacError("reserved sample size")
    header = r.data[start : r.pos]
    if crc8(header) != r.read(8):
        raise FlacError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        subs = [_decode_subframe(r, block_size, bps) for _ in range(n_ch)]
    elif ch_code == 8:  # left/side
        left = _decode_subframe(r, block_size, bps)
        side = _decode_subframe(r, block_size, bps + 1)
        subs = [left, [l - s for l, s in zip(left, side)]]
    elif ch_code == 9:  # right/side
        side = _decode_subframe(r, block_size, bps + 1)
        right = _decode_subframe(r, block_size, bps)
        subs = [[rr + s for rr, s in zip(right, side)], right]
    elif ch_code == 10:  # mid/side
        mid = _decode_subframe(r, block_size, bps)
        side = _decode_subframe(r, block_size, bps + 1)
        subs = [[], []]
        for m, s in zip(mid, side):
            m2 = (m << 1) | (s & 1)
            subs[0].append((m2 + s) >> 1)
            subs[1].append((m2 - s) >> 1)
    else:
        raise FlacError("reserved channel assignment")
    if len(subs) != len(channels):
        raise FlacError("channel count changed mid-stream")
    r.align()
    frame = r.data[start : r.pos]
    if crc16(frame) != r.read(16):
        raise FlacError("frame CRC-16 mismatch")
    for ch, sub in zip(channels, subs):
        ch.extend(sub)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _rice_cost(res, k: int) -> int:
    return sum((_zigzag(v) >> k) + 1 + k for v in res)


def _best_rice_k(res, pbits: int) -> tuple[int, int]:
    """(k, cost) minimizing the exact rice bit cost; caps at the
    largest legal parameter for the coding method."""
    best_k, best_c = 0, None
    for k in range((1 << pbits) - 1):
        c = _rice_cost(res, k)
        if best_c is None or c < best_c:
            best_k, best_c = k, c
        elif c > best_c * 2:
            break  # cost is convex in k; stop once clearly past the min
    return best_k, best_c


def _fixed_residual(samples, order: int):
    coefs = _FIXED_COEFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        for i in range(order, len(samples))
    ]


def _lpc_coefs(samples, order: int, precision: int = 12):
    """Autocorrelation + Levinson-Durbin, coefficients quantized to
    ``precision`` bits with a non-negative shift (libFLAC's scheme,
    re-derived). Returns (qcoefs, shift) or None if degenerate."""
    n = len(samples)
    if n <= order:
        return None
    x = [float(s) for s in samples]
    auto = []
    for lag in range(order + 1):
        acc = 0.0
        for i in range(lag, n):
            acc += x[i] * x[i - lag]
        auto.append(acc)
    if auto[0] == 0.0:
        return None
    err = auto[0]
    lpc = [0.0] * order
    for i in range(order):
        acc = auto[i + 1]
        for j in range(i):
            acc -= lpc[j] * auto[i - j]
        k = acc / err
        new = lpc[:]
        new[i] = k
        for j in range(i):
            new[j] = lpc[j] - k * lpc[i - 1 - j]
        lpc = new
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    cmax = max(abs(c) for c in lpc)
    if cmax == 0.0:
        return None
    shift = precision - 1
    while (1 << shift) * cmax >= (1 << (precision - 1)) and shift > 0:
        shift -= 1
    lim = 1 << (precision - 1)
    q = [max(-lim, min(lim - 1, round(c * (1 << shift)))) for c in lpc]
    if all(v == 0 for v in q):
        return None
    return q, shift


def _lpc_residual(samples, qcoefs, shift: int):
    order = len(qcoefs)
    out = []
    for i in range(order, len(samples)):
        acc = 0
        for j in range(order):
            acc += qcoefs[j] * samples[i - 1 - j]
        out.append(samples[i] - (acc >> shift))
    return out


def _write_residual(w: _BitWriter, res, k: int) -> None:
    w.write(0, 2)  # method 0: 4-bit rice parameters
    w.write(0, 4)  # partition order 0
    w.write(k, 4)
    for v in res:
        u = _zigzag(v)
        w.write_unary(u >> k)
        if k:
            w.write(u & ((1 << k) - 1), k)


def _encode_subframe(w: _BitWriter, samples, bps: int) -> None:
    n = len(samples)
    if n and all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(samples[0], bps)
        return
    # candidate predictors: fixed 0-4 (order < n) by exact rice cost
    best = None  # (cost, kind, order, res, k, extra)
    for order in range(5):
        if order >= n:
            break
        res = _fixed_residual(samples, order)
        k, cost = _best_rice_k(res, 4)
        total = cost + order * bps
        if best is None or total < best[0]:
            best = (total, "fixed", order, res, k, None)
    lpc = _lpc_coefs(samples, min(8, n - 1)) if n > 9 else None
    if lpc is not None:
        qcoefs, shift = lpc
        res = _lpc_residual(samples, qcoefs, shift)
        k, cost = _best_rice_k(res, 4)
        total = cost + len(qcoefs) * bps + len(qcoefs) * 12 + 9
        if best is None or total < best[0]:
            best = (total, "lpc", len(qcoefs), res, k, (qcoefs, shift))
    if best is None or best[0] >= n * bps:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in samples:
            w.write(s, bps)
        return
    _, kind, order, res, k, extra = best
    w.write(0, 1)
    if kind == "fixed":
        w.write(8 + order, 6)
        w.write(0, 1)  # no wasted bits
        for s in samples[:order]:
            w.write(s, bps)
    else:
        qcoefs, shift = extra
        w.write(32 + order - 1, 6)
        w.write(0, 1)
        for s in samples[:order]:
            w.write(s, bps)
        w.write(12 - 1, 4)  # precision 12
        w.write(shift, 5)
        for c in qcoefs:
            w.write(c, 12)
    _write_residual(w, res, k)


def _subframe_cost(samples, bps: int) -> int:
    """Exact bit size a channel would encode to (by dry-running)."""
    w = _BitWriter()
    _encode_subframe(w, samples, bps)
    return len(w.out) * 8 + w.nbits


def _samples_md5(channels, bps: int) -> bytes:
    width = (bps + 7) // 8
    h = hashlib.md5()
    n = len(channels[0]) if channels else 0
    buf = bytearray()
    for i in range(n):
        for ch in channels:
            buf += int(ch[i]).to_bytes(width, "little", signed=True)
    h.update(bytes(buf))
    return h.digest()


def flac_encode(
    channels,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
) -> bytes:
    """Encode per-channel integer samples to a valid FLAC stream.

    ``stereo_mode``: 'auto' picks the cheapest of independent /
    left_side / right_side / mid_side per frame (2-channel input only);
    forcing a mode exercises a specific decorrelation path.
    """
    channels = [list(map(int, ch)) for ch in channels]
    if not channels or not channels[0]:
        raise FlacError("no samples")
    n_ch = len(channels)
    if n_ch > 8:
        raise FlacError("too many channels")
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise FlacError("channel length mismatch")
    lim = 1 << (bps - 1)
    for ch in channels:
        for s in ch:
            if not (-lim <= s < lim):
                raise FlacError("sample exceeds bits-per-sample range")
    out = bytearray(b"fLaC")
    # STREAMINFO (single metadata block, last=1)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = si.bytes() + _samples_md5(channels, bps)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    for off in range(0, n, block_size):
        blk = [ch[off : off + block_size] for ch in channels]
        out += _encode_frame(blk, frame_no, sample_rate, bps, block_size,
                             stereo_mode)
        frame_no += 1
    return bytes(out)


def _encode_frame(blk, frame_no, sample_rate, bps, nominal_bs, stereo_mode):
    bs = len(blk[0])
    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)  # fixed-blocksize strategy, frame number coded
    if bs == 192:
        bs_code, bs_extra = 1, None
    elif bs in (576, 1152, 2304, 4608):
        bs_code, bs_extra = 2 + (bs // 576).bit_length() - 1, None
    elif bs in (256, 512, 1024, 2048, 4096, 8192, 16384, 32768):
        bs_code, bs_extra = 8 + (bs // 256).bit_length() - 1, None
    elif bs <= 256:
        bs_code, bs_extra = 6, (bs - 1, 8)
    else:
        bs_code, bs_extra = 7, (bs - 1, 16)
    w.write(bs_code, 4)
    if sample_rate in _SAMPLE_RATE_CODE:
        sr_code, sr_extra = _SAMPLE_RATE_CODE[sample_rate], None
    elif sample_rate < 65536:
        sr_code, sr_extra = 0b1101, (sample_rate, 16)
    elif sample_rate % 10 == 0 and sample_rate // 10 < 65536:
        sr_code, sr_extra = 0b1110, (sample_rate // 10, 16)
    else:
        sr_code, sr_extra = 0, None  # from STREAMINFO
    w.write(sr_code, 4)
    mode = stereo_mode
    if len(blk) != 2:
        mode = "independent"
    elif mode == "auto":
        left, right = blk
        side = [l - r for l, r in zip(left, right)]
        mid = [(l + r) >> 1 for l, r in zip(left, right)]
        costs = {
            "independent": _subframe_cost(left, bps) + _subframe_cost(right, bps),
            "left_side": _subframe_cost(left, bps) + _subframe_cost(side, bps + 1),
            "right_side": _subframe_cost(side, bps + 1) + _subframe_cost(right, bps),
            "mid_side": _subframe_cost(mid, bps) + _subframe_cost(side, bps + 1),
        }
        mode = min(costs, key=lambda m: (costs[m], m))
    if mode == "independent":
        ch_code = len(blk) - 1
    else:
        ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[mode]
    w.write(ch_code, 4)
    w.write(_SAMPLE_SIZE_CODE.get(bps, 0), 3)
    w.write(0, 1)
    for b in _utf8_encode(frame_no):
        w.write(b, 8)
    if bs_extra:
        w.write(*bs_extra)
    if sr_extra:
        w.write(*sr_extra)
    w.align()
    hdr = w.bytes()
    w = _BitWriter()
    for b in hdr:
        w.write(b, 8)
    w.write(crc8(hdr), 8)
    if mode == "independent":
        for ch in blk:
            _encode_subframe(w, ch, bps)
    else:
        left, right = blk
        side = [l - r for l, r in zip(left, right)]
        if mode == "left_side":
            _encode_subframe(w, left, bps)
            _encode_subframe(w, side, bps + 1)
        elif mode == "right_side":
            _encode_subframe(w, side, bps + 1)
            _encode_subframe(w, right, bps)
        else:
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _encode_subframe(w, mid, bps)
            _encode_subframe(w, side, bps + 1)
    w.align()
    frame = w.bytes()
    return frame + struct.pack(">H", crc16(frame))


# ---------------------------------------------------------------------------
# Metadata / feature helpers (the engine-facing surface)
# ---------------------------------------------------------------------------


def flac_metadata(payload: bytes) -> dict:
    """STREAMINFO fields without decoding audio frames."""
    if payload[:4] != b"fLaC":
        raise FlacError("missing fLaC marker")
    r = _BitReader(payload, 4)
    while True:
        last = r.read(1)
        btype = r.read(7)
        length = r.read(24)
        if btype == 0:
            info = _read_streaminfo(r)
            return {
                "sample_rate": info["sample_rate"],
                "n_channels": info["channels"],
                "bits_per_sample": info["bps"],
                "n_samples": info["total_samples"],
            }
        for _ in range(length):
            r.read(8)
        if last:
            raise FlacError("missing STREAMINFO")
