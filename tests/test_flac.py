"""FLAC codec pins (sources/flac.py): round-trip identity across every
predictor and stereo-decorrelation path, spec-derived byte-literal
fixtures assembled WITHOUT the codec (de-circularized, the PDF-CID
fixture pattern), CRC/MD5 integrity detection, and a light fuzz."""

from __future__ import annotations

import math
import random

import pytest

from memvid_spark.sources.flac import (
    FlacError,
    flac_decode,
    flac_encode,
    flac_metadata,
)


def _rt(channels, sr=44100, bps=16, bs=4096, mode="auto"):
    enc = flac_encode(channels, sr, bps=bps, block_size=bs, stereo_mode=mode)
    dec = flac_decode(enc, verify_md5=True)
    assert dec.sample_rate == sr
    assert dec.bits_per_sample == bps
    assert [list(c) for c in dec.channels] == [list(c) for c in channels]
    return enc


def test_mono_signal_families_round_trip():
    random.seed(7)
    n = 5000
    fams = {
        "const": [1234] * n,
        "ramp": [(i % 2000) - 1000 for i in range(n)],
        "noise": [random.randint(-32768, 32767) for _ in range(n)],
        "smooth": [
            int(8000 * math.sin(i / 50) + 200 * math.sin(i / 3))
            for i in range(n)
        ],
    }
    sizes = {}
    for name, ch in fams.items():
        sizes[name] = len(_rt([ch]))
    # lossless AND actually compressing where the signal allows it
    assert sizes["const"] < n * 2 * 0.02
    assert sizes["smooth"] < n * 2 * 0.5
    assert sizes["ramp"] < n * 2 * 0.5
    # white noise is incompressible; verbatim fallback keeps it ~1x
    assert sizes["noise"] < n * 2 * 1.05


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side", "auto"]
)
def test_stereo_modes_round_trip(mode):
    random.seed(11)
    n = 3000
    left = [int(6000 * math.sin(i / 40)) for i in range(n)]
    right = [
        int(6000 * math.sin(i / 40 + 0.2)) + random.randint(-30, 30)
        for i in range(n)
    ]
    _rt([left, right], mode=mode)


def test_auto_picks_cheapest_stereo_mode():
    random.seed(3)
    n = 4096
    left = [int(5000 * math.sin(i / 30)) for i in range(n)]
    right = [v + random.randint(-2, 2) for v in left]  # tiny side channel
    auto = len(_rt([left, right], mode="auto"))
    indep = len(_rt([left, right], mode="independent"))
    assert auto <= indep  # near-identical channels: decorrelation wins


def test_block_sizes_bit_depths_sample_rates():
    random.seed(5)
    _rt([[random.randint(-100, 100) for _ in range(777)]], bs=192)
    _rt([[random.randint(-100, 100) for _ in range(300)]], bs=250)
    _rt([[random.randint(-100, 100) for _ in range(700)]], bs=300)
    _rt([[random.randint(-8, 7) for _ in range(1000)]], bps=8)
    _rt([[random.randint(-(2**23), 2**23 - 1) for _ in range(999)]], bps=24)
    _rt([[5] * 10])
    _rt([[1, 2, 3, 4] * 100], sr=12345)  # 16-bit-Hz header form
    _rt([[1, 2, 3, 4] * 100], sr=123450)  # 10s-of-Hz header form


def test_metadata_without_frame_decode():
    enc = flac_encode([[0] * 321, [0] * 321], 48000, bps=16)
    assert flac_metadata(enc) == {
        "sample_rate": 48000,
        "n_channels": 2,
        "bits_per_sample": 16,
        "n_samples": 321,
    }


# ---------------------------------------------------------------------------
# De-circularized fixtures: bytes assembled from the spec by independent
# test-local bit packing — the decoder never meets its own writer here.
# ---------------------------------------------------------------------------


def _crc8_ref(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def _crc16_ref(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 else (r << 1) & 0xFFFF
    return r


class _Bits:
    def __init__(self):
        self.v, self.n = 0, 0

    def put(self, value, bits):
        self.v = (self.v << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        return self

    def bytes(self):
        assert self.n % 8 == 0
        return self.v.to_bytes(self.n // 8, "big")


def _streaminfo(block, sr, ch, bps, total) -> bytes:
    b = _Bits()
    b.put(block, 16).put(block, 16).put(0, 24).put(0, 24)
    b.put(sr, 20).put(ch - 1, 3).put(bps - 1, 5).put(total, 36)
    body = b.bytes() + b"\x00" * 16  # md5 zero = unverified
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_hand_assembled_verbatim_frame_decodes():
    """Mono 44.1k/16-bit, 4-sample VERBATIM frame written bit-by-bit
    from the format spec."""
    samples = [100, -100, 300, -300]
    hdr = _Bits()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)  # sync, reserved, fixed-bs
    hdr.put(0b0110, 4)   # block size: 8-bit at end of header
    hdr.put(0b1001, 4)   # 44.1 kHz
    hdr.put(0b0000, 4)   # 1 channel
    hdr.put(0b100, 3)    # 16 bits per sample
    hdr.put(0, 1)
    hdr.put(0, 8)        # frame number 0 (UTF-8 single byte)
    hdr.put(4 - 1, 8)    # block size - 1
    hb = hdr.bytes()
    frame = _Bits()
    for byte in hb:
        frame.put(byte, 8)
    frame.put(_crc8_ref(hb), 8)
    frame.put(0, 1).put(0b000001, 6).put(0, 1)  # VERBATIM subframe
    for s in samples:
        frame.put(s, 16)
    fb = frame.bytes()
    payload = _streaminfo(4, 44100, 1, 16, 4) + fb + _crc16_ref(fb).to_bytes(2, "big")
    dec = flac_decode(payload)
    assert dec.channels == [samples]
    assert dec.sample_rate == 44100 and dec.bits_per_sample == 16


def test_hand_assembled_fixed_rice_frame_decodes():
    """FIXED order-1 subframe with rice-coded residuals, assembled from
    the spec: samples 10,12,14,16 -> warmup 10, residuals 2,2,2 at k=1."""
    hdr = _Bits()
    hdr.put(0x3FFE, 14).put(0, 1).put(0, 1)
    hdr.put(0b0110, 4).put(0b1001, 4).put(0b0000, 4).put(0b100, 3).put(0, 1)
    hdr.put(0, 8)
    hdr.put(4 - 1, 8)
    hb = hdr.bytes()
    f = _Bits()
    for byte in hb:
        f.put(byte, 8)
    f.put(_crc8_ref(hb), 8)
    f.put(0, 1).put(0b001001, 6).put(0, 1)  # FIXED order 1
    f.put(10, 16)                           # warmup sample
    f.put(0b00, 2).put(0b0000, 4).put(1, 4)  # rice4, part order 0, k=1
    for _ in range(3):  # residual 2 -> zigzag 4 -> q=2 ('001'), rem 0
        f.put(0b0010, 4)
    f.put(0, (8 - f.n % 8) % 8)  # byte-align the frame
    fb = f.bytes()
    payload = _streaminfo(4, 44100, 1, 16, 4) + fb + _crc16_ref(fb).to_bytes(2, "big")
    dec = flac_decode(payload)
    assert dec.channels == [[10, 12, 14, 16]]


def test_corruption_is_detected():
    enc = bytearray(flac_encode([[i % 97 for i in range(500)]], 8000))
    # flip a bit inside frame data (past STREAMINFO = 4 + 4 + 34 bytes)
    enc[60] ^= 0x01
    with pytest.raises(FlacError):
        flac_decode(bytes(enc), verify_md5=True)
    with pytest.raises(FlacError):
        flac_decode(b"fLaX" + bytes(100))
    with pytest.raises(FlacError):
        flac_decode(flac_encode([[1, 2, 3]], 8000)[:-3])


def test_fuzz_round_trip_all_modes():
    random.seed(42)
    for trial in range(25):
        n = random.randint(1, 900)
        n_ch = random.choice([1, 1, 2])
        bps = random.choice([8, 16, 16, 24])
        lim = 1 << (bps - 1)
        chans = [
            [random.randint(-lim, lim - 1) for _ in range(n)]
            for _ in range(n_ch)
        ]
        mode = random.choice(
            ["auto", "independent", "left_side", "right_side", "mid_side"]
        ) if n_ch == 2 else "auto"
        bs = random.choice([192, 256, 300, 4096])
        _rt(chans, sr=random.choice([8000, 16000, 44100]), bps=bps,
            bs=bs, mode=mode)


def test_decode_fuzz_fail_closed():
    """Random and truncated inputs must raise FlacError — never
    IndexError/KeyError/hang (the fail-closed fuzz contract every codec
    in sources/ follows)."""
    random.seed(99)
    base = flac_encode(
        [[random.randint(-1000, 1000) for _ in range(400)]], 16000
    )
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(random.randint(1, 6)):
            buf[random.randrange(len(buf))] = random.randrange(256)
        try:
            flac_decode(bytes(buf), verify_md5=True)
        except FlacError:
            pass  # expected: detected corruption
        # surviving decode is fine too (mutation hit dead bytes AND
        # missed every CRC): the contract is no foreign exceptions
    for cut in range(0, len(base), 17):
        try:
            flac_decode(base[:cut])
        except FlacError:
            pass
    for _ in range(200):
        junk = bytes(random.randrange(256)
                     for _ in range(random.randint(0, 120)))
        try:
            flac_decode(b"fLaC" + junk)
        except FlacError:
            pass


def test_flac_integrated_into_format_ladder():
    """put_bytes-level integration: magic sniff routes FLAC, the reader
    registry describes it, and the audio feature/decode surface treats
    WAV and FLAC of the same waveform identically."""
    from memvid_spark.sources.audio import (
        audio_feature_vec,
        decode_audio_any,
        wav_encode,
    )
    from memvid_spark.sources.readers import READERS, sniff_format

    random.seed(21)
    wave_ = [[random.randint(-3000, 3000) for _ in range(500)],
             [random.randint(-3000, 3000) for _ in range(500)]]
    f = flac_encode(wave_, 16000)
    w = wav_encode(list(zip(*wave_)), 16000)
    assert sniff_format(f) == "flac"
    desc = READERS["flac"](f)
    assert "flac audio 16000hz 2ch 16bit 500 frames" in desc
    assert audio_feature_vec(f, "audio/flac") == audio_feature_vec(
        w, "audio/wav"
    )
    a, b = decode_audio_any(f), decode_audio_any(w)
    assert (a.samples == b.samples).all()
    assert (a.sample_rate, a.channels) == (b.sample_rate, b.channels)


def test_8bit_flac_centered_matches_signed_source():
    """FLAC stores 8-bit samples SIGNED; WavAudio's 1-byte convention is
    WAV's UNSIGNED (centered() subtracts 128). decode_audio_any must
    re-bias on the way in, so centered() returns the original signed
    waveform — not the doubly-shifted one."""
    from memvid_spark.sources.audio import decode_audio_any

    src = [10, -10, 50, -50, 127, -128, 0, 64]
    a = decode_audio_any(flac_encode([src], 8000, bps=8))
    assert a.sampwidth == 1
    assert list(a.centered()[:, 0]) == src


def test_flac_audio_features_df_matches_wav(spark):
    """The DataFrame feature kernel produces identical stats whether the
    payload arrived as WAV or FLAC."""
    from memvid_spark.sources.audio import audio_features, wav_encode

    random.seed(22)
    clips = {
        mid: [random.randint(-2000, 2000) for _ in range(300 + mid)]
        for mid in range(4)
    }
    rows_w = [(mid, wav_encode(clip, 8000)) for mid, clip in clips.items()]
    rows_f = [(mid, flac_encode([clip], 8000)) for mid, clip in clips.items()]
    schema = "media_id long, payload binary"
    out_w = sorted(map(tuple, audio_features(
        spark.createDataFrame(rows_w, schema)).collect()))
    out_f = sorted(map(tuple, audio_features(
        spark.createDataFrame(rows_f, schema)).collect()))
    assert out_w == out_f
