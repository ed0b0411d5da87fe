"""WAV codec tests: stdlib-wave round trips (independent encoder — the
decode path never reads bytes this repo's own writer produced), hand-built
byte-level fixtures for every supported format tier (8/16/24-bit PCM,
float32, WAVE_FORMAT_EXTENSIBLE, junk chunks, odd-size padding), error
paths, waveform features, energy segmentation, and the Spark operators.
Reference parity: src/whisper.rs:49-116 (audio → samples → segments),
src/types/metadata.rs (audio metadata fields)."""

import struct

import numpy as np
import pytest

from memvid_spark.sources.audio import (
    audio_energy_segments,
    audio_feature_vec,
    audio_features,
    energy_segments,
    wav_decode,
    wav_describe,
    wav_encode,
    wav_metadata,
)
from memvid_spark.sources.multimodal import decode_audio, media_feature_vec
from memvid_spark.sources.readers import READERS, sniff_format


def riff(chunks):
    """Hand-assembled RIFF container (NOT the repo's writer)."""
    body = b"WAVE"
    for cid, data in chunks:
        body += cid + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def fmt_chunk(tag, channels, rate, bits):
    return struct.pack("<HHIIHH", tag, channels, rate,
                       rate * channels * (bits // 8), channels * (bits // 8), bits)


# --- stdlib-wave round trips (independent encoder) -----------------------


def test_pcm16_mono_roundtrip():
    s = ((np.arange(1000) * 37) % 65536 - 32768).astype(np.int16)
    a = wav_decode(wav_encode(s, 16000))
    assert (a.sample_rate, a.channels, a.sampwidth, a.is_float) == (16000, 1, 2, False)
    assert a.n_frames == 1000 and a.duration_ms == 62
    assert (a.samples[:, 0] == s).all()
    assert (a.centered() == a.samples).all()  # 16-bit already signed


def test_pcm16_stereo_interleave():
    left = np.arange(-50, 50, dtype=np.int16)
    st = np.stack([left, (-left // 2).astype(np.int16)], axis=1)
    a = wav_decode(wav_encode(st, 8000))
    assert a.channels == 2 and (a.samples == st).all()


# --- hand-built fixtures for the tiers stdlib wave cannot write ----------


def test_float32_with_junk_and_odd_chunks():
    f32 = np.linspace(-1, 1, 51, dtype="<f4")
    p = riff([
        (b"JUNK", b"xxx"),                      # odd size → pad byte honored
        (b"fmt ", fmt_chunk(3, 1, 44100, 32)),  # IEEE float
        (b"LIST", b"INFOabc"),                  # skipped metadata chunk
        (b"data", f32.tobytes()),
    ])
    a = wav_decode(p)
    assert a.is_float and a.n_frames == 51 and a.sample_rate == 44100
    assert np.abs(a.samples[:, 0] - f32.astype("f8")).max() < 1e-7


GUID_TAIL = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def test_extensible_24bit_pcm():
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456, -654321],
                    dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    fmt = (fmt_chunk(0xFFFE, 1, 48000, 24)
           + struct.pack("<HHI", 22, 24, 1)            # cbSize, validBits, mask
           + struct.pack("<H", 1) + b"\x00\x00" + GUID_TAIL)  # PCM subformat
    a = wav_decode(riff([(b"fmt ", fmt), (b"data", raw)]))
    assert a.sampwidth == 3 and not a.is_float
    assert (a.samples[:, 0] == vals).all()


def test_pcm8_unsigned_centering():
    p = riff([(b"fmt ", fmt_chunk(1, 1, 8000, 8)), (b"data", bytes([0, 128, 255]))])
    a = wav_decode(p)
    assert list(a.samples[:, 0]) == [0, 128, 255]  # stored values per spec
    assert list(a.centered()[:, 0]) == [-128, 0, 127]


def test_pcm32_and_trailing_partial_frame():
    vals = np.array([1 << 30, -(1 << 30), 7], dtype="<i4")
    p = riff([(b"fmt ", fmt_chunk(1, 1, 22050, 32)),
              (b"data", vals.tobytes() + b"\x01\x02")])  # ragged tail dropped
    a = wav_decode(p)
    assert a.n_frames == 3 and (a.samples[:, 0] == vals.astype(np.int64)).all()


def test_error_paths():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not audio at all")
    with pytest.raises(ValueError, match="fmt/data"):
        wav_decode(riff([(b"fmt ", fmt_chunk(1, 1, 8000, 16))]))
    with pytest.raises(ValueError, match="format tag"):
        wav_decode(riff([(b"fmt ", fmt_chunk(85, 1, 8000, 16)),  # MP3-in-WAV
                         (b"data", b"\x00\x00")]))
    with pytest.raises(ValueError, match="float WAV"):
        wav_decode(riff([(b"fmt ", fmt_chunk(3, 1, 8000, 64)),
                         (b"data", b"\x00" * 16)]))


# --- metadata / describe / sniff / reader integration --------------------


def test_metadata_and_describe():
    p = wav_encode(np.zeros(750, dtype=np.int16), 16000)
    m = wav_metadata(p)
    assert m == {"sample_rate": 16000, "channels": 1, "bits": 16,
                 "is_float": False, "n_frames": 750, "duration_ms": 46}
    assert wav_describe(p) == "wav audio 16000hz 1ch 16bit 750 frames (46ms)"


def test_sniff_and_reader_registry():
    p = wav_encode(np.zeros(10, dtype=np.int16), 8000)
    assert sniff_format(p) == "wav"
    assert READERS["wav"](p).startswith("wav audio 8000hz")
    # RIFF-but-not-WAVE (e.g. AVI) must not sniff as wav
    avi = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    assert sniff_format(avi) != "wav"


def test_decode_audio_routing():
    p = wav_encode(np.zeros(10, dtype=np.int16), 8000)
    assert decode_audio(p, "audio/wav").n_frames == 10
    assert decode_audio(p, "application/octet-stream").n_frames == 10  # magic
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xffmp3data", "audio/mpeg")


def test_media_feature_vec_routes_by_modality():
    p = wav_encode(np.full(100, 1000, dtype=np.int16), 16000)
    v = media_feature_vec(p, "audio/wav")
    assert v[1] == 16000.0 and v[3] == 100.0
    other = media_feature_vec(b"some bytes", "video/mp4")  # fake_decode tier
    assert len(other) == 8


# --- waveform features ---------------------------------------------------


def test_feature_vec_square_wave():
    # alternating ±1000 square wave: rms = peak = 1000, zcr = 1, dc = 0
    s = np.where(np.arange(200) % 2 == 0, 1000, -1000).astype(np.int16)
    dur, rate, ch, n, rms, peak, zcr, dc = audio_feature_vec(wav_encode(s, 8000))
    assert (dur, rate, ch, n) == (25.0, 8000.0, 1.0, 200.0)
    assert rms == 1000.0 and peak == 1000.0 and zcr == 1.0 and dc == 0.0


def test_energy_segments_islands():
    sig = np.concatenate([
        np.zeros(64), np.full(128, 100), np.zeros(64), np.full(64, 50),
    ]).astype(np.int64)
    segs = energy_segments(sig, 16000, win=64, threshold=0)
    assert segs == [
        (0, 1, 2, 2, 128 * 100 * 100, 4, 12),
        (1, 4, 4, 1, 64 * 50 * 50, 16, 20),
    ]
    # threshold above the quiet island's window energy drops it
    segs2 = energy_segments(sig, 16000, win=64, threshold=64 * 50 * 50)
    assert [s[0:3] for s in segs2] == [(0, 1, 2)]
    # all-silent → no segments; sub-window tail ignored
    assert energy_segments(np.zeros(100, dtype=np.int64), 8000, win=64) == []


# --- Spark operators -----------------------------------------------------


def _media_df(spark):
    rows = [
        (1, bytearray(wav_encode(np.full(100, 7, dtype=np.int16), 8000))),
        (2, bytearray(wav_encode(
            np.stack([np.arange(50), -np.arange(50)], axis=1).astype(np.int16),
            16000))),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_audio_features_operator(spark):
    out = {r["media_id"]: r for r in audio_features(_media_df(spark)).collect()}
    r1 = out[1]
    assert (r1["sample_rate"], r1["channels"], r1["n_frames"]) == (8000, 1, 100)
    assert r1["s_sum"] == 700 and r1["s_min"] == 7 and r1["s_max"] == 7
    r2 = out[2]
    assert r2["channels"] == 2 and r2["n_frames"] == 50
    assert r2["s_sum"] == 0 and r2["abs_sum"] == 2 * sum(range(50))


def test_audio_energy_segments_operator(spark):
    sig = np.concatenate([np.zeros(64), np.full(64, 10), np.zeros(64)]).astype(
        np.int16
    )
    media = spark.createDataFrame(
        [(9, bytearray(wav_encode(sig, 16000)))], "media_id long, payload binary"
    )
    segs = audio_energy_segments(media, win=64, threshold=0).collect()
    assert len(segs) == 1
    s = segs[0]
    assert (s["media_id"], s["w_start"], s["w_end"], s["energy"]) == (9, 1, 1, 6400)
    assert (s["t_start_ms"], s["t_end_ms"]) == (4, 8)


def test_resample_nearest_floor_convention():
    from memvid_spark.sources.audio import resample_nearest

    s = np.arange(10)
    assert resample_nearest(s, 10, 5).tolist() == [0, 2, 4, 6, 8]
    assert resample_nearest(np.array([1, 2]), 1, 3).tolist() == [1, 1, 1, 2, 2, 2]
    # 44100 -> 16000 length contract
    out = resample_nearest(np.arange(441), 44100, 16000)
    assert out.shape[0] == 441 * 16000 // 44100


def test_to_mono_floor_mean():
    from memvid_spark.sources.audio import to_mono

    assert to_mono(np.array([[0, 10], [5, 6], [-3, -4]])).tolist() == [5, 5, -4]
    assert to_mono(np.array([7, 8])).tolist() == [7, 8]  # already mono


def test_error_channel_does_not_kill_job(spark):
    """Warehouse posture: a corrupt payload yields an err row, the rest
    of the batch still decodes (on_error='channel'); default still
    raises (oracle fixtures must never silently degrade)."""
    good = bytearray(wav_encode(np.full(10, 3, dtype=np.int16), 8000))
    media = spark.createDataFrame(
        [(1, good), (2, bytearray(b"corrupt bytes"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in
            audio_features(media, on_error="channel").collect()}
    assert rows[1]["err"] is None and rows[1]["s_sum"] == 30
    assert rows[2]["err"] is not None and rows[2]["s_sum"] is None
    with pytest.raises(Exception):
        audio_features(media).collect()  # default: loud
