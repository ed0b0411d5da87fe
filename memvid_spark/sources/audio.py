"""Pure-stdlib WAV (RIFF/PCM) codec: real sample decode + audio features.

Reference parity: the reference ingests audio for Whisper transcription
(src/whisper.rs:49-116 — PCM samples in, timed segments out) and records
audio metadata on media frames (src/types/metadata.rs — duration,
sample_rate, channels). This module makes audio a first-class multimodal
column the same way sources/image.py made pixels first-class: a RIFF
chunk walker decodes real PCM samples with no external library, and
feature extraction / energy segmentation consume the decoded waveform.

Decode supports the formats real-world WAV files ship: PCM 8/16/24/32-bit
integer, IEEE float32, and WAVE_FORMAT_EXTENSIBLE wrappers of both, with
unknown chunks (LIST/fact/cue/bext) skipped per the RIFF spec including
the odd-size pad byte. The encode side deliberately uses the Python
stdlib ``wave`` writer — an implementation this repo does NOT own — so
decoder tests are not self-referential: every byte our parser reads in
the round-trip tests was produced by an independent encoder.

Scale: payloads stay opaque BINARY columns; decode runs per Arrow batch
in mapInPandas; outputs are columnar features — waveforms never shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_IEEE_FLOAT = 3
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# first 2 bytes of the 16-byte SubFormat GUID carry the wrapped format tag
_KSDATAFORMAT_PCM = 1
_KSDATAFORMAT_IEEE_FLOAT = 3


@dataclass
class WavAudio:
    """Decoded waveform. ``samples`` is shape (n_frames, channels):
    int32 holding the stored values for integer PCM (8-bit WAV stores
    UNSIGNED 0..255 per the spec — ``centered`` re-centers it), float64
    in [-1, 1] for IEEE-float payloads."""

    sample_rate: int
    channels: int
    sampwidth: int  # bytes per sample (4 for float32)
    is_float: bool
    samples: "object"  # np.ndarray (n_frames, channels)

    @property
    def n_frames(self) -> int:
        return int(self.samples.shape[0])

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate

    def centered(self):
        """Samples centered on 0 (8-bit unsigned → signed)."""
        if not self.is_float and self.sampwidth == 1:
            return self.samples - 128
        return self.samples


def _iter_chunks(payload: bytes) -> Iterator[tuple[bytes, bytes]]:
    """RIFF chunk walk: yields (chunk_id, chunk_data); honors the pad
    byte after odd-sized chunks; tolerates a truncated final chunk (some
    writers under-pad) by yielding what is present."""
    pos = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        data = payload[pos + 8 : pos + 8 + size]
        yield cid, data
        pos += 8 + size + (size & 1)


def wav_decode(payload: bytes) -> WavAudio:
    """Decode a RIFF/WAVE payload to real samples (see module doc for
    the supported format matrix)."""
    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    for cid, chunk in _iter_chunks(payload):
        if cid == b"fmt " and fmt is None:
            fmt = chunk
        elif cid == b"data" and data is None:
            data = chunk
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag == WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 26:
            raise ValueError("extensible WAV without SubFormat")
        (tag,) = struct.unpack_from("<H", fmt, 24)  # GUID data1 low word
    if channels < 1 or rate < 1 or bits < 8:
        raise ValueError(f"bad WAV fmt: channels={channels} rate={rate} bits={bits}")
    sampwidth = bits // 8
    n_frames = len(data) // (sampwidth * channels)
    data = data[: n_frames * sampwidth * channels]
    if tag == _KSDATAFORMAT_IEEE_FLOAT:
        if bits != 32:
            raise ValueError(f"float WAV must be 32-bit, got {bits}")
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
        return WavAudio(rate, channels, 4, True, arr.reshape(n_frames, channels))
    if tag != _KSDATAFORMAT_PCM:
        raise ValueError(f"unsupported WAV format tag {tag}")
    if sampwidth == 1:
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
    elif sampwidth == 2:
        arr = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif sampwidth == 3:
        raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        arr = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        arr = np.where(arr >= 1 << 23, arr - (1 << 24), arr)
    elif sampwidth == 4:
        arr = np.frombuffer(data, dtype="<i4").astype(np.int32)
    else:
        raise ValueError(f"unsupported PCM width {bits} bits")
    return WavAudio(rate, channels, sampwidth, False, arr.reshape(n_frames, channels))


def wav_encode(samples, sample_rate: int) -> bytes:
    """16-bit PCM writer via the STDLIB ``wave`` module (independent
    implementation — keeps decode tests non-circular). ``samples`` is an
    int array, shape (n_frames,) or (n_frames, channels)."""
    import io
    import wave

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def wav_metadata(payload: bytes) -> dict:
    """Header-only parse (no sample materialization beyond the data
    chunk length) — what a text-first store records about an audio blob
    (src/types/metadata.rs audio fields)."""
    a = wav_decode(payload)  # local[32] payloads are small; metadata from decode
    return {
        "sample_rate": a.sample_rate,
        "channels": a.channels,
        "bits": a.sampwidth * 8,
        "is_float": a.is_float,
        "n_frames": a.n_frames,
        "duration_ms": a.duration_ms,
    }


def wav_describe(payload: bytes) -> str:
    """One-line text surrogate for the put_bytes text path (twin of
    image.png_describe)."""
    m = wav_metadata(payload)
    kind = "float" if m["is_float"] else f"{m['bits']}bit"
    return (
        f"wav audio {m['sample_rate']}hz {m['channels']}ch {kind} "
        f"{m['n_frames']} frames ({m['duration_ms']}ms)"
    )


def decode_audio_any(payload: bytes, mime: str | None = None) -> WavAudio:
    """Route an audio payload to the right pure-stdlib decoder by magic
    (mime as fallback hint): RIFF/WAVE → :func:`wav_decode`, fLaC →
    sources/flac.py's full decoder, normalized into the same
    :class:`WavAudio` shape so every downstream consumer (features,
    segmentation, resample, transcription seam) is container-agnostic."""
    if payload[:4] == b"fLaC" or mime == "audio/flac":
        import numpy as np

        from .flac import flac_decode

        a = flac_decode(payload)
        samples = (
            np.asarray(a.channels, dtype=np.int64).T
            if a.channels
            else np.zeros((0, 1), dtype=np.int64)
        )
        sampwidth = (a.bits_per_sample + 7) // 8
        if sampwidth == 1:
            # FLAC stores 8-bit samples SIGNED (-128..127); WavAudio's
            # 1-byte convention is WAV's UNSIGNED 0..255 (centered()
            # subtracts 128). Re-bias so downstream consumers see the
            # same signal either container delivered.
            samples = samples + 128
        return WavAudio(
            sample_rate=a.sample_rate,
            channels=a.n_channels,
            sampwidth=sampwidth,
            is_float=False,
            samples=samples.astype(np.int32),
        )
    return wav_decode(payload)


def audio_feature_vec(payload: bytes, mime: str = "audio/wav") -> list[float]:
    """Decoded-waveform feature vector (8 floats) for the
    extract_features pipeline — twin of multimodal.image_feature_vec.
    Layout: [duration_ms, sample_rate, channels, n_frames, rms, peak,
    zero_cross_rate, dc_offset]; waveform stats over channel 0 of the
    centered signal."""
    import numpy as np

    a = decode_audio_any(payload, mime)
    ch0 = np.asarray(a.centered(), dtype=np.float64)[:, 0]
    if ch0.size == 0:
        rms = peak = zcr = dc = 0.0
    else:
        rms = float(np.sqrt(np.mean(ch0 * ch0)))
        peak = float(np.abs(ch0).max())
        zcr = float(np.count_nonzero(np.signbit(ch0[1:]) != np.signbit(ch0[:-1]))) / max(
            ch0.size - 1, 1
        )
        dc = float(ch0.mean())
    return [
        float(a.duration_ms),
        float(a.sample_rate),
        float(a.channels),
        float(a.n_frames),
        rms,
        peak,
        zcr,
        dc,
    ]


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, channels int, n_frames long, "
    "duration_ms long, s_sum long, s_min int, s_max int, abs_sum long"
)


def audio_features(media: DataFrame, on_error: str = "raise") -> DataFrame:
    """Integer-exact waveform statistics over REAL decoded samples, one
    row per audio payload. Integer stats (sum/min/max/abs-sum over all
    channels) are chosen over float moments so a closed-form SQL oracle
    can pin them exactly — any RIFF-walk / width / interleave bug shifts
    them. Runs per Arrow batch in mapInPandas; payloads never shuffle.

    ``on_error='channel'`` adds an ``err`` column and emits a null-stats
    row per undecodable payload instead of failing the job — required
    posture at 100 TB where corrupt media is routine."""
    channel = on_error == "channel"
    schema = AUDIO_FEATURE_SCHEMA + (", err string" if channel else "")

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        cols = [
            "media_id", "sample_rate", "channels", "n_frames",
            "duration_ms", "s_sum", "s_min", "s_max", "abs_sum",
        ] + (["err"] if channel else [])
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    a = decode_audio_any(bytes(payload))
                    s = np.asarray(a.centered(), dtype=np.int64)
                    row = (
                        int(mid), a.sample_rate, a.channels, a.n_frames,
                        a.duration_ms, int(s.sum()), int(s.min()),
                        int(s.max()), int(np.abs(s).sum()),
                    )
                    rows.append(row + ((None,) if channel else ()))
                except Exception as e:
                    if not channel:
                        raise
                    rows.append(
                        (int(mid),) + (None,) * 8
                        + (f"{type(e).__name__}: {e}",)
                    )
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema)


AUDIO_SEGMENT_SCHEMA = (
    "media_id long, seg_index int, w_start int, w_end int, "
    "n_windows int, energy long, t_start_ms long, t_end_ms long"
)


def energy_segments(
    samples, sample_rate: int, win: int = 64, threshold: int = 0
) -> list[tuple[int, int, int, int, int, int, int]]:
    """Energy-based activity segmentation (the VAD front half of the
    reference's audio→segments path, src/whisper.rs:49-116 — the model
    is a seam, the windowing is not): channel-0 energy sum(v²) per
    ``win``-sample window; consecutive windows above ``threshold`` merge
    into one segment. Returns (seg_index, w_start, w_end, n_windows,
    energy, t_start_ms, t_end_ms); integer-exact for the SQL oracle."""
    import numpy as np

    ch0 = np.asarray(samples, dtype=np.int64)
    if ch0.ndim == 2:
        ch0 = ch0[:, 0]
    n_win = ch0.size // win
    e = (ch0[: n_win * win].reshape(n_win, win) ** 2).sum(axis=1)
    segs = []
    start = None
    for w in range(n_win + 1):
        hot = w < n_win and e[w] > threshold
        if hot and start is None:
            start = w
        elif not hot and start is not None:
            energy = int(e[start:w].sum())
            segs.append(
                (
                    len(segs), start, w - 1, w - start, energy,
                    start * win * 1000 // sample_rate,
                    w * win * 1000 // sample_rate,
                )
            )
            start = None
    return segs


def audio_energy_segments(
    media: DataFrame, win: int = 64, threshold: int = 0
) -> DataFrame:
    """Segment every audio payload by windowed energy (energy_segments
    per row, decoded for real); output one row per segment."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = [
            "media_id", "seg_index", "w_start", "w_end", "n_windows",
            "energy", "t_start_ms", "t_end_ms",
        ]
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                a = decode_audio_any(bytes(payload))
                for seg in energy_segments(
                    a.centered(), a.sample_rate, win=win, threshold=threshold
                ):
                    rows.append((int(mid), *seg))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, AUDIO_SEGMENT_SCHEMA)


def resample_nearest(samples, src_rate: int, dst_rate: int):
    """Nearest-sample (zero-order-hold) resample with the floor
    convention out[i] = in[(i * src_rate) // dst_rate] and
    n_out = n_in * dst_rate // src_rate — integer-exact (oracle-able,
    q130). The transform tier before a fixed-rate model input
    (src/whisper.rs consumes 16 kHz mono)."""
    import numpy as np

    s = np.asarray(samples)
    n_out = s.shape[0] * dst_rate // src_rate
    idx = (np.arange(n_out) * src_rate) // dst_rate
    return s[idx]


def to_mono(samples):
    """Channel-mean downmix with floor division (integer-exact)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        return s
    return s.sum(axis=1) // s.shape[1]
