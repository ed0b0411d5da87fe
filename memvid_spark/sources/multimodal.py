"""Multimodal columns: binary payloads with typed metadata, decode /
feature-extraction plumbing over mapInPandas.

Reference: media frames carry DocMetadata (mime, bytes, width/height,
exif, audio, MediaManifest — src/types/metadata.rs, exercised
src/lib.rs:1251-1313); blob retrieval by URI (blob_reader_by_uri).

PNG pixels and WAV samples are REAL: ``decode_image`` routes image/png
through the pure-stdlib codec (sources/image.py — zlib inflate +
per-row unfilter) and ``decode_audio`` routes audio/wav through the
RIFF/PCM parser (sources/audio.py — 8/16/24/32-bit + float32 +
extensible), so image and audio feature extraction consume actual
decoded media with no external library. Other formats (JPEG pixels,
video) still need a codec library the container doesn't ship — for
those the decoders raise unless one is injected, and ``fake_decode``
provides a deterministic stand-in so the Arrow plumbing stays tested.
A deployment swaps in PIL/ffmpeg without touching the pipeline.

Scale: payloads are opaque BINARY columns (or object-store path columns
for >row-group-sized media); extraction runs in mapInPandas so each
Arrow batch is decoded in one Python call; the output is columnar
features, never re-serialized media.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, mime string, payload binary, width int, height int, "
    "n_frames int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, mime string, n_bytes long, checksum string, "
    "feat array<float>, err string"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic demo media table: payload bytes derived from the
    text, typed metadata derived from doc_id."""
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mime.alias("mime"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("payload"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 24 + 1).cast("int").alias("n_frames"),
        (F.col("doc_id") % 60000).cast("int").alias("duration_ms"),
    )


def decode_image(payload: bytes, mime: str):
    """Decode an image payload to (height, width, channels) uint8 pixels.

    PNG, BMP, GIF and baseline JPEG are decoded for real by the
    pure-stdlib codecs (sources/image.py: zlib inflate + per-row
    unfilter / BI_RGB row layouts / full GIF-LZW; sources/jpeg.py:
    huffman + dequant + IDCT + YCbCr, incl. 4:2:0/4:2:2 chroma
    subsampling — src/clip.rs:99-102 consumes real pixels and so do
    these paths). Progressive JPEG raises with an inject-PIL message;
    unknown formats raise NotImplementedError."""
    if mime == "image/png" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .image import png_decode

        return png_decode(payload).pixels
    if mime == "image/bmp" or (
        payload[:2] == b"BM" and mime in ("", None, "application/octet-stream")
    ):
        from .image import bmp_decode

        return bmp_decode(payload)
    if mime == "image/gif" or payload[:6] in (b"GIF87a", b"GIF89a"):
        from .image import gif_decode

        return gif_decode(payload)
    if mime == "image/jpeg" or payload[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode

        return jpeg_decode(payload)
    if mime == "image/tiff" or payload[:4] in (b"II*\x00", b"MM\x00*"):
        from .tiff import tiff_decode

        return tiff_decode(payload)
    raise NotImplementedError(
        f"no stdlib decoder for {mime!r}; inject a decoder (PIL/ffmpeg) "
        "or use fake_decode"
    )


def decode_audio(payload: bytes, mime: str):
    """Decode an audio payload to a WavAudio (real samples). WAV/RIFF
    and FLAC are decoded for real by the pure-stdlib parsers
    (sources/audio.py, sources/flac.py); other containers (mp3/ogg)
    need a library the container doesn't ship."""
    if (
        mime in ("audio/wav", "audio/flac")
        or (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE")
        or payload[:4] == b"fLaC"
    ):
        from .audio import decode_audio_any

        return decode_audio_any(payload, mime)
    raise NotImplementedError(
        f"no stdlib decoder for {mime!r}; inject a decoder (ffmpeg/soundfile) "
        "or use fake_decode"
    )


def image_feature_vec(payload: bytes, mime: str) -> list[float]:
    """Decoded-pixel feature vector (8 floats) for the extract_features
    pipeline: dimensions + per-channel statistics over REAL pixels.
    Layout: [width, height, channels, mean, std, min, max, luma_mean]."""
    import numpy as np

    px = np.asarray(decode_image(payload, mime), dtype="float64")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    luma = px[:, :, :3].mean(axis=2) if ch >= 3 else px[:, :, 0]
    return [
        float(w),
        float(h),
        float(ch),
        float(px.mean()),
        float(px.std()),
        float(px.min()),
        float(px.max()),
        float(luma.mean()),
    ]


def media_feature_vec(payload: bytes, mime: str) -> list[float]:
    """Route a payload to its real decoder by modality: image/* → pixel
    features, audio/* → waveform features, anything else → byte-stat
    stand-in. The one-callable shape extract_features expects."""
    if mime.startswith("image/"):
        return image_feature_vec(payload, mime)
    if mime.startswith("audio/"):
        from .audio import audio_feature_vec

        return audio_feature_vec(payload, mime)
    return fake_decode(payload, mime)


def fake_decode(payload: bytes, mime: str) -> list[float]:
    """Deterministic stand-in 'decoder': 8 features from byte statistics.
    Keeps the Arrow pipeline honest (shape, dtype, batching) without
    codec libraries."""
    import hashlib

    n = max(len(payload), 1)
    h = hashlib.md5(payload).digest()
    return [
        float(len(payload)),
        float(sum(payload[:64]) % 251),
        float(payload[0] if payload else 0),
        float(payload[-1] if payload else 0),
        float(h[0]),
        float(h[1]),
        float(int.from_bytes(h[2:4], "big") % 997),
        float(len(mime)),
    ]


def extract_features(
    media: DataFrame,
    decode: Callable[[bytes, str], list[float]] = fake_decode,
    batch_note: str = "arrow",
) -> DataFrame:
    """mapInPandas feature extraction: one Python call per Arrow batch,
    output strictly columnar (FEATURE_SCHEMA).

    Per-payload error channel: at warehouse scale a corpus ALWAYS
    contains some corrupt media, and one bad payload must not kill a
    100 TB job. A decode failure yields feat=NULL with the exception
    text in ``err`` (the readers.py unreadable-payload channel, q117,
    applied to media); downstream filters on err IS NULL."""
    import hashlib

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, checks, nbytes, errs = [], [], [], []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                b = bytes(payload) if payload is not None else b""
                try:
                    feats.append(decode(b, mime))
                    errs.append(None)
                except Exception as e:  # channelled, never job-fatal
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
                checks.append(hashlib.sha256(b).hexdigest())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": nbytes,
                    "checksum": checks,
                    "feat": feats,
                    "err": errs,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame index (explode of a sequence — no Python, no shuffle).

    This is the metadata-synthesized tier; when the payload is an actual
    MP4, sources/video.py demuxes the real sample tables instead
    (video_keyframes extracts true keyframe byte ranges + timestamps)."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    sampled = F.filter(frames, lambda i: i % every_nth == F.lit(0))
    return (
        media.filter(F.col("mime").startswith("video/"))
        .select(
            "media_id",
            "n_frames",
            F.explode(sampled).alias("frame_index"),
        )
        .withColumn(
            "frame_ts_ms",
            (F.col("frame_index") * F.lit(1000) / F.lit(24)).cast("int"),
        )
    )


def transcribe_audio(
    media: DataFrame,
    transcriber: Callable[[bytes], list[tuple[float, float, str]]] | None = None,
    transcriber_factory: Callable[
        [], Callable[[bytes], list[tuple[float, float, str]]]
    ] | None = None,
) -> DataFrame:
    """Whisper-shaped transcription plumbing (src/whisper.rs:49-116:
    audio → timed text segments). The model is an injection point — the
    container has no audio stack — but the Spark side is real: audio
    rows only, one model call per payload inside an Arrow batch, output
    exploded to one row per segment.

    Prefer ``transcriber_factory`` for real models: it runs ONCE per
    task on the executor (the model never pickles through the closure —
    the BatchModelEmbedder seam, functions/embed.py). A plain
    ``transcriber`` callable still works for lightweight/injected fns.

    Output: (media_id, seg_index, t_start, t_end, text).
    """
    if transcriber is None and transcriber_factory is None:
        raise NotImplementedError(
            "transcription requires an audio model; inject a transcriber "
            "callable (payload -> [(t_start, t_end, text), ...]) or a "
            "transcriber_factory built executor-side"
        )
    schema = "media_id long, seg_index int, t_start double, t_end double, text string"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        fn = transcriber if transcriber is not None else transcriber_factory()
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                segs = fn(bytes(payload) if payload is not None else b"")
                for i, (t0, t1, txt) in enumerate(segs):
                    rows.append((mid, i, t0, t1, txt))
            yield pd.DataFrame(
                rows, columns=["media_id", "seg_index", "t_start", "t_end", "text"]
            )

    return media.filter(F.col("mime").startswith("audio/")).mapInPandas(run, schema)
