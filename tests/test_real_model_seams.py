"""Real-model seam tests for the three remaining declared-non-goal
models — CLIP image/text towers (src/clip.rs:99-102,297-380), Whisper
transcription (src/whisper.rs:49-116), DistilBERT-class NER
(src/analysis/ner.rs:1-55) — mirroring test_real_model_seam.py's
skipif convention: each test exercises the REAL model through the
engine's injection seam when the library is installed and skips
cleanly otherwise, so none of the seams can bit-rot.

The deterministic-fake plumbing twins (which always run, pinning the
Spark side: Arrow batching, factory-per-task, schema, normalization)
live alongside each skipif test.
"""

from __future__ import annotations

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# CLIP: image tower + text tower into one shared space, retrieval via knn
# ---------------------------------------------------------------------------


def _png_media(spark, arrays):
    from memvid_spark.sources.image import png_encode

    return spark.createDataFrame(
        [(i, bytes(png_encode(a))) for i, a in enumerate(arrays)],
        "media_id long, payload binary",
    )


def test_clip_seam_plumbing_with_fake_tower(spark):
    """The embed_images_model seam with a deterministic stand-in tower:
    pins factory-per-task execution, decode wiring, L2 normalization,
    and that retrieval over the output is the stock cosine knn plan."""
    from memvid_spark.operators.crossmodal import embed_images_model
    from memvid_spark.operators.knn import knn

    red = np.zeros((6, 6, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    blue = np.zeros((6, 6, 3), dtype=np.uint8)
    blue[:, :, 2] = 255
    media = _png_media(spark, [red, blue])

    def fake_factory():
        def tower(pixel_arrays):
            # per-channel means — enough to separate red from blue
            return np.stack(
                [p.reshape(-1, p.shape[2]).mean(axis=0) for p in pixel_arrays]
            )

        return tower

    emb = embed_images_model(media, fake_factory).localCheckpoint()
    rows = {r.media_id: r.embedding for r in emb.collect()}
    assert set(rows) == {0, 1}
    for v in rows.values():
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9  # L2-normalized
    # text side: a 'red' query vector in the same fake space
    q = [1.0, 0.0, 0.0]
    top = knn(emb, q, k=1, id_col="media_id", metric="cosine").collect()
    assert top[0].media_id == 0


def test_clip_seam_real_model(spark):
    """REAL CLIP (sentence-transformers checkpoint) through the same
    seam: image tower encodes engine-decoded pixels, text tower encodes
    the query, stock knn retrieves — red query ranks the red image
    first. Skips where the library is absent."""
    pytest.importorskip("sentence_transformers")
    pytest.importorskip("PIL")
    from memvid_spark.operators.crossmodal import (
        clip_tower_factories,
        embed_images_model,
    )
    from memvid_spark.operators.knn import knn

    red = np.zeros((32, 32, 3), dtype=np.uint8)
    red[:, :, 0] = 220
    blue = np.zeros((32, 32, 3), dtype=np.uint8)
    blue[:, :, 2] = 220
    media = _png_media(spark, [red, blue])
    image_factory, text_encoder = clip_tower_factories()
    emb = embed_images_model(media, image_factory).localCheckpoint()
    # shared-space contract: both towers agree on dimension
    dims = {len(r.embedding) for r in emb.collect()}
    assert len(dims) == 1
    q = [float(x) for x in text_encoder(["a plain red image"])[0]]
    assert len(q) == dims.pop()
    top = knn(emb, q, k=2, id_col="media_id", metric="cosine").collect()
    assert top[0].media_id == 0  # red image beats blue for the red query


# ---------------------------------------------------------------------------
# Whisper: audio payload -> timed text segments through transcribe_audio
# ---------------------------------------------------------------------------


def _wav_payload(seconds: float = 1.0, rate: int = 8000) -> bytes:
    from memvid_spark.sources.audio import wav_encode

    t = np.arange(int(seconds * rate))
    tone = (np.sin(2 * np.pi * 440.0 * t / rate) * 12000).astype(np.int32)
    return bytes(wav_encode(tone[:, None], rate))


def test_whisper_seam_plumbing_with_fake_transcriber(spark):
    """transcribe_audio's factory seam with a deterministic stand-in:
    pins audio-row filtering, one-factory-per-task, segment explosion
    and the output schema."""
    from memvid_spark.sources.multimodal import transcribe_audio

    media = spark.createDataFrame(
        [
            (0, "audio/wav", _wav_payload()),
            (1, "image/png", b"notaudio"),
        ],
        "media_id long, mime string, payload binary",
    )

    def factory():
        def transcriber(payload: bytes):
            from memvid_spark.sources.audio import wav_decode

            a = wav_decode(payload)
            dur = a.duration_ms / 1000.0
            return [(0.0, dur / 2, "first half"), (dur / 2, dur, "second half")]

        return transcriber

    out = transcribe_audio(media, transcriber_factory=factory).collect()
    assert [r.media_id for r in out] == [0, 0]  # image row filtered out
    assert [r.text for r in out] == ["first half", "second half"]
    assert out[0].t_end == pytest.approx(0.5, abs=0.01)


def test_whisper_seam_real_model(spark):
    """REAL Whisper through the same seam: engine WAV decode + 16 kHz
    mono resample feed model.transcribe per payload inside the Arrow
    batch. Asserts the mechanical contract (runs end-to-end, schema,
    bounded timestamps) — not words, the fixture is a pure tone. Skips
    where openai-whisper is absent."""
    whisper = pytest.importorskip("whisper")
    from memvid_spark.sources.multimodal import transcribe_audio

    media = spark.createDataFrame(
        [(0, "audio/wav", _wav_payload(seconds=2.0))],
        "media_id long, mime string, payload binary",
    )

    def factory():
        model = whisper.load_model("tiny")

        def transcriber(payload: bytes):
            from memvid_spark.sources.audio import (
                resample_nearest,
                to_mono,
                wav_decode,
            )

            a = wav_decode(payload)
            mono = to_mono(np.asarray(a.centered()))
            s16k = resample_nearest(mono, a.sample_rate, 16000)
            audio = (s16k / 32768.0).astype(np.float32)
            res = model.transcribe(audio, language="en")
            return [
                (float(s["start"]), float(s["end"]), s["text"].strip())
                for s in res["segments"]
            ] or [(0.0, len(audio) / 16000.0, "")]

        return transcriber

    out = transcribe_audio(media, transcriber_factory=factory).collect()
    assert out and all(r.media_id == 0 for r in out)
    assert all(0.0 <= r.t_start <= r.t_end <= 3.0 for r in out)


# ---------------------------------------------------------------------------
# NER: model-tier tagging through ner_entities_model
# ---------------------------------------------------------------------------


def test_ner_seam_plumbing_with_fake_tagger(spark):
    """ner_entities_model with a deterministic stand-in tagger: pins
    batch shape (one tag() call per Arrow batch), the rule-tier output
    schema, min-confidence filtering and distinct."""
    from memvid_spark.functions.enrich import ner_entities_model

    docs = spark.createDataFrame(
        [
            (1, "Alice works at AcmeCorp"),
            (2, "Alice works at AcmeCorp"),  # duplicate entities -> distinct
        ],
        "doc_id long, sentence string",
    )

    def factory():
        def tag(texts):
            out = []
            for t in texts:
                ents = []
                for w in t.split():
                    if w[:1].isupper():
                        kind = "ORG" if w.endswith("Corp") else "PER"
                        conf = 0.9 if kind == "ORG" else 0.45  # PER below gate
                        ents.append((w, kind, conf))
                out.append(ents)
            return out

        return tag

    got = sorted(
        tuple(r)
        for r in ner_entities_model(docs, factory, min_confidence=0.5).collect()
    )
    # Alice filtered (0.45 < 0.5); AcmeCorp kept once per doc
    assert got == [(1, "AcmeCorp", "ORG", 0.9), (2, "AcmeCorp", "ORG", 0.9)]


def test_ner_seam_real_model(spark):
    """REAL HF token-classification model through the same seam —
    hf_ner_tagger_factory feeds ner_entities_model; a person and a
    location in a plain sentence come back with the right kinds. Skips
    where transformers is absent."""
    pytest.importorskip("transformers")
    from memvid_spark.functions.enrich import (
        hf_ner_tagger_factory,
        ner_entities_model,
    )

    docs = spark.createDataFrame(
        [(1, "Barack Obama visited Paris last spring.")],
        "doc_id long, sentence string",
    )
    got = ner_entities_model(
        docs, hf_ner_tagger_factory(), min_confidence=0.5
    ).collect()
    kinds = {r.kind for r in got}
    ents = " ".join(r.entity for r in got)
    assert "PER" in kinds and "Obama" in ents
    assert "LOC" in kinds and "Paris" in ents
    assert all(r.confidence >= 0.5 for r in got)
