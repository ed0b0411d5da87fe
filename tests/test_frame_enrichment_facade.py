"""Facade frame accessors + enrichment queue
(src/memvid/frame.rs:164-360, src/memvid/enrichment.rs:216-467)."""

from __future__ import annotations

import hashlib

import pytest

from memvid_spark.api import MemvidSpark


def test_frame_accessors(spark):
    mv = MemvidSpark(spark)
    a = mv.put("alpha document about hash joins", uri="mv2://x/a")
    b = mv.put("beta document about windows", uri="mv2://x/b")

    fa = mv.frame_by_id(a)
    assert fa["doc_id"] == a and fa["status"] == "active"
    with pytest.raises(KeyError):
        mv.frame_by_id(999)

    assert mv.frame_text_by_id(b) == "beta document about windows"
    long_id = mv.put("x" * 500)
    assert mv.frame_preview_by_id(long_id) == "x" * 120

    assert mv.frame_by_uri("mv2://x/a")["doc_id"] == a
    with pytest.raises(KeyError):
        mv.frame_by_uri("mv2://missing")


def test_frame_by_uri_prefers_active(spark):
    mv = MemvidSpark(spark)
    a = mv.put("first version", uri="mv2://doc")
    b = mv.put("second version", uri="mv2://doc", dedup=False)
    mv.delete(b)
    # b is latest but deleted → the active a wins (frame.rs:174-189)
    assert mv.frame_by_uri("mv2://doc")["doc_id"] == a
    mv.delete(a)
    # no active frame left → latest of any status (the fallback scan)
    assert mv.frame_by_uri("mv2://doc")["doc_id"] == b


def test_find_frame_by_hash(spark):
    mv = MemvidSpark(spark)
    text = "content addressed frame lookup"
    a = mv.put(text)
    sha = hashlib.sha256(text.encode()).hexdigest()
    hit = mv.find_frame_by_hash(sha)
    assert hit is not None and hit["doc_id"] == a
    assert mv.find_frame_by_hash("00" * 32) is None
    mv.delete(a)
    assert mv.find_frame_by_hash(sha) is None  # active frames only


def test_enrichment_queue_lifecycle(spark):
    mv = MemvidSpark(spark)
    assert not mv.has_pending_enrichment()
    assert mv.next_enrichment_task() is None
    a = mv.put("first document to enrich")
    b = mv.put("second document to enrich")
    assert mv.enrichment_queue_len() == 2
    assert mv.get_unenriched_frames() == [a, b]
    assert not mv.is_frame_enriched(a)

    task = mv.next_enrichment_task()
    assert task["frame_id"] == a and not task["is_media"]
    text, is_skim, needs_embedding = mv.read_frame_for_enrichment(a)
    assert text.startswith("first") and not is_skim and needs_embedding

    res = mv.process_enrichment_task(task)
    assert res["error"] is None and not res["re_extracted"]
    mv.complete_enrichment_task(a)
    assert mv.enrichment_queue_len() == 1
    assert mv.is_frame_enriched(a)

    st = mv.enrichment_stats()
    assert st["total_frames"] == 2
    assert st["enriched_frames"] == 1
    assert st["pending_frames"] == 1
    assert st["searchable_only"] == 1

    assert mv.process_all_enrichment() == 1
    assert not mv.has_pending_enrichment()
    assert mv.enrichment_stats()["searchable_only"] == 0
    assert mv.read_frame_for_enrichment(b)[2] is False  # no embedding needed


def test_media_frames_reextract_on_enrichment(spark):
    """A media-backed frame is the skim case: its indexed text is the
    reader surrogate; extract_full_text re-runs the reader over the
    retained payload (enrichment.rs:270-295)."""
    import struct
    import zlib

    # minimal valid 1x1 grayscale PNG via the stdlib
    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x80")
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    mv = MemvidSpark(spark)
    i = mv.put_bytes(png, uri="mv2://img.png")
    task = mv.next_enrichment_task()
    assert task["frame_id"] == i and task["is_media"]
    text, is_skim, _ = mv.read_frame_for_enrichment(i)
    assert is_skim
    full = mv.extract_full_text(i)
    assert full == text  # unbudgeted re-extraction reproduces the reader text
    res = mv.process_enrichment_task(task)
    assert res["re_extracted"] and res["error"] is None


def test_media_enrichment_survives_save_open(spark, tmp_path):
    """After save()/open() the media payload lives in the parquet-backed
    seed (media_id, mime, payload) — _frame_has_media and
    extract_full_text must probe it by media_id, not by the frame id
    column (the seed has no doc_id column at all)."""
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\x80")
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    mv = MemvidSpark(spark)
    t = mv.put("plain text frame")
    i = mv.put_bytes(png, uri="mv2://img.png")
    want = mv.extract_full_text(i)
    path = str(tmp_path / "store")
    mv.save(path)

    back = MemvidSpark.open(spark, path)
    assert back._frame_has_media(i)
    assert not back._frame_has_media(t)
    assert back.extract_full_text(i) == want
    # the full enrichment step runs against the seed-backed payload
    res = back.process_enrichment_task({"frame_id": i, "is_media": True})
    assert res["re_extracted"] and res["error"] is None
