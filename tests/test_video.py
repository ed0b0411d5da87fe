"""MP4 demux tests: mux/demux round trips over spec-shaped fixtures,
plus a HAND-BUILT byte-level fixture the repo's muxer cannot produce —
fast-start layout (moov before mdat), 64-bit co64 chunk offsets, uniform
stsz, version-1 mvhd/mdhd, largesize mdat — so the box walker and sample
resolver are tested against structure no repo writer emitted.
Reference parity: MediaManifest (src/types/metadata.rs), media blobs
(src/lib.rs:1251-1313)."""

import struct

import pytest

from memvid_spark.sources.readers import READERS, sniff_format
from memvid_spark.sources.video import (
    MuxTrack,
    mp4_describe,
    mp4_manifest,
    mp4_mux,
    mp4_samples,
    video_keyframes,
    video_manifests,
)


def two_track() -> tuple[bytes, list, list]:
    vid = [bytes([(7 + i + j) % 256 for j in range(20 + i)]) for i in range(7)]
    aud = [bytes([(3 * i + j) % 256 for j in range(10)]) for i in range(5)]
    payload = mp4_mux(
        [
            MuxTrack("vide", "mp4v", vid, [100, 200] * 3 + [100],
                     samples_per_chunk=3, sync_every=2, width=64, height=48),
            MuxTrack("soun", "mp4a", aud, [160] * 5, samples_per_chunk=2),
        ]
    )
    return payload, vid, aud


def test_mux_demux_roundtrip():
    payload, vid, aud = two_track()
    m = mp4_manifest(payload)
    assert m.brand == "isom" and m.duration_ms == 1000 and len(m.tracks) == 2
    v, a = m.tracks
    assert (v.track_id, v.handler, v.codec, v.width, v.height) == (1, "vide", "mp4v", 64, 48)
    # stts run expansion → per-sample dts
    assert [s.dts for s in v.samples] == [0, 100, 300, 400, 600, 700, 900]
    # stss: syncs at 1-based samples 1,3,5,7
    assert [s.is_sync for s in v.samples] == [True, False] * 3 + [True]
    # no stss on the audio track → every sample sync (per spec)
    assert all(s.is_sync for s in a.samples)
    # the REAL thing: resolved byte ranges extract the exact sample bytes
    assert [b for _, b in mp4_samples(payload, 1)] == vid
    assert [b for _, b in mp4_samples(payload, 2)] == aud
    with pytest.raises(ValueError):
        mp4_samples(payload, 9)


def test_sniff_describe_reader():
    payload, _, _ = two_track()
    assert sniff_format(payload) == "mp4"
    text = READERS["mp4"](payload)
    assert text == mp4_describe(payload)
    assert "vide:mp4v 7 samples" in text and "soun:mp4a 5 samples" in text


def test_error_paths():
    with pytest.raises(ValueError, match="ISO-BMFF"):
        mp4_manifest(b"not a video")
    ftyp_only = struct.pack(">I", 16) + b"ftypisom" + struct.pack(">I", 0x200)
    with pytest.raises(ValueError, match="moov"):
        mp4_manifest(ftyp_only)


# --- hand-built fixture: layouts the repo's muxer never writes -----------


def _box(t, p):
    return struct.pack(">I", 8 + len(p)) + t + p


def _full(t, ver, p):
    return _box(t, struct.pack(">B3x", ver) + p)


def hand_mp4() -> tuple[bytes, list]:
    """moov-FIRST (fast-start) file with version-1 mvhd/mdhd (64-bit
    durations), uniform stsz, co64 offsets, and a largesize mdat."""
    samples = [bytes([(i * 3 + j) % 256 for j in range(6)]) for i in range(4)]
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)

    def moov_with(data_off):
        mvhd = _full(b"mvhd", 1,
                     struct.pack(">QQIQ", 0, 0, 600, 240)   # v1: 64-bit times
                     + struct.pack(">IH2x8x", 0x10000, 0x0100)
                     + matrix + b"\x00" * 24 + struct.pack(">I", 2))
        tkhd = _full(b"tkhd", 1,
                     struct.pack(">QQIxxxxQ8x", 0, 0, 1, 240)
                     + struct.pack(">hhH2x", 0, 0, 0)
                     + matrix + struct.pack(">II", 16 << 16, 16 << 16))
        mdhd = _full(b"mdhd", 1, struct.pack(">QQIQHH", 0, 0, 600, 240, 0x55C4, 0))
        hdlr = _full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"x\x00")
        stsd = _full(b"stsd", 0, struct.pack(">I", 1)
                     + _box(b"avc1", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 70))
        stts = _full(b"stts", 0, struct.pack(">III", 1, 4, 60))
        stsz = _full(b"stsz", 0, struct.pack(">II", 6, 4))  # uniform size 6
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, 2, 1))
        co64 = _full(b"co64", 0, struct.pack(">I", 2)
                     + struct.pack(">QQ", data_off, data_off + 12))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
        minf = _box(b"minf", _full(b"vmhd", 0, b"\x00" * 8) + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))

    body = b"".join(samples)
    moov_len = len(moov_with(0))
    data_off = len(ftyp) + moov_len + 16  # moov first; largesize header = 16
    moov = moov_with(data_off)
    assert len(moov) == moov_len
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(body)) + body
    return ftyp + moov + mdat, samples


def test_hand_built_fast_start_co64():
    payload, samples = hand_mp4()
    m = mp4_manifest(payload)
    assert m.brand == "mp42"
    assert m.timescale == 600 and m.duration == 240 and m.duration_ms == 400
    (tr,) = m.tracks
    assert (tr.track_id, tr.handler, tr.codec) == (1, "vide", "avc1")
    assert tr.width == 16 and tr.height == 16
    assert [s.size for s in tr.samples] == [6, 6, 6, 6]  # uniform stsz
    assert [s.dts for s in tr.samples] == [0, 60, 120, 180]
    assert [b for _, b in mp4_samples(payload, 1)] == samples


# --- Spark operators -----------------------------------------------------


def test_video_operators(spark):
    payload, vid, _ = two_track()
    media = spark.createDataFrame(
        [(5, bytearray(payload))], "media_id long, payload binary"
    )
    rows = {r["track_id"]: r for r in video_manifests(media).collect()}
    v = rows[1]
    assert (v["handler"], v["n_samples"], v["n_keyframes"]) == ("vide", 7, 4)
    assert v["total_bytes"] == sum(len(s) for s in vid)
    assert v["byte_sum"] == sum(sum(s) for s in vid)
    a = rows[2]
    assert (a["handler"], a["n_samples"], a["n_keyframes"]) == ("soun", 5, 5)

    kf = video_keyframes(media).collect()
    assert [r["sample_index"] for r in kf] == [0, 2, 4, 6]
    assert [r["dts_ms"] for r in kf] == [0, 300, 600, 900]
    import hashlib

    assert kf[0]["checksum"] == hashlib.sha256(vid[0]).hexdigest()


def test_error_channel_does_not_kill_job(spark):
    good, _, _ = two_track()
    media = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"corrupt not a video"))],
        "media_id long, payload binary",
    )
    rows = video_manifests(media, on_error="channel").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 2 and all(r["err"] is None for r in by_id[1])
    assert len(by_id[2]) == 1 and by_id[2][0]["err"] is not None
    with pytest.raises(Exception):
        video_manifests(media).collect()
