"""TIFF codec pins (sources/tiff.py): round-trip identity across byte
orders x compressions x predictor, spec-assembled byte-literal fixtures
(de-circularized — no repo writer produced them), PackBits edge cases,
format-ladder integration, fail-closed fuzz."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from memvid_spark.sources.tiff import (
    TiffError,
    _packbits_decode,
    _packbits_encode,
    tiff_decode,
    tiff_encode,
    tiff_metadata,
)


def _rt(px, **kw):
    enc = tiff_encode(px, **kw)
    dec = tiff_decode(enc)
    exp = px if px.ndim == 3 else px[:, :, None]
    assert dec.shape == exp.shape
    assert (dec == exp).all(), kw
    return enc


@pytest.mark.parametrize("bo", ["II", "MM"])
@pytest.mark.parametrize("comp", ["none", "lzw", "packbits"])
def test_round_trip_matrix(bo, comp):
    rng = np.random.default_rng(5)
    for px in (
        rng.integers(0, 256, (40, 53), dtype=np.uint8),          # gray
        rng.integers(0, 256, (33, 47, 3), dtype=np.uint8),       # rgb
        rng.integers(0, 256, (20, 20, 4), dtype=np.uint8),       # rgba
        (np.add.outer(np.arange(64), np.arange(80)) % 256).astype(np.uint8),
        np.full((30, 30, 3), 200, dtype=np.uint8),
    ):
        _rt(px, byte_order=bo, compression=comp, rows_per_strip=7)
        if comp == "lzw":
            _rt(px, byte_order=bo, compression=comp, predictor=True)


def test_lzw_width_growth_and_table_reset():
    rng = np.random.default_rng(9)
    big = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    _rt(big, compression="lzw", rows_per_strip=200)  # forces 12-bit + reset
    _rt(big, compression="lzw", rows_per_strip=200, predictor=True)


def test_compression_actually_compresses():
    smooth = (np.add.outer(np.arange(64), np.arange(80)) % 256).astype(
        np.uint8
    )
    raw = len(tiff_encode(smooth, compression="none"))
    pred = len(tiff_encode(smooth, compression="lzw", predictor=True))
    assert pred < raw / 5  # gradient rows difference to constants
    flat = np.full((30, 30, 3), 7, dtype=np.uint8)
    pb = len(tiff_encode(flat, compression="packbits"))
    assert pb < 30 * 30 * 3 / 10


def test_packbits_spec_vectors():
    """The Apple PackBits reference vector from the TIFF 6.0 spec."""
    decoded = bytes.fromhex(
        "aaaaaa80002a" + "aa" * 4 + "80002a22" + "aa" * 10
    )
    encoded = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")
    assert _packbits_decode(encoded) == decoded
    # our encoder round-trips (byte choices may differ; identity must hold)
    assert _packbits_decode(_packbits_encode(decoded)) == decoded
    # the no-op 0x80 header must be skipped
    assert _packbits_decode(b"\x80\x00A") == b"A"


def test_hand_assembled_fixture_decodes():
    """6-byte 2x1 RGB uncompressed TIFF assembled field-by-field from
    the TIFF 6.0 spec (little-endian), no repo writer involved."""
    pixels = bytes([10, 20, 30, 40, 50, 60])
    ifd_off = 8 + len(pixels)

    def entry(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + val

    entries = [
        entry(256, 3, 1, struct.pack("<HH", 2, 0)),          # width
        entry(257, 3, 1, struct.pack("<HH", 1, 0)),          # height
        entry(258, 3, 3, struct.pack("<I", ifd_off + 2 + 9 * 12 + 4)),
        entry(259, 3, 1, struct.pack("<HH", 1, 0)),          # no compression
        entry(262, 3, 1, struct.pack("<HH", 2, 0)),          # RGB
        entry(273, 4, 1, struct.pack("<I", 8)),              # strip offset
        entry(277, 3, 1, struct.pack("<HH", 3, 0)),          # 3 samples
        entry(278, 4, 1, struct.pack("<I", 1)),              # rows/strip
        entry(279, 4, 1, struct.pack("<I", len(pixels))),    # strip bytes
    ]
    payload = (
        struct.pack("<2sHI", b"II", 42, ifd_off)
        + pixels
        + struct.pack("<H", len(entries))
        + b"".join(entries)
        + struct.pack("<I", 0)
        + struct.pack("<HHH", 8, 8, 8)  # out-of-line BitsPerSample
    )
    dec = tiff_decode(payload)
    assert dec.shape == (1, 2, 3)
    assert dec.ravel().tolist() == [10, 20, 30, 40, 50, 60]
    assert tiff_metadata(payload)["compression"] == "none"


def test_format_ladder_integration():
    from memvid_spark.sources.image import image_metadata
    from memvid_spark.sources.multimodal import decode_image, image_feature_vec
    from memvid_spark.sources.readers import READERS, sniff_format

    px = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
    for bo in ("II", "MM"):
        enc = tiff_encode(px, byte_order=bo, compression="lzw")
        assert sniff_format(enc) == "tiff"
        assert "tiff image 5x4 3ch lzw" in READERS["tiff"](enc)
        assert (decode_image(enc, "image/tiff") == px).all()
        assert image_metadata(enc)["format"] == "tiff"
        assert image_feature_vec(enc, "image/tiff")[:3] == [5.0, 4.0, 3.0]


def test_decode_fuzz_fail_closed():
    rng = np.random.default_rng(77)
    random.seed(77)
    base = tiff_encode(
        rng.integers(0, 256, (9, 11, 3), dtype=np.uint8), compression="lzw"
    )
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(random.randint(1, 5)):
            buf[random.randrange(len(buf))] = random.randrange(256)
        try:
            tiff_decode(bytes(buf))
        except TiffError:
            pass  # fail-closed; surviving decodes are fine too
    for cut in range(0, len(base), 13):
        try:
            tiff_decode(base[:cut])
        except TiffError:
            pass
    for _ in range(200):
        junk = bytes(random.randrange(256)
                     for _ in range(random.randint(0, 100)))
        try:
            tiff_decode(b"II*\x00" + junk)
        except TiffError:
            pass
