"""Baseline JPEG codec tests: exact round trips for block-constant
images (single-DC-coefficient blocks under unit quantization), bounded
error for general images (IDCT rounding), restart-marker resync, marker
segment skipping (APPn/COM), and the unsupported-flavor error paths
(progressive SOF2, chroma subsampling, 16-bit DQT)."""

import struct

import numpy as np
import pytest

from memvid_spark.sources.jpeg import JpegError, jpeg_decode, jpeg_encode
from memvid_spark.sources.multimodal import decode_image
from memvid_spark.sources.image import jpeg_metadata
from memvid_spark.sources.readers import sniff_format


def test_block_constant_gray_exact():
    rng = np.random.RandomState(0)
    blocks = rng.randint(0, 256, (3, 4), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    payload = jpeg_encode(img)
    assert sniff_format(payload) == "jpeg"
    m = jpeg_metadata(payload)
    assert (m["width"], m["height"], m["channels"]) == (32, 24, 1)
    assert (jpeg_decode(payload) == img).all()


def test_block_constant_ragged_edges_exact():
    # non-multiple-of-8 dims: partial edge blocks still constant after
    # edge-replicate padding → still exact
    w, h = 21, 13
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (((x // 8) * 50 + (y // 8) * 90 + 7) % 256).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == (h, w) and (dec == img).all()


def test_general_gray_bounded_error():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (24, 33), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_color_roundtrip_bounded_error():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (17, 19, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img))
    assert dec.shape == (17, 19, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_restart_markers():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (40, 40), dtype=np.uint8)
    payload = jpeg_encode(img, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI segment present
    dec = jpeg_decode(payload)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_quantization_lossy_but_decodable():
    img = np.full((16, 16), 100, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quant=8))
    assert np.abs(dec.astype(int) - 100).max() <= 8


def test_appn_com_segments_skipped():
    img = np.full((8, 8), 42, dtype=np.uint8)
    payload = jpeg_encode(img)
    # splice a JFIF APP0 and a COM right after SOI — real files do this
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
    patched = payload[:2] + app0 + com + payload[2:]
    assert (jpeg_decode(patched) == img).all()


def test_unsupported_flavors_raise_clearly():
    with pytest.raises(JpegError, match="signature"):
        jpeg_decode(b"not a jpeg")
    img = np.full((8, 8), 9, dtype=np.uint8)
    payload = bytearray(jpeg_encode(img))
    sof_at = payload.find(b"\xff\xc0")
    # SOF2 is now SUPPORTED; relabeling a baseline stream makes it a
    # MALFORMED progressive one (its single scan spans Ss=0..Se=63,
    # illegal for a progressive DC scan) — must still fail closed
    prog = bytearray(payload)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(JpegError, match="Se"):
        jpeg_decode(bytes(prog))
    # non-integer sampling ratio (3 does not divide hmax 2)
    rgb = bytearray(jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8),
                                subsample="420"))
    sof3 = rgb.find(b"\xff\xc0")
    bad = bytearray(rgb)
    bad[sof3 + 11] = 0x33  # component 0: 3x3 vs chroma 1x1 → hmax 3 % 2...
    bad[sof3 + 14] = 0x22  # component 1: 2x2 → 3 % 2 != 0
    with pytest.raises(JpegError, match="sampling"):
        jpeg_decode(bytes(bad))
    # 16-bit quant table: flip Pq nibble
    dqt_at = payload.find(b"\xff\xdb")
    wide = bytearray(payload)
    wide[dqt_at + 4] = 0x10
    with pytest.raises(JpegError, match="quant"):
        jpeg_decode(bytes(wide))


class TestChromaSubsampling:
    def test_420_flat_color_near_exact(self):
        flat = np.zeros((32, 48, 3), dtype=np.uint8)
        flat[:] = [180, 90, 40]
        d = jpeg_decode(jpeg_encode(flat, subsample="420"))
        assert d.shape == flat.shape
        assert np.abs(d.astype(int) - flat.astype(int)).max() <= 2

    def test_420_and_422_gradient_bounds(self):
        yy, xx = np.meshgrid(np.arange(24), np.arange(40), indexing="ij")
        grad = np.stack(
            [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=2
        ).astype(np.uint8)
        d420 = jpeg_decode(jpeg_encode(grad, subsample="420"))
        assert np.abs(d420.astype(int) - grad.astype(int)).max() <= 6
        d422 = jpeg_decode(jpeg_encode(grad, subsample="422"))
        assert np.abs(d422.astype(int) - grad.astype(int)).max() <= 4
        # luma survives chroma downsampling almost exactly
        def luma(a):
            return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

        assert np.abs(luma(d420) - luma(grad)).max() <= 2.0

    def test_420_ragged_dims_and_restarts(self):
        # mid-range values so chroma averaging can't clip RGB (clipping
        # bleeds chroma error into recomputed luma — inherent to 4:2:0)
        rng = np.random.RandomState(9)
        odd = rng.randint(96, 160, (19, 21, 3), dtype=np.uint8)
        payload = jpeg_encode(odd, subsample="420", restart_interval=2)
        assert b"\xff\xdd" in payload
        d = jpeg_decode(payload)
        assert d.shape == odd.shape  # MCU padding cropped correctly

        def luma(a):
            return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

        assert np.abs(luma(d.astype(float)) - luma(odd.astype(float))).max() <= 3.0

    def test_unknown_subsample_rejected(self):
        with pytest.raises(JpegError, match="subsampling"):
            jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), subsample="411")


def test_decode_image_routes_jpeg():
    img = np.kron(
        np.array([[10, 200], [60, 140]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    assert (decode_image(jpeg_encode(img), "image/jpeg") == img).all()


# --- progressive (SOF2) ---------------------------------------------------


def test_progressive_matches_baseline_decode_exactly():
    """Progressive and baseline streams carry the SAME quantized
    coefficients here, so their decodes must be bit-identical."""
    import numpy as np

    from memvid_spark.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.RandomState(11)
    for shape, sub in [((16, 16, 3), "444"), ((21, 19, 3), "420"),
                       ((24, 18, 3), "422")]:
        px = rng.randint(0, 256, shape, dtype=np.uint8)
        base = jpeg_decode(jpeg_encode(px, quant=1, subsample=sub))
        for dc_al, ac_al in [(0, 0), (1, 1), (2, 2)]:
            prog = jpeg_decode(
                jpeg_encode_progressive(
                    px, quant=1, subsample=sub, dc_al=dc_al, ac_al=ac_al
                )
            )
            assert np.array_equal(prog, base), (shape, sub, dc_al, ac_al)


def test_progressive_grayscale_near_lossless_quant1():
    import numpy as np

    from memvid_spark.sources.jpeg import jpeg_decode, jpeg_encode_progressive

    rng = np.random.RandomState(3)
    g = rng.randint(0, 256, (24, 17), dtype=np.uint8)
    d = jpeg_decode(jpeg_encode_progressive(g, quant=1, dc_al=1, ac_al=1))
    assert d.shape == g.shape
    assert int(np.abs(d.astype(int) - g.astype(int)).max()) <= 2


def test_progressive_eob_runs_and_zrl():
    """Flat blocks force long EOB runs; an alternating-sign block puts
    its only AC coefficient at zigzag 63 (62 leading zeros → ZRL
    chains) — the run-coding paths dense noise never hits."""
    import numpy as np

    from memvid_spark.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    g = np.full((32, 40), 90, dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    g[8:16, 16:24] = 90 + 40 * ((xx + yy) % 2)  # highest-frequency block
    base = jpeg_decode(jpeg_encode(g, quant=1))
    for dc_al, ac_al in [(0, 0), (1, 1)]:
        prog = jpeg_decode(
            jpeg_encode_progressive(g, quant=1, dc_al=dc_al, ac_al=ac_al)
        )
        assert np.array_equal(prog, base), (dc_al, ac_al)


def test_progressive_quantized_general_image():
    """Non-trivial quant: progressive must still equal baseline decode
    (same coefficient math, different scan order)."""
    import numpy as np

    from memvid_spark.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (40, 33, 3), dtype=np.uint8)
    base = jpeg_decode(jpeg_encode(px, quant=4))
    prog = jpeg_decode(jpeg_encode_progressive(px, quant=4, dc_al=1, ac_al=1))
    assert np.array_equal(prog, base)


def test_hierarchical_still_rejected():
    import pytest as _pytest

    from memvid_spark.sources.jpeg import JpegError, jpeg_decode, jpeg_encode

    import numpy as np

    b = bytearray(jpeg_encode(np.zeros((8, 8), dtype=np.uint8)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC3  # lossless sequential SOF
    with _pytest.raises(JpegError):
        jpeg_decode(bytes(b))
