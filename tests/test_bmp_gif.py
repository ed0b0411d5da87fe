"""BMP + GIF pixel codec tests: encoder round trips, plus hand-built
fixtures for the decode-only tiers the repo's writers never produce —
32-bit BGRA, 8-bit palette, top-down BMP rows; interlaced GIF. The LZW
decoder is additionally stress-tested across dictionary growth/reset."""

import struct

import numpy as np
import pytest

from memvid_spark.sources.image import (
    PngError,
    bmp_decode,
    bmp_encode,
    gif_decode,
    gif_encode,
)
from memvid_spark.sources.multimodal import decode_image


def test_bmp24_roundtrip_with_stride_padding():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (5, 7), (16, 13)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (bmp_decode(bmp_encode(px)) == px).all()


def _bmp(dib_extra, bpp, w, h, body, palette=b"", n_colors=0):
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(body),
                      2835, 2835, n_colors, 0)
    off = 14 + 40 + len(palette)
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return header + dib + palette + body


def test_bmp32_bgra_hand_built():
    # one row, two px: BGRA (1,2,3,4) and (5,6,7,8) → RGBA
    body = bytes([1, 2, 3, 4, 5, 6, 7, 8])
    px = bmp_decode(_bmp(None, 32, 2, 1, body))
    assert px.shape == (1, 2, 4)
    assert px[0, 0].tolist() == [3, 2, 1, 4]
    assert px[0, 1].tolist() == [7, 6, 5, 8]


def test_bmp8_palette_bottom_up_hand_built():
    # 2x2 indexed, palette BGRX; bottom-up rows with stride padding
    palette = bytes([10, 20, 30, 0,   40, 50, 60, 0])  # idx0, idx1
    body = bytes([1, 0, 0, 0]) + bytes([0, 1, 0, 0])   # row y=1 then y=0
    px = bmp_decode(_bmp(None, 8, 2, 2, body, palette, n_colors=2))
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [30, 20, 10]  # top row came from 2nd stored row
    assert px[0, 1].tolist() == [60, 50, 40]
    assert px[1, 0].tolist() == [60, 50, 40]
    assert px[1, 1].tolist() == [30, 20, 10]


def test_bmp_top_down_negative_height():
    body = bytes([1, 2, 3, 0]) + bytes([4, 5, 6, 0])  # 1px rows + padding
    px = bmp_decode(_bmp(None, 24, 1, -2, body))
    assert px[0, 0].tolist() == [3, 2, 1]  # first stored row IS the top
    assert px[1, 0].tolist() == [6, 5, 4]


def test_bmp_errors():
    with pytest.raises(PngError):
        bmp_decode(b"BMnot really a bitmap at all, just text")
    rle = bytearray(bmp_encode(np.zeros((2, 2, 3), dtype=np.uint8)))
    rle[30] = 1  # compression = BI_RLE8
    with pytest.raises(PngError, match="compression"):
        bmp_decode(bytes(rle))


PAL = np.stack(
    [np.arange(256), (np.arange(256) * 3) % 256, (np.arange(256) * 7) % 256],
    axis=1,
).astype(np.uint8)


def test_gif_roundtrip_palette_mapping():
    rng = np.random.RandomState(11)
    idx = rng.randint(0, 256, (17, 23), dtype=np.uint8)
    assert (gif_decode(gif_encode(idx, PAL)) == PAL[idx]).all()


def test_gif_lzw_dictionary_growth_and_reset():
    # 200x300 gradient: long runs grow the dictionary to 4096 and force
    # a mid-stream clear + rebuild
    idx = (np.add.outer(np.arange(200), np.arange(300)) % 256).astype(np.uint8)
    assert (gif_decode(gif_encode(idx, PAL)) == PAL[idx]).all()


def test_gif_interlaced_hand_built():
    """The repo's encoder never interlaces; splice the 4-pass row order
    into hand-assembled GIF bytes and require the decoder to undo it."""
    h, w = 11, 5
    idx = (np.add.outer(np.arange(h) * 7, np.arange(w)) % 256).astype(np.uint8)
    plain = gif_encode(idx, PAL)
    # rows in interlace pass order (8-step, then 4-, 2-, odd rows)
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, h, step)]
    shuffled = gif_encode(idx[order], PAL)
    # splice: same container, but set the interlace flag in the image
    # descriptor (GCT is 256*3 bytes after the 13-byte header)
    desc_at = 13 + 256 * 3
    assert shuffled[desc_at] == 0x2C
    flags_at = desc_at + 9
    buf = bytearray(shuffled)
    assert buf[flags_at] == 0
    buf[flags_at] = 0x40
    dec = gif_decode(bytes(buf))
    assert (dec == PAL[idx]).all()
    assert (gif_decode(plain) == PAL[idx]).all()


def test_gif_with_extension_blocks():
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    plain = gif_encode(idx, PAL)
    # inject a graphic-control extension right before the descriptor
    desc_at = 13 + 256 * 3
    gce = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    patched = plain[:desc_at] + gce + plain[desc_at:]
    assert (gif_decode(patched) == PAL[idx]).all()


def test_gif_errors():
    with pytest.raises(PngError):
        gif_decode(b"GIF89a" + b"\x00" * 7)  # no image data
    idx = np.zeros((2, 2), dtype=np.uint8)
    trunc = gif_encode(idx, PAL)[:20]
    with pytest.raises((ValueError, IndexError, struct.error)):
        gif_decode(trunc)  # PngError or a loud buffer error, never silence


def test_decode_image_routing():
    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_image(bmp_encode(px), "image/bmp") == px).all()
    idx = np.arange(9, dtype=np.uint8).reshape(3, 3)
    assert (decode_image(gif_encode(idx, PAL), "image/gif") == PAL[idx]).all()
    from memvid_spark.sources.jpeg import JpegError

    with pytest.raises(JpegError):  # JPEG is routed for real now
        decode_image(b"\xff\xd8\xff\xe0jpegish", "image/jpeg")
    from memvid_spark.sources.tiff import TiffError

    with pytest.raises(TiffError):  # TIFF routes for real now too
        decode_image(b"II*\x00tiffish", "image/tiff")
    with pytest.raises(NotImplementedError):  # genuinely uncovered format
        decode_image(b"RIFFxxxxWEBPwebpish", "image/webp")


class TestResize:
    def test_nearest_floor_convention(self):
        from memvid_spark.sources.image import resize_nearest

        px = np.arange(24, dtype=np.uint8).reshape(4, 6)
        assert resize_nearest(px, 2, 3).tolist() == [[0, 2, 4], [12, 14, 16]]
        up = resize_nearest(np.array([[1, 2], [3, 4]], dtype=np.uint8), 4, 4)
        assert up.tolist() == [[1, 1, 2, 2], [1, 1, 2, 2],
                               [3, 3, 4, 4], [3, 3, 4, 4]]

    def test_bilinear_known_values(self):
        from memvid_spark.sources.image import resize_bilinear

        # identity at same size; constant stays constant
        px = np.arange(30, dtype=np.uint8).reshape(5, 6)
        assert (resize_bilinear(px, 5, 6) == px).all()
        assert (resize_bilinear(np.full((3, 3, 4), 9, np.uint8), 7, 2) == 9).all()
        # 1x2 -> 1x4 with align_corners=False: [0, 25, 75, 100]
        b = resize_bilinear(np.array([[0, 100]], dtype=np.uint8), 1, 4)
        assert b.tolist() == [[0, 25, 75, 100]]
        # channels preserved
        rgb = np.zeros((2, 2, 3), dtype=np.uint8)
        rgb[:, :, 1] = 200
        out = resize_bilinear(rgb, 3, 3)
        assert out.shape == (3, 3, 3) and (out[:, :, 1] == 200).all()
