"""PNG extended-tier tests over HAND-ENCODED fixtures (the repo's
writer emits only depth-8 non-interlaced): Adam7 interlace with mixed
per-pass filters, 16-bit samples, 1/2/4-bit gray and palette."""

import struct
import zlib

import numpy as np
import pytest

from memvid_spark.sources.image import PNG_MAGIC, PngError, png_decode

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def png(w, h, depth, color, interlace, raw, plte=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    body = PNG_MAGIC + chunk(b"IHDR", ihdr)
    if plte:
        body += chunk(b"PLTE", plte)
    body += chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    return body


def test_adam7_interlaced_gray8():
    h, w = 9, 10
    img = ((np.arange(h)[:, None] * 17 + np.arange(w) * 29) % 256).astype(
        np.uint8
    )
    raw = bytearray()
    for pi, (x0, y0, xs, ys) in enumerate(_ADAM7):
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        prev = np.zeros(sub.shape[1], dtype=np.int32)
        for r in sub:
            if pi % 2 == 0:  # filter None on even passes
                raw += b"\x00" + r.tobytes()
            else:  # filter Up on odd passes — per-pass independence
                raw += b"\x02" + ((r.astype(np.int32) - prev) % 256).astype(
                    np.uint8
                ).tobytes()
            prev = r.astype(np.int32)
    dec = png_decode(png(w, h, 8, 0, 1, bytes(raw)))
    assert dec.bit_depth == 8 and dec.pixels.shape == (h, w, 1)
    assert (dec.pixels[:, :, 0] == img).all()


def test_adam7_interlaced_rgb_small():
    # 3x3: several Adam7 passes are EMPTY — the walker must skip them
    h, w = 3, 3
    img = (np.arange(h * w * 3) % 256).astype(np.uint8).reshape(h, w, 3)
    raw = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for r in sub:
            raw += b"\x00" + r.tobytes()
    dec = png_decode(png(w, h, 8, 2, 1, bytes(raw)))
    assert (dec.pixels == img).all()


def test_sixteen_bit_gray_high_byte():
    vals = np.array([[0, 1, 255], [128, 64, 200]], dtype=np.uint16)
    samples = (vals.astype(">u2") * 257).astype(">u2")  # hi == lo == v
    raw = b"".join(b"\x00" + row.tobytes() for row in samples)
    dec = png_decode(png(3, 2, 16, 0, 0, raw))
    assert dec.bit_depth == 16
    assert (dec.pixels[:, :, 0] == vals.astype(np.uint8)).all()


def test_one_bit_gray_scales_to_full_range():
    # 10 px/row → 2 bytes/row, MSB first, trailing bits ignored
    row0 = bytes([0b10110001, 0b01000000])
    row1 = bytes([0b01001110, 0b11000000])
    raw = b"\x00" + row0 + b"\x00" + row1
    dec = png_decode(png(10, 2, 1, 0, 0, raw))
    got = (dec.pixels[:, :, 0] == 255).astype(int)
    assert got[0].tolist() == [1, 0, 1, 1, 0, 0, 0, 1, 0, 1]
    assert got[1].tolist() == [0, 1, 0, 0, 1, 1, 1, 0, 1, 1]


def test_two_bit_gray():
    # 5 px of 2-bit: values 0..3 scale by 85
    row = bytes([0b00011011, 0b11000000])  # 0,1,2,3,3
    dec = png_decode(png(5, 1, 2, 0, 0, b"\x00" + row))
    assert dec.pixels[0, :, 0].tolist() == [0, 85, 170, 255, 255]


def test_four_bit_palette():
    plte = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  7, 8, 9])
    row = bytes([0x01, 0x23])  # indices 0,1,2,3
    dec = png_decode(png(4, 1, 4, 3, 0, b"\x00" + row, plte=plte))
    assert dec.pixels[0].tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9],
    ]


def test_four_bit_palette_sub_filter_byte_distance():
    # Sub filter at sub-byte depth uses bpp=1 BYTE distance per spec
    plte = bytes(range(48))  # 16 entries
    rows = np.array([[0x12, 0x34], [0x56, 0x78]], dtype=np.uint8)
    raw = bytearray()
    for r in rows:
        enc = [r[0], (int(r[1]) - int(r[0])) % 256]
        raw += bytes([1]) + bytes(enc)
    dec = png_decode(png(4, 2, 4, 3, 0, bytes(raw), plte=plte))
    # indices: 1,2,3,4 / 5,6,7,8 → palette rows
    assert dec.pixels[0, 0].tolist() == [3, 4, 5]
    assert dec.pixels[1, 3].tolist() == [24, 25, 26]


def test_invalid_combinations_rejected():
    with pytest.raises(PngError, match="sub-byte"):
        png_decode(png(1, 1, 4, 2, 0, b"\x00\x00"))  # 4-bit RGB illegal
    with pytest.raises(PngError, match="interlace"):
        png_decode(png(1, 1, 8, 0, 7, b"\x00\x00"))
