"""Property-based codec tests: lossless round trips must hold for ALL
inputs, not just the synthetic fixtures — arbitrary shapes, values,
channel counts. Each failure here is a real byte-level bug (stride,
sign, palette, filter, chunking), which is exactly what hypothesis
shrinks to a minimal reproducer."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from memvid_spark.sources.audio import wav_decode, wav_encode
from memvid_spark.sources.image import (
    bmp_decode,
    bmp_encode,
    gif_decode,
    gif_encode,
    png_decode,
    png_encode,
    resize_nearest,
)
from memvid_spark.sources.jpeg import jpeg_decode, jpeg_encode
from memvid_spark.sources.subtitles import srt_parse, srt_write
from memvid_spark.sources.video import MuxTrack, mp4_mux, mp4_samples

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def arr(h, w, ch, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.randint(0, 256, shape, dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(dims, st.sampled_from([1, 2, 3, 4]), st.integers(0, 10**6))
def test_png_roundtrip_lossless(d, ch, seed):
    px = arr(*d, ch, seed)
    dec = png_decode(png_encode(px)).pixels
    want = px if px.ndim == 3 else px[:, :, None]
    assert (dec == want).all()


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 10**6))
def test_bmp_roundtrip_lossless(d, seed):
    px = arr(*d, 3, seed)
    assert (bmp_decode(bmp_encode(px)) == px).all()


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(1, 256), st.integers(0, 10**6))
def test_gif_roundtrip_lossless(d, ncolors, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, d, dtype=np.uint8)
    assert (gif_decode(gif_encode(idx, pal)) == pal[idx]).all()


@settings(max_examples=40, deadline=None)
@given(dims, st.integers(0, 10**6))
def test_jpeg_unit_quant_bounded(d, seed):
    # JPEG is transform-coded: unit quantization bounds error by IDCT
    # rounding (±2 gray), never more
    px = arr(*d, 1, seed)
    dec = jpeg_decode(jpeg_encode(px))
    assert dec.shape == px.shape
    assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 500), st.sampled_from([1, 2]),
    st.sampled_from([8000, 16000, 44100]), st.integers(0, 10**6),
)
def test_wav_roundtrip_lossless(n, ch, rate, seed):
    rng = np.random.RandomState(seed)
    s = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    a = wav_decode(wav_encode(s, rate))
    assert a.sample_rate == rate and a.channels == ch
    assert (a.samples == s).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.binary(min_size=1, max_size=40), min_size=1, max_size=12),
    st.integers(1, 4),
    st.integers(0, 5),
)
def test_mp4_sample_bytes_roundtrip(samples, spc, sync_every):
    payload = mp4_mux([
        MuxTrack("vide", "mp4v", samples, [100] * len(samples),
                 samples_per_chunk=spc, sync_every=sync_every),
    ])
    assert [b for _, b in mp4_samples(payload, 1)] == samples


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.integers(0, 3_000_000), st.integers(1, 60_000)),
    min_size=1, max_size=10,
))
def test_srt_roundtrip(cues):
    segs = [(t0, t0 + d, f"cue {i}") for i, (t0, d) in enumerate(cues)]
    parsed = srt_parse(srt_write(segs))
    assert [(t0, t1, txt) for _i, t0, t1, txt in parsed] == segs


@settings(max_examples=40, deadline=None)
@given(dims, dims, st.integers(0, 10**6))
def test_resize_nearest_values_come_from_source(d, out_d, seed):
    px = arr(*d, 1, seed)
    out = resize_nearest(px, *out_d)
    assert out.shape == out_d
    assert np.isin(out, px).all()  # NN never invents values


# --- adversarial: malformed bytes must raise cleanly, fast ---------------


def _collect_decoders():
    from memvid_spark.sources import binary as B
    from memvid_spark.sources.audio import wav_decode
    from memvid_spark.sources.image import bmp_decode, gif_decode, png_decode
    from memvid_spark.sources.jpeg import jpeg_decode
    from memvid_spark.sources.video import mp4_manifest

    return [
        ("png", png_decode, b"\x89PNG\r\n\x1a\n"),
        ("bmp", bmp_decode, b"BM"),
        ("gif", gif_decode, b"GIF89a"),
        ("jpeg", jpeg_decode, b"\xff\xd8"),
        ("wav", wav_decode, b"RIFF\x40\x00\x00\x00WAVE"),
        ("mp4", mp4_manifest, b"\x00\x00\x00\x10ftypisom"),
        ("pdf-txt", B.pdf_extract_text, b"%PDF-1.4\n"),
    ]


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(0, 6))
def test_decoders_fail_closed_on_garbage(junk, which):
    """Magic prefix + random garbage: every decoder must either return a
    well-formed result or raise a normal exception — never hang, never
    kill the interpreter. At 100 TB the corpus WILL contain these."""
    name, fn, magic = _collect_decoders()[which]
    try:
        fn(magic + junk)
    except Exception:
        pass  # clean failure is the contract; error CHANNELS wrap this


cell_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
sheet_rows = st.lists(
    st.lists(cell_text, min_size=1, max_size=5), min_size=1, max_size=8
)


@settings(max_examples=30, deadline=None)
@given(rows=sheet_rows, name=st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF,
                           blacklist_categories=("Cs",)),
    min_size=1, max_size=20))
def test_xls_roundtrip_arbitrary_sheets(rows, name):
    """CFB+BIFF8 writer→reader must re-render EXACTLY the text the
    reader contract promises for any cell content — including cells
    that look numeric/boolean (written as NUMBER/BOOLERR) and unicode
    up to astral planes."""
    from memvid_spark.sources.xls import xls_extract_rows, xls_from_rows

    # every cell (including empty strings) gets a record, so the round
    # trip is EXACT — same contract the multisheet unit test pins
    sheets = [(name, rows)]
    got = xls_extract_rows(xls_from_rows(sheets))
    assert got == [(name, [list(r) for r in rows])]


@settings(max_examples=30, deadline=None)
@given(junk=st.binary(min_size=0, max_size=600))
def test_xls_fails_closed_on_garbage(junk):
    from memvid_spark.sources.xls import CFB_MAGIC, xls_extract_text

    assert xls_extract_text(CFB_MAGIC + junk) is None or isinstance(
        xls_extract_text(CFB_MAGIC + junk), str
    )


@settings(max_examples=20, deadline=None)
@given(d=dims, seed=st.integers(0, 10_000),
       al=st.integers(0, 3), sub=st.sampled_from(["444", "420", "422"]))
# regression: a history AC coefficient past the 16th zero of a run must
# have its correction bit follow the covering ZRL (G.7) — this example
# desynced the refinement decode before the fix
@example(d=(17, 11), seed=0, al=1, sub="444")
def test_progressive_equals_baseline_decode(d, seed, al, sub):
    """For any image, a progressive stream carrying the same quantized
    coefficients must decode bit-identically to the baseline stream —
    scan order cannot change the math."""
    from memvid_spark.sources.jpeg import (
        jpeg_decode,
        jpeg_encode,
        jpeg_encode_progressive,
    )

    px = arr(d[0], d[1], 3, seed)
    base = jpeg_decode(jpeg_encode(px, quant=1, subsample=sub))
    prog = jpeg_decode(
        jpeg_encode_progressive(px, quant=1, subsample=sub, dc_al=al, ac_al=al)
    )
    assert np.array_equal(prog, base)


doc_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=40, deadline=None)
@given(t=doc_text, which=st.integers(0, 4))
def test_document_writers_roundtrip_text(t, which):
    """Every document writer→extractor pair re-renders the exact text
    modulo newline canonicalization (CRLF / lone CR store as LF, the
    word-processor convention — fuzz-found: a CR left inside a line
    doubled the break on extraction)."""
    from memvid_spark.sources import binary as B
    from memvid_spark.sources.xls import xls_extract_text, xls_from_text

    pairs = [
        lambda s: B.pdf_extract_text(B.pdf_from_text(s)),
        lambda s: B.docx_extract_text(B.docx_from_text(s)),
        lambda s: B.xlsx_extract_text(B.xlsx_from_text(s)),
        lambda s: B.pptx_extract_text(B.pptx_from_text(s)),
        lambda s: xls_extract_text(xls_from_text(s)),
    ]
    from memvid_spark.sources.binary import _canon_newlines

    assert (pairs[which](t) or "") == _canon_newlines(t)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(1, 1200),
    st.sampled_from([1, 2]),
    st.sampled_from([8, 16, 24]),
    st.sampled_from(["auto", "independent", "left_side", "right_side",
                     "mid_side"]),
    st.sampled_from([192, 256, 301, 4096]),
    st.integers(0, 10**6),
)
def test_flac_roundtrip_lossless(n, n_ch, bps, mode, bs, seed):
    from memvid_spark.sources.flac import flac_decode, flac_encode

    rng = np.random.RandomState(seed)
    lim = 1 << (bps - 1)
    # mix of noisy and smooth content so every predictor family fires
    base = rng.randint(-lim, lim, n)
    smooth = np.cumsum(rng.randint(-50, 51, n))
    chans = [
        np.clip(base if c % 2 else smooth, -lim, lim - 1).tolist()
        for c in range(n_ch)
    ]
    if n_ch == 1:
        mode = "auto"
    dec = flac_decode(
        flac_encode(chans, 16000, bps=bps, block_size=bs, stereo_mode=mode),
        verify_md5=True,
    )
    assert [list(c) for c in dec.channels] == chans


@settings(max_examples=30, deadline=None)
@given(
    dims,
    st.sampled_from([1, 3, 4]),
    st.sampled_from(["II", "MM"]),
    st.sampled_from(["none", "lzw", "packbits"]),
    st.booleans(),
    st.integers(1, 9),
    st.integers(0, 10**6),
)
def test_tiff_roundtrip_lossless(d, ch, bo, comp, pred, rps, seed):
    from memvid_spark.sources.tiff import tiff_decode, tiff_encode

    px = arr(*d, ch, seed)
    dec = tiff_decode(
        tiff_encode(px, byte_order=bo, compression=comp,
                    rows_per_strip=rps, predictor=pred)
    )
    want = px if px.ndim == 3 else px[:, :, None]
    assert (dec == want).all()
