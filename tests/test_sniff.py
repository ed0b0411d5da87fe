"""Format-inference ladder pins (mutation.rs:229-321 parity): magic >
zip-member disambiguation > MIME map > extension catalog > UTF-8
fallback, plus the BOM/whitespace-tolerant PDF magic and the html/
markdown/jsonl reader routing."""

from __future__ import annotations

import pytest

from memvid_spark.sources.readers import READERS, sniff_format


def test_pdf_magic_tolerates_bom_and_whitespace():
    assert sniff_format(b"%PDF-1.7 rest") == "pdf"
    assert sniff_format(b"\xef\xbb\xbf%PDF-1.7") == "pdf"
    assert sniff_format(b"\n  \t%PDF-1.4") == "pdf"
    assert sniff_format(b"x%PDF-1.4") == "text"


def test_mime_map_and_text_star_fallback():
    assert sniff_format(b"hello", mime="text/markdown") == "markdown"
    assert sniff_format(b"<p>x</p>", mime="text/html") == "html"
    assert sniff_format(b"a,b", mime="text/csv; charset=utf-8") == "text"
    assert sniff_format(b"{}", mime="application/x-ndjson") == "jsonl"


def test_mime_beats_extension():
    assert sniff_format(b"x", uri="a.md", mime="text/plain") == "text"


def test_extension_catalog():
    assert sniff_format(b"# t", uri="notes.md") == "markdown"
    assert sniff_format(b"x", uri="a/b/page.htm") == "html"
    assert sniff_format(b'{"a":1}', uri="d.jsonl") == "jsonl"
    assert sniff_format(b"fn main() {}", uri="m.rs") == "text"
    assert sniff_format(b"k=v", uri="app.ini") == "text"


def test_textish_hint_requires_utf8():
    assert sniff_format(b"\xff\xfe\x00\x01garbage", uri="x.txt") == "binary"


def test_binary_hint_trusted_reader_errors():
    # .pdf extension without magic: hint wins, the reader's error
    # channel surfaces the mismatch
    assert sniff_format(b"\x00\x01\x02", uri="x.pdf") == "pdf"
    with pytest.raises(NotImplementedError):
        READERS["pdf"](b"\x00\x01\x02")


def test_html_content_sniff_without_hints():
    assert sniff_format(b"<!DOCTYPE html><html><body>x</body>") == "html"
    assert sniff_format(b"  <html><p>y</p></html>") == "html"
    assert sniff_format(b"plain words") == "text"


def test_html_reader_strips_markup():
    out = READERS["html"](b"<html><body><p>Hello <b>world</b></p></body></html>")
    assert "Hello" in out and "world" in out and "<" not in out


def test_markdown_jsonl_read_as_text():
    assert READERS["markdown"](b"# Title\nbody") == "# Title\nbody"
    assert READERS["jsonl"](b'{"t":"x"}\n{"t":"y"}') == '{"t":"x"}\n{"t":"y"}'


def test_tar_and_gzip_transparent_routing():
    """gzip is a transparent wrapper (gunzip -> re-sniff -> inner
    reader) and tar archives read as one document with every member
    routed by its own sniffed format — so doc.pdf.gz and corpus.tar.gz
    ingest with no special-casing."""
    import gzip
    import io
    import tarfile

    import pytest

    from memvid_spark.sources.binary import pdf_from_text
    from memvid_spark.sources.readers import READERS, sniff_format

    pz = gzip.compress(pdf_from_text("hello gz world"))
    assert sniff_format(pz) == "gzip"
    assert READERS["gzip"](pz) == "hello gz world"

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, content in (
            ("a.txt", b"plain text one"),
            ("b.pdf", pdf_from_text("pdf in tar")),
        ):
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    t = buf.getvalue()
    assert sniff_format(t) == "tar"
    assert READERS["tar"](t) == "plain text one\n\npdf in tar"
    # tar.gz chains through both layers
    tz = gzip.compress(t)
    assert sniff_format(tz) == "gzip"
    assert READERS["gzip"](tz) == "plain text one\n\npdf in tar"
    # fail-closed on junk (the q117 unreadable-payload channel)
    with pytest.raises(NotImplementedError):
        READERS["gzip"](b"\x1f\x8bjunkjunk")
    with pytest.raises(NotImplementedError):
        READERS["tar"](b"x" * 600)
