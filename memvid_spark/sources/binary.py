"""Pure-stdlib binary document codecs: PDF, DOCX, XLSX, PPTX.

Real byte-level parsers — no third-party libraries:

- PDF: object/stream scan, ``/FlateDecode`` via :mod:`zlib`, then a
  content-stream tokenizer that evaluates the text-showing operators
  (``Tj``, ``TJ``, ``'``, ``"``) with full PDF string syntax (nested
  parens, escapes, octal, hex strings). Two font tiers: the common
  simple-encoding tier (Standard/WinAnsi one-byte fonts → latin-1), and
  the subsetted-font tier — ``/ToUnicode`` CMaps (bfchar/bfrange,
  codespace widths) are parsed per font resource and show strings decode
  through them with ``Tf`` switching fonts mid-stream. Font and page
  dictionaries packed in /ObjStm compressed object streams (PDF 1.5+,
  where most modern writers put them) are expanded before resolution.
- DOCX / XLSX / PPTX: the OOXML containers are ZIP + XML, parsed with
  :mod:`zipfile` + :mod:`xml.etree` — paragraphs/runs for DOCX
  (``w:p``/``w:t``), sheet rows + shared/inline strings for XLSX
  (``sheetData``/``c``/``v``), slide text runs for PPTX (``a:p``/``a:t``).

Writers for the same formats are included: they produce genuinely valid
files (openable in the corresponding office apps) and serve both as the
blob-sink tier and as test-fixture generators, so extraction tests run
against real byte streams rather than mocks.

Reference semantics: format sniff → per-format extract → text
(src/reader/mod.rs:28-217); XLSX structured rows feed the sheet-table
detector in sources/readers.py (src/reader/xlsx_table_detect.rs);
PDF text-op extraction mirrors src/table/pdf_extractor.rs's tier.

Scale posture: all functions here are bytes→str/bytes kernels called from
Arrow-batched ``mapInPandas`` (sources/readers.py); no Spark state, no
driver-side work — each executor decodes its own partitions' payloads.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape as _xesc

# ---------------------------------------------------------------------------
# PDF — extraction
# ---------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)

_PDF_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_pdf_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a ``(...)`` literal string starting at ``i``; returns
    (decoded bytes, index after the closing paren). Handles nesting,
    backslash escapes, octal escapes, and escaped newlines."""
    assert data[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _PDF_ESCAPES:
                out += _PDF_ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i
                while j < min(i + 3, n) and 0x30 <= data[j] <= 0x37:
                    j += 1
                out.append(int(data[i:j], 8) & 0xFF)
                i = j
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


_DELIMS = b" \t\r\n()<>[]/%"


def _skip_inline_image(data: bytes, pos: int) -> int:
    """Advance past an inline image whose ``BI`` just tokenized at
    ``pos``: find the ``ID`` operator, then the first
    whitespace-delimited ``EI`` after the raw sample data (ISO 32000-1
    §8.9.7) — image bytes would otherwise tokenize as garbage text
    operators. Returns the index after ``EI`` (end of stream when
    unterminated: fail closed, never tokenize image bytes)."""
    idm = re.compile(rb"\bID[ \r\n]").search(data, pos)
    if idm is None:
        return len(data)
    j = idm.end()
    while True:
        k = data.find(b"EI", j)
        if k == -1:
            return len(data)
        before_ok = k == 0 or data[k - 1 : k] in (b" ", b"\t", b"\r", b"\n")
        after = data[k + 2 : k + 3]
        after_ok = after == b"" or after in (
            b" ", b"\t", b"\r", b"\n", b"/", b"[", b"]", b"(", b"<", b"%",
        )
        if before_ok and after_ok:
            return k + 2
        j = k + 2


class ToUnicodeCMap:
    """Parsed /ToUnicode CMap: code → Unicode string, with source code
    byte-widths from the codespace ranges (1-byte simple fonts, 2-byte
    Identity-H subsetted fonts, or mixed)."""

    def __init__(self) -> None:
        # keyed (width, code): a 1-byte 0x41 and 2-byte 0x0041 are
        # distinct source codes and must not collide
        self.map: dict[tuple[int, int], str] = {}
        self.widths: set[int] = set()

    def add(self, code: int, text: str, width: int) -> None:
        self.map[(width, code)] = text
        self.widths.add(width)

    def decode(self, raw: bytes) -> str:
        """Decode show-string bytes through the map. Widths from the
        CMap drive unit size (longest match first); unmapped codes
        degrade to latin-1 of their bytes (visible, not dropped)."""
        widths = sorted(self.widths, reverse=True) or [1]
        out: list[str] = []
        i, n = 0, len(raw)
        while i < n:
            for w in widths:
                if i + w <= n and (w, int.from_bytes(raw[i : i + w], "big")) in self.map:
                    out.append(self.map[(w, int.from_bytes(raw[i : i + w], "big"))])
                    i += w
                    break
            else:
                out.append(chr(raw[i]))
                i += 1
        return "".join(out)


def _parse_tounicode(stream: bytes) -> ToUnicodeCMap:
    """Parse a ToUnicode CMap stream: codespacerange (code widths),
    bfchar pairs and bfrange triples (PDF 1.7 §9.10.3 semantics:
    destination hex is UTF-16BE; range third operand is either a start
    value whose LAST byte increments, or an array of destinations)."""
    cmap = ToUnicodeCMap()
    text = stream
    hexre = re.compile(rb"<([0-9A-Fa-f]+)>")

    def u16(hx: bytes) -> str:
        b = bytes.fromhex(hx.decode("ascii"))
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    for m in re.finditer(rb"begincodespacerange(.*?)endcodespacerange", text, re.S):
        for h in hexre.finditer(m.group(1)):
            cmap.widths.add(len(h.group(1)) // 2)
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", text, re.S):
        toks = hexre.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            cmap.add(int(src, 16), u16(dst), len(src) // 2)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", text, re.S):
        body = m.group(1)
        i = 0
        # entries: <lo> <hi> <dst>   |   <lo> <hi> [<d0> <d1> ...]
        entry = re.compile(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
            rb"(?:<([0-9A-Fa-f]+)>|\[(.*?)\])",
            re.S,
        )
        for e in entry.finditer(body):
            lo, hi = int(e.group(1), 16), int(e.group(2), 16)
            width = len(e.group(1)) // 2
            if e.group(3) is not None:
                base = e.group(3)
                base_b = bytearray(bytes.fromhex(base.decode("ascii")))
                for k in range(hi - lo + 1):
                    b = bytearray(base_b)
                    # increment applies to the final byte (spec: last
                    # byte of the start value is incremented)
                    b[-1] = (base_b[-1] + k) & 0xFF
                    cmap.add(lo + k, bytes(b).decode("utf-16-be", "replace")
                             if len(b) % 2 == 0 else bytes(b).decode("latin-1"),
                             width)
            else:
                dsts = hexre.findall(e.group(4))
                for k, d in enumerate(dsts):
                    cmap.add(lo + k, u16(d), width)
    return cmap


def _content_stream_text(
    data: bytes, fonts: dict[bytes, ToUnicodeCMap] | None = None
) -> list[str]:
    """Evaluate text-showing operators in one decoded content stream.
    Returns the list of output lines. ``'``/``"``/``T*`` start a new
    line; ``Td``/``TD`` start one only when text is pending (real PDFs
    use them for initial positioning too). ``fonts`` maps resource
    names (e.g. b'F1') to ToUnicode CMaps; show strings under a mapped
    font decode through it (subsetted-font tier), others as latin-1
    (simple-encoding tier)."""
    fonts = fonts or {}
    lines: list[str] = []
    cur: list[str] = []
    pend: list[bytes] = []
    started = False  # saw at least one show op
    cmap: ToUnicodeCMap | None = None
    last_name = b""
    i, n = 0, len(data)

    def flushed(parts: list[bytes]) -> list[str]:
        if cmap is None:
            return [p.decode("latin-1") for p in parts]
        return [cmap.decode(p) for p in parts]

    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            s, i = _parse_pdf_string(data, i)
            pend.append(s)
        elif c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i)
            if j == -1:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pend.append(bytes.fromhex(hx.decode("ascii")))
            i = j + 1
        elif c == b"<":
            i += 2
        elif c == b"/":
            j = i + 1
            while j < n and data[j : j + 1] not in (
                b" ", b"\t", b"\r", b"\n", b"(", b")", b"<", b">", b"[", b"]", b"/", b"%",
            ):
                j += 1
            last_name = data[i + 1 : j]
            i = j
        elif c == b"%":
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c.isalpha() or c in (b"'", b'"', b"*"):
            j = i
            while j < n and data[j : j + 1] not in (
                b" ", b"\t", b"\r", b"\n", b"(", b")", b"<", b">", b"[", b"]", b"/", b"%",
            ):
                j += 1
            op = data[i:j]
            if op == b"BI":
                i = _skip_inline_image(data, j)
                pend = []
                continue
            if op == b"Tf":
                cmap = fonts.get(last_name)
            elif op == b"Tj" or op == b"TJ":
                cur += flushed(pend)
                started = True
            elif op in (b"'", b'"'):
                lines.append("".join(cur))
                cur = flushed(pend)
                started = True
            elif op == b"T*":
                lines.append("".join(cur))
                cur = []
            elif op in (b"Td", b"TD") and started and (cur or pend):
                lines.append("".join(cur))
                cur = []
            pend = []
            i = j
        else:
            i += 1
    if cur or (started and not lines):
        lines.append("".join(cur))
    return lines if started else []


_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.S)


def _object_stream_bytes(body: bytes) -> bytes | None:
    """Raw (Flate-decoded if marked) stream bytes of one object body."""
    sm = re.search(rb"stream\r?\n", body)
    if sm is None:
        return None
    end = body.find(b"endstream", sm.end())
    data = body[sm.end() : end if end != -1 else len(body)]
    if data.endswith(b"\r\n"):
        data = data[:-2]
    elif data.endswith(b"\n") or data.endswith(b"\r"):
        data = data[:-1]
    if b"/FlateDecode" in body[: sm.start()]:
        try:
            data = zlib.decompress(data)
        except zlib.error:
            try:
                data = zlib.decompressobj().decompress(data)
            except zlib.error:
                return None
    return data


def _expand_object_streams(objs: dict[int, bytes]) -> dict[int, bytes]:
    """Objects packed inside ``/Type /ObjStm`` compressed object streams
    (PDF 1.5+, ISO 32000-1 §7.5.7) — where most modern writers put font
    and page dictionaries. Layout: the decoded stream opens with ``/N``
    pairs of ``objnum offset`` integers, then object bodies start at
    ``/First``, each at its offset. Streams themselves can never nest in
    an ObjStm, so the returned bodies are plain dict/value objects.
    Indirect ``/N``/``/First`` values (legal but unseen in practice) are
    skipped rather than chased."""
    found: dict[int, bytes] = {}
    for body in objs.values():
        sm = re.search(rb"stream\r?\n", body)
        head = body[: sm.start()] if sm else body
        if b"/ObjStm" not in head:
            continue
        # (?![0-9]) pins the full number first (no backtrack-shortening),
        # then the indirect-reference lookahead can veto cleanly
        n_m = re.search(rb"/N\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", head)
        f_m = re.search(rb"/First\s+(\d+)(?![0-9])(?!\s+\d+\s+R)", head)
        data = _object_stream_bytes(body)
        if n_m is None or f_m is None or data is None:
            continue
        n, first = int(n_m.group(1)), int(f_m.group(1))
        ints = [int(x) for x in re.findall(rb"\d+", data[:first])]
        pairs = list(zip(ints[0::2], ints[1::2]))[:n]
        for i, (num, off) in enumerate(pairs):
            end = pairs[i + 1][1] if i + 1 < len(pairs) else len(data) - first
            found[num] = data[first + off : first + end]
    return found


def _pdf_font_cmaps(payload: bytes) -> dict[bytes, ToUnicodeCMap]:
    """Resource-name → ToUnicode CMap table (subsetted-font tier,
    src/table/pdf_extractor.rs coverage): scan ``N 0 obj`` bodies —
    including objects packed in /ObjStm compressed object streams —
    read ``/Font << /Fx N 0 R >>`` resource dicts, follow each font
    object's ``/ToUnicode M 0 R`` to its CMap stream and parse it.
    Font names are merged globally (per-page resource scoping is rare
    enough in practice that last-wins is documented behavior)."""
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    objs.update(_expand_object_streams(objs))
    fonts: dict[bytes, ToUnicodeCMap] = {}
    cmap_cache: dict[int, ToUnicodeCMap | None] = {}

    def cmap_of(obj_num: int) -> ToUnicodeCMap | None:
        if obj_num not in cmap_cache:
            body = objs.get(obj_num)
            data = _object_stream_bytes(body) if body is not None else None
            cmap_cache[obj_num] = _parse_tounicode(data) if data else None
        return cmap_cache[obj_num]

    for body in objs.values():
        for fm in re.finditer(rb"/Font\s*<<(.*?)>>", body, re.S):
            for ref in re.finditer(rb"/(\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
                name, font_obj = ref.group(1), int(ref.group(2))
                font_body = objs.get(font_obj)
                if font_body is None:
                    continue
                tu = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", font_body)
                if tu is None:
                    continue
                cmap = cmap_of(int(tu.group(1)))
                if cmap is not None and cmap.map:
                    fonts[name] = cmap
    return fonts


def pdf_extract_text(payload: bytes) -> str:
    """Extract text from a real PDF byte stream in READING order: the
    page tree resolves /Kids-order content streams first (then leftover
    BT-carrying streams such as Form XObjects, so nothing is lost), and
    each decoded stream runs through the text-op evaluator.
    Simple-encoding fonts decode as latin-1; fonts carrying a
    ``/ToUnicode`` CMap (subsetted/Identity-H) decode through it. PDFs
    without a parseable page tree fall back to the raw file-order
    stream scan."""
    fonts = _pdf_font_cmaps(payload)
    from .pdf_layout import ordered_text_streams

    streams = ordered_text_streams(payload)
    if streams is not None:
        out: list[str] = []
        for data in streams:
            if b"BT" in data:
                out.extend(_content_stream_text(data, fonts))
        return "\n".join(out)
    out = []
    for m in _STREAM_RE.finditer(payload):
        d = m.group(1)
        start = m.end()
        end = payload.find(b"endstream", start)
        if end == -1:
            continue
        data = payload[start:end]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
        if b"/FlateDecode" in d:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                try:
                    data = zlib.decompressobj().decompress(data)
                except zlib.error:
                    continue
        if b"BT" not in data:
            continue
        out.extend(_content_stream_text(data, fonts))
    return "\n".join(out)


# ---------------------------------------------------------------------------
# PDF — writer (valid single-page PDF; used as fixture generator + sink tier)
# ---------------------------------------------------------------------------


def _pdf_escape(line: str) -> bytes:
    b = line.encode("latin-1")  # callers pre-check; non-Latin-1 → CID tier
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


_XML_INVALID = {c: None for c in range(0x20) if c not in (0x09, 0x0A, 0x0D)}
_XML_INVALID[0xFFFE] = None
_XML_INVALID[0xFFFF] = None


def _canon_newlines(text: str) -> str:
    """Writers store LINES: CRLF and lone CR canonicalize to LF before
    splitting, the way word processors do — a stray CR left inside a
    line would re-render as its own break on extraction (fuzz-found).
    C0 controls (and FFFE/FFFF) are dropped uniformly: XML 1.0 cannot
    carry them at all, and the writers share one text contract."""
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    return text.translate(_XML_INVALID)


def pdf_from_text(text: str, compress: bool = True) -> bytes:
    """Serialize text into a minimal valid PDF (one page, Helvetica, one
    text block; ``Tj`` for the first line then ``'`` per following line —
    exactly the operator set the extractor evaluates).

    The simple-font tier stores text as Latin-1 (WinAnsi-style one-byte
    encoding); text containing any character outside Latin-1 is routed to
    the Type0/ToUnicode writer (``pdf_from_text_cid``) instead, so every
    input round-trips exactly — nothing silently degrades to ``?``."""
    try:
        text.encode("latin-1")
    except UnicodeEncodeError:
        return pdf_from_text_cid(text, compress=compress)
    lines = _canon_newlines(text).split("\n")
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for k, ln in enumerate(lines):
        ops.append(b"(" + _pdf_escape(ln) + (b") Tj" if k == 0 else b") '"))
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


def pdf_from_text_cid(text: str, compress: bool = True) -> bytes:
    """Serialize text as a SUBSETTED-FONT-style PDF: a Type0/Identity-H
    composite font whose glyphs are addressed by arbitrary 2-byte codes
    (assigned here in first-appearance order, deliberately NOT Unicode),
    show strings as hex, and a /ToUnicode CMap carrying the code→Unicode
    mapping — the font class src/table/pdf_extractor.rs covers and most
    real-world PDFs ship. The fixture exercises both bfchar entries and
    a bfrange for the longest contiguous code run. Full Unicode round-
    trips (unlike the Latin-1 simple-font tier)."""
    lines = _canon_newlines(text).split("\n")
    chars: dict[str, int] = {}
    for ch in text.replace("\n", ""):
        if ch not in chars:
            chars[ch] = len(chars) + 1  # codes from 0x0001
    enc = lambda s: "".join(f"{chars[c]:04X}" for c in s)  # noqa: E731
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for k, ln in enumerate(lines):
        ops.append(
            b"<" + enc(ln).encode("ascii") + (b"> Tj" if k == 0 else b"> '")
        )
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    # ToUnicode: contiguous codes whose Unicode values are also
    # consecutive collapse into one bfrange; the rest emit as bfchar
    items = sorted((code, ch) for ch, code in chars.items())
    run: list[tuple[int, str]] = []
    runs: list[list[tuple[int, str]]] = []
    for code, ch in items:
        if run and code == run[-1][0] + 1 and ord(ch) == ord(run[-1][1]) + 1 \
                and (ord(ch) & 0xFF) != 0:
            run.append((code, ch))
        else:
            run = [(code, ch)]
            runs.append(run)
    bfranges = [r for r in runs if len(r) >= 2]
    bfchars = [e for r in runs if len(r) < 2 for e in r]
    cm = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin begincmap",
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange",
    ]
    if bfchars:
        cm.append(b"%d beginbfchar" % len(bfchars))
        for code, ch in bfchars:
            u = ch.encode("utf-16-be").hex().upper()
            cm.append(b"<%04X> <%s>" % (code, u.encode("ascii")))
        cm.append(b"endbfchar")
    if bfranges:
        cm.append(b"%d beginbfrange" % len(bfranges))
        for r in bfranges:
            u0 = r[0][1].encode("utf-16-be").hex().upper()
            cm.append(
                b"<%04X> <%04X> <%s>"
                % (r[0][0], r[-1][0], u0.encode("ascii"))
            )
        cm.append(b"endbfrange")
    cm += [b"endcmap end end"]
    cmap_stream = b"\n".join(cm)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /ABCDEF+Subset "
        b"/Encoding /Identity-H /ToUnicode 6 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream"
        % (len(cmap_stream), cmap_stream),
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# OOXML shared bits
# ---------------------------------------------------------------------------

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>{overrides}</Types>'
)

_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    "{rels}</Relationships>"
)


def _zip_write(parts: dict[str, str | bytes]) -> bytes:
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in parts.items():
            z.writestr(name, data)
    return bio.getvalue()


def _zip_read(payload: bytes, name: str) -> bytes | None:
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            if name in z.namelist():
                return z.read(name)
    except zipfile.BadZipFile:
        return None
    return None


def zip_names(payload: bytes) -> list[str]:
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            return z.namelist()
    except zipfile.BadZipFile:
        return []


# ---------------------------------------------------------------------------
# DOCX
# ---------------------------------------------------------------------------


def docx_extract_text(payload: bytes) -> str | None:
    """Paragraph/run extraction from a real .docx: ``w:p`` → line,
    ``w:t`` → run text, ``w:tab`` → TAB, ``w:br`` → newline."""
    xmlb = _zip_read(payload, "word/document.xml")
    if xmlb is None:
        return None
    root = ET.fromstring(xmlb)
    paras = []
    for p in root.iter(_W + "p"):
        buf = []
        for node in p.iter():
            if node.tag == _W + "t":
                buf.append(node.text or "")
            elif node.tag == _W + "tab":
                buf.append("\t")
            elif node.tag == _W + "br":
                buf.append("\n")
        paras.append("".join(buf))
    return "\n".join(paras)


def docx_from_text(text: str) -> bytes:
    """Serialize text into a minimal valid .docx (one paragraph per line)."""
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_xesc(ln)}</w:t></w:r></w:p>"
        for ln in _canon_newlines(text).split("\n")
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    return _zip_write(
        {
            "[Content_Types].xml": _CONTENT_TYPES.format(
                overrides='<Override PartName="/word/document.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            ),
            "_rels/.rels": _RELS.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
                'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            ),
            "word/document.xml": doc,
        }
    )


# ---------------------------------------------------------------------------
# XLSX — OOXML number formats (src/reader/xlsx_ooxml.rs parity)
# ---------------------------------------------------------------------------

GENERAL, NUMBER, CURRENCY, PERCENTAGE, SCIENTIFIC = (
    "general", "number", "currency", "percentage", "scientific",
)
DATE, TIME, DATETIME, TEXT = "date", "time", "datetime", "text"


def classify_builtin_fmt(fmt_id: int) -> str:
    """Built-in numFmtId → kind (xlsx_ooxml.rs:94-108)."""
    if fmt_id == 0:
        return GENERAL
    if 1 <= fmt_id <= 4 or 37 <= fmt_id <= 40:
        return NUMBER
    if 5 <= fmt_id <= 8 or 41 <= fmt_id <= 44:
        return CURRENCY
    if fmt_id in (9, 10):
        return PERCENTAGE
    if fmt_id == 11:
        return SCIENTIFIC
    if 14 <= fmt_id <= 17:
        return DATE
    if 18 <= fmt_id <= 21 or 45 <= fmt_id <= 48:
        return TIME
    if fmt_id == 22:
        return DATETIME
    if fmt_id == 49:
        return TEXT
    return GENERAL


def _remove_quoted_sections(code: str) -> str:
    out, i, n = [], 0, len(code)
    while i < n:
        ch = code[i]
        if ch == '"':
            j = code.find('"', i + 1)
            i = n if j == -1 else j + 1
        elif ch == "\\":
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def classify_format_code(code: str) -> str:
    """Custom format code → kind (xlsx_ooxml.rs:111-160): date/time
    tokens first ('m' alone with time markers means minutes), then
    percent / scientific / currency / text / number."""
    c = _remove_quoted_sections(code.lower())
    has_date = "y" in c or "d" in c
    has_month = "m" in c
    has_time = "h" in c or "s" in c
    has_ampm = "am/pm" in c or "a/p" in c
    if has_date and has_time:
        return DATETIME
    if has_date:
        return DATE
    if has_time or has_ampm:
        return TIME
    if has_month and "#" not in c and "0" not in c:
        return DATE
    if "%" in c:
        return PERCENTAGE
    if "e+" in c or "e-" in c:
        return SCIENTIFIC
    if any(t in c for t in ("$", "€", "£", "¥", "eur", "usd", "gbp")):
        return CURRENCY
    if "@" in c:
        return TEXT
    if "#" in c or "0" in c:
        return NUMBER
    return GENERAL


def parse_xlsx_numfmts(payload: bytes) -> list[str]:
    """styles.xml → per-cellXf format kind (xlsx_ooxml.rs
    parse_ooxml_metadata): built-ins seeded 0..49, custom numFmts
    classified by their format codes, cellXfs indexed in order."""
    xmlb = _zip_read(payload, "xl/styles.xml")
    if xmlb is None:
        return []
    root = ET.fromstring(xmlb)
    fmts = {i: classify_builtin_fmt(i) for i in range(50)}
    for nf in root.iter(_S + "numFmt"):
        try:
            fmts[int(nf.get("numFmtId", "-1"))] = classify_format_code(
                nf.get("formatCode", "")
            )
        except ValueError:
            continue
    xfs: list[str] = []
    cell_xfs = root.find(_S + "cellXfs")
    if cell_xfs is not None:
        for xf in cell_xfs.iter(_S + "xf"):
            try:
                xfs.append(fmts.get(int(xf.get("numFmtId", "0")), GENERAL))
            except ValueError:
                xfs.append(GENERAL)
    return xfs


def excel_serial_to_iso(serial: float) -> str | None:
    """Excel date serial → ISO string (xlsx_ooxml.rs:460-493), including
    the Lotus leap-year bug: serials past 60 sit one day ahead because
    Excel believes 1900-02-29 existed."""
    import datetime as _dt

    if serial < 0:
        return None
    days = int(serial // 1)
    frac = serial - days
    if days > 60:
        days -= 1
    try:
        date = _dt.date(1899, 12, 31) + _dt.timedelta(days=days)
    except OverflowError:
        return None
    if frac > 0.0001:
        total = round(frac * 86400.0)
        return "%s %02d:%02d:%02d" % (
            date.isoformat(), total // 3600, (total % 3600) // 60, total % 60
        )
    return date.isoformat()


def format_percentage(val: float) -> str:
    pct = val * 100.0
    if abs(pct - round(pct)) < 0.001:
        return f"{round(pct)}%"
    return f"{pct:.1f}%"


def format_currency(val: float, code: str = "$") -> str:
    c = code.lower()
    if "$" in c or "usd" in c:
        sym = "$"
    elif "€" in c or "eur" in c:
        sym = "€"
    elif "£" in c or "gbp" in c:
        sym = "£"
    elif "¥" in c or "jpy" in c or "cny" in c:
        sym = "¥"
    else:
        sym = "$"
    if val < 0:
        return f"-{sym}{abs(val):.2f}"
    return f"{sym}{val:.2f}"


def format_cell_value(raw: str, kind: str) -> str:
    """Type-aware rendering of a numeric cell's stored value
    (xlsx_chunker.rs format_cell_value): dates from serials, percent ×100,
    currency 2dp, plain numbers integer-cleaned."""
    try:
        v = float(raw)
    except (TypeError, ValueError):
        return (raw or "").strip()
    if kind in (DATE, DATETIME, TIME):
        iso = excel_serial_to_iso(v)
        if iso is not None:
            return iso[11:] if kind == TIME and " " in iso else iso
        return raw
    if kind == PERCENTAGE:
        return format_percentage(v)
    if kind == CURRENCY:
        return format_currency(v)
    if v == int(v):
        return str(int(v))
    return raw


# ---------------------------------------------------------------------------
# XLSX
# ---------------------------------------------------------------------------


def _col_index(ref: str) -> int:
    """'A1' → 0, 'B7' → 1, 'AA3' → 26."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letters(idx: int) -> str:
    """0 → 'A', 25 → 'Z', 26 → 'AA' — inverse of :func:`_col_index`."""
    s = ""
    idx += 1
    while idx > 0:
        idx, rem = divmod(idx - 1, 26)
        s = chr(65 + rem) + s
    return s


def _numeric_suffix(part_name: str) -> int:
    """'xl/worksheets/sheet10.xml' → 10; parts without digits sort first."""
    m = re.search(r"(\d+)\.xml$", part_name)
    return int(m.group(1)) if m else -1


def xlsx_extract_rows(
    payload: bytes, formatted: bool = False
) -> list[tuple[str, list[list[str]]]]:
    """Real .xlsx parse: shared-strings table + each worksheet's
    ``sheetData`` → [(sheet_name, rows)] with gap cells filled ''.

    ``formatted`` applies styles.xml number formats to numeric cells
    (xlsx_ooxml.rs parity): date serials render ISO, percentages ×100
    with a %, currency with a symbol and 2dp — the values a user sees
    in Excel rather than the raw stored doubles."""
    _R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    xfs = parse_xlsx_numfmts(payload) if formatted else []
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            names = z.namelist()
            shared: list[str] = []
            if "xl/sharedStrings.xml" in names:
                sroot = ET.fromstring(z.read("xl/sharedStrings.xml"))
                for si in sroot.iter(_S + "si"):
                    shared.append("".join(t.text or "" for t in si.iter(_S + "t")))
            # declared sheet names: workbook.xml sheet[@name,@r:id] → rels Id→Target
            declared: dict[str, str] = {}
            if "xl/workbook.xml" in names and "xl/_rels/workbook.xml.rels" in names:
                rels = {
                    rel.get("Id"): rel.get("Target", "")
                    for rel in ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
                }
                wb = ET.fromstring(z.read("xl/workbook.xml"))
                for sh in wb.iter(_S + "sheet"):
                    target = rels.get(sh.get(_R + "id"), "")
                    declared["xl/" + target.lstrip("/")] = sh.get("name", "")
            # Order sheets by workbook.xml declaration order (the order a
            # user sees in Excel); parts not declared there fall back to
            # numeric-suffix order so sheet10 sorts after sheet2.
            part_names = [
                n for n in names
                if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
            ]
            decl_rank = {p: i for i, p in enumerate(declared)}
            sheets = sorted(
                part_names,
                key=lambda n: (
                    decl_rank.get(n, len(decl_rank)),
                    _numeric_suffix(n),
                    n,
                ),
            )
            out = []
            for sname in sheets:
                root = ET.fromstring(z.read(sname))
                rows: list[list[str]] = []
                for row in root.iter(_S + "row"):
                    r_no = int(row.get("r", len(rows) + 1))
                    while len(rows) < r_no - 1:
                        rows.append([])
                    cells: list[str] = []
                    for c in row.iter(_S + "c"):
                        idx = _col_index(c.get("r", "")) if c.get("r") else len(cells)
                        while len(cells) < idx:
                            cells.append("")
                        t = c.get("t", "n")
                        if t == "s":
                            v = c.find(_S + "v")
                            cells.append(
                                shared[int(v.text)] if v is not None and v.text else ""
                            )
                        elif t == "inlineStr":
                            cells.append(
                                "".join(x.text or "" for x in c.iter(_S + "t"))
                            )
                        else:
                            v = c.find(_S + "v")
                            raw = v.text if v is not None and v.text else ""
                            if raw and xfs and c.get("s") is not None:
                                try:
                                    kind = xfs[int(c.get("s"))]
                                except (ValueError, IndexError):
                                    kind = GENERAL
                                raw = format_cell_value(raw, kind)
                            cells.append(raw)
                    rows.append(cells)
                base = declared.get(sname) or sname.rsplit("/", 1)[-1][:-4]
                out.append((base, rows))
            return out
    except zipfile.BadZipFile:
        return []


def xlsx_extract_text(payload: bytes) -> str | None:
    """Sheet rows → CSV-ish text (cells comma-joined, rows newline-joined,
    sheets separated by a blank line) — the exact shape the sheet-table
    detector (sources/readers.py::sheet_tables) consumes."""
    sheets = xlsx_extract_rows(payload)
    if not sheets:
        return None
    return "\n\n".join("\n".join(",".join(r) for r in rows) for _, rows in sheets)


def xlsx_from_rows(sheets: list[tuple[str, list[list[str]]]]) -> bytes:
    """Serialize sheets of string cells into a minimal valid .xlsx
    (inline strings — no shared-string table needed)."""
    parts: dict[str, str | bytes] = {}
    sheet_decls, rel_decls, overrides = [], [], []
    for i, (name, rows) in enumerate(sheets, start=1):
        rows_xml = []
        for r, cells in enumerate(rows, start=1):
            cs = "".join(
                f'<c r="{_col_letters(j)}{r}" t="inlineStr"><is>'
                f'<t xml:space="preserve">{_xesc(cell)}</t></is></c>'
                for j, cell in enumerate(cells)
            )
            rows_xml.append(f'<row r="{r}">{cs}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
        )
        sheet_decls.append(f'<sheet name="{_xesc(name)}" sheetId="{i}" r:id="rId{i}"/>')
        rel_decls.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
        )
        overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    parts["xl/workbook.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{''.join(sheet_decls)}</sheets></workbook>"
    )
    parts["xl/_rels/workbook.xml.rels"] = _RELS.format(rels="".join(rel_decls))
    parts["[Content_Types].xml"] = _CONTENT_TYPES.format(
        overrides='<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(overrides)
    )
    parts["_rels/.rels"] = _RELS.format(
        rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    )
    return _zip_write(parts)


def xlsx_from_typed_rows(
    sheets: list[tuple[str, list[list[str | tuple[float, int]]]]],
) -> bytes:
    """Valid .xlsx with typed numeric cells: a cell is either a str
    (inline string) or ``(raw_number, numFmtId)`` — the file carries a
    styles.xml whose cellXfs map the ids, so format-aware extraction
    has real metadata to read (fixture generator for the
    xlsx_ooxml.rs-parity tier)."""
    # collect distinct numFmtIds → cellXfs indices (index 0 = General)
    ids: list[int] = [0]
    for _, rows in sheets:
        for row in rows:
            for cell in row:
                if isinstance(cell, tuple) and cell[1] not in ids:
                    ids.append(cell[1])
    xf_index = {fmt_id: i for i, fmt_id in enumerate(ids)}

    str_sheets: list[tuple[str, list[list[str]]]] = []
    cell_attrs: dict[tuple[int, int, int], tuple[float, int]] = {}
    for si, (name, rows) in enumerate(sheets):
        out_rows: list[list[str]] = []
        for r, row in enumerate(rows):
            out_row: list[str] = []
            for j, cell in enumerate(row):
                if isinstance(cell, tuple):
                    cell_attrs[(si, r, j)] = cell
                    out_row.append("")
                else:
                    out_row.append(cell)
            out_rows.append(out_row)
        str_sheets.append((name, out_rows))

    base = xlsx_from_rows(str_sheets)
    # splice numeric cells + styles.xml into the container
    with zipfile.ZipFile(io.BytesIO(base)) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    for si in range(len(sheets)):
        sheet_path = f"xl/worksheets/sheet{si + 1}.xml"
        root = ET.fromstring(parts[sheet_path])
        ET.register_namespace(
            "", "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        )
        for r_el in root.iter(_S + "row"):
            r = int(r_el.get("r")) - 1
            for j, c_el in enumerate(list(r_el)):
                if (si, r, j) in cell_attrs:
                    val, fmt_id = cell_attrs[(si, r, j)]
                    c_el.attrib.pop("t", None)
                    c_el.set("s", str(xf_index[fmt_id]))
                    for child in list(c_el):
                        c_el.remove(child)
                    v = ET.SubElement(c_el, _S + "v")
                    v.text = repr(val) if val != int(val) else str(int(val))
        parts[sheet_path] = ET.tostring(root, xml_declaration=True, encoding="UTF-8")
    xf_xml = "".join(f'<xf numFmtId="{fmt_id}"/>' for fmt_id in ids)
    parts["xl/styles.xml"] = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<cellXfs count="{len(ids)}">{xf_xml}</cellXfs></styleSheet>'
    )
    ct = parts["[Content_Types].xml"].decode()
    parts["[Content_Types].xml"] = ct.replace(
        "</Types>",
        '<Override PartName="/xl/styles.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
        "</Types>",
    )
    return _zip_write(parts)


def xlsx_from_text(text: str) -> bytes:
    """One sheet, one row per line, one cell per row — text round-trips
    bit-exactly through :func:`xlsx_extract_text` (single cells never gain
    commas)."""
    return xlsx_from_rows(
        [("sheet1", [[ln] for ln in _canon_newlines(text).split("\n")])]
    )


# ---------------------------------------------------------------------------
# PPTX
# ---------------------------------------------------------------------------


def pptx_extract_text(payload: bytes) -> str | None:
    """Slide text runs from a real .pptx: ``a:p`` → line, ``a:t`` → run;
    slides concatenate in number order separated by a blank line."""
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            slides = sorted(
                (
                    n for n in z.namelist()
                    if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
                ),
                key=_numeric_suffix,
            )
            if not slides:
                return None
            blocks = []
            for sname in slides:
                root = ET.fromstring(z.read(sname))
                paras = []
                for p in root.iter(_A + "p"):
                    paras.append("".join(t.text or "" for t in p.iter(_A + "t")))
                blocks.append("\n".join(paras))
            return "\n\n".join(blocks)
    except zipfile.BadZipFile:
        return None


def pptx_from_text(text: str) -> bytes:
    """Minimal valid .pptx: one slide, one paragraph per line."""
    paras = "".join(
        f'<a:p><a:r><a:t>{_xesc(ln)}</a:t></a:r></a:p>'
        for ln in _canon_newlines(text).split("\n")
    )
    slide = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">'
        "<p:cSld><p:spTree><p:sp><p:txBody>"
        f"{paras}</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    )
    pres = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<p:sldIdLst><p:sldId id="256" r:id="rId1"/></p:sldIdLst></p:presentation>'
    )
    return _zip_write(
        {
            "[Content_Types].xml": _CONTENT_TYPES.format(
                overrides='<Override PartName="/ppt/presentation.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
                '<Override PartName="/ppt/slides/slide1.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
            ),
            "_rels/.rels": _RELS.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
                'officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
            ),
            "ppt/_rels/presentation.xml.rels": _RELS.format(
                rels='<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
                'officeDocument/2006/relationships/slide" Target="slides/slide1.xml"/>'
            ),
            "ppt/presentation.xml": pres,
            "ppt/slides/slide1.xml": slide,
        }
    )


# ---------------------------------------------------------------------------
# PDF / DOCX — embedded image extraction (the reference's
# role='extracted_image' path: media inside documents become their own
# frames; src/types/frame.rs role field, image ingestion src/clip.rs)
# ---------------------------------------------------------------------------


def pdf_extract_images(payload: bytes) -> list[tuple[str, bytes]]:
    """[(mime, image bytes)] for every /Subtype /Image XObject:

    - /DCTDecode streams ARE complete JPEG files (per spec) — returned
      verbatim, decodable by the repo's baseline codec (sources/jpeg.py)
    - /FlateDecode DeviceRGB/DeviceGray 8-bit rasters are inflated and
      re-wrapped as PNG (sources/image.py) so every extracted image is
      a self-describing payload

    Other filters (JBIG2/JPX/CCITT) are skipped — they need codec
    libraries; the common real-world cases are the two above."""
    out: list[tuple[str, bytes]] = []
    for m in _STREAM_RE.finditer(payload):
        d = m.group(1)
        if b"/Subtype" not in d or b"/Image" not in d:
            continue
        start = m.end()
        end = payload.find(b"endstream", start)
        if end == -1:
            continue
        data = payload[start:end]
        if data.endswith(b"\r\n"):
            data = data[:-2]
        elif data.endswith(b"\n") or data.endswith(b"\r"):
            data = data[:-1]
        if b"/DCTDecode" in d:
            out.append(("image/jpeg", data))
            continue
        if b"/FlateDecode" in d:
            wm = re.search(rb"/Width\s+(\d+)", d)
            hm = re.search(rb"/Height\s+(\d+)", d)
            bm = re.search(rb"/BitsPerComponent\s+(\d+)", d)
            if not (wm and hm) or (bm and bm.group(1) != b"8"):
                continue
            w, h = int(wm.group(1)), int(hm.group(1))
            try:
                raw = zlib.decompress(data)
            except zlib.error:
                continue
            ch = 3 if b"/DeviceRGB" in d else 1
            if len(raw) != w * h * ch:
                continue
            import numpy as np

            from .image import png_encode

            px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
            out.append(("image/png", png_encode(px)))
    return out


def pdf_with_images(text: str, images: list[bytes]) -> bytes:
    """Writer tier: a text PDF plus embedded JPEG XObjects (DCTDecode
    passthrough — the way real PDFs carry photos). Fixture generator
    for the extracted-image path; the images must be JPEG bytes."""
    from .jpeg import jpeg_decode  # validates + reads dims

    base = pdf_from_text(text, compress=False)
    # splice image objects before the xref: renumber is avoided by
    # appending objects with ids beyond the writer's five
    xref_at = base.find(b"xref\n")
    body = bytearray(base[:xref_at])
    for k, img in enumerate(images):
        dec = jpeg_decode(img)
        h, w = dec.shape[:2]
        ch = 1 if dec.ndim == 2 else dec.shape[2]
        cs = b"/DeviceGray" if ch == 1 else b"/DeviceRGB"
        obj = (
            b"%d 0 obj\n<< /Type /XObject /Subtype /Image /Width %d "
            b"/Height %d /ColorSpace %s /BitsPerComponent 8 "
            b"/Filter /DCTDecode /Length %d >>\nstream\n"
            % (6 + k, w, h, cs, len(img))
        ) + img + b"\nendstream\nendobj\n"
        body += obj
    body += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n0\n%%%%EOF\n"
        % (6 + len(images))
    )
    return bytes(body)


def docx_extract_images(payload: bytes) -> list[tuple[str, bytes]]:
    """[(mime, bytes)] for every word/media/* member of a DOCX
    container (jpeg/png/gif/bmp by extension)."""
    mimes = {"jpg": "image/jpeg", "jpeg": "image/jpeg", "png": "image/png",
             "gif": "image/gif", "bmp": "image/bmp"}
    out: list[tuple[str, bytes]] = []
    try:
        with zipfile.ZipFile(io.BytesIO(payload)) as z:
            for name in sorted(z.namelist()):
                if name.startswith("word/media/"):
                    ext = name.rsplit(".", 1)[-1].lower()
                    mime = mimes.get(ext)
                    if mime:
                        out.append((mime, z.read(name)))
    except zipfile.BadZipFile:
        return []
    return out
