"""PDF positional layout extraction and table detection.

The flowed-text tier (sources/binary.py pdf_extract_text) evaluates
text-show operators but discards geometry. This module keeps it: a
second content-stream evaluator tracks the text matrix (``Tm``/``Td``/
``TD``/``T*``/``TL``) and font size (``Tf``) to emit *text boxes*
``(text, x, y, width, height, font_size, page)``, plus a path-operator
pass (``m``/``l``/``re``/``h``) that emits *line segments* — the raw
layout data table detection needs.

Detection mirrors the reference's two complementary strategies
(src/table/pdf_extractor.rs:1-117):

- **Lattice** (ruled tables): cluster horizontal/vertical line
  coordinates into grid boundaries, assign text boxes to grid cells by
  center containment (pdf_extractor.rs:154-333).
- **Stream** (whitespace-aligned): cluster text boxes into rows by
  y-position, detect column boundaries from x-positions that repeat
  across rows, assign by center containment
  (pdf_extractor.rs:339-530).
- **Line-based fallback** for linearized text: label/value pair
  heuristics over flowed lines (pdf_extractor.rs:608-1017).

Multi-page continuation (src/table/multi_page.rs:23-251): tables on
consecutive pages with the same column count and ≥0.8 header
similarity merge into one logical table, the repeated header dropped.

The matrix state is evaluated in full (ISO 32000-1 §8.3.4, §9.4.2):
the CTM composes through ``cm`` with ``q``/``Q`` save-restore, ``Td``
pre-composes a translation onto the text LINE matrix, show operators
advance the TEXT matrix, and box origins/extents are the device-space
images of the composed transform — so scaled and rotated text lands
where it actually renders. The one simplification vs the reference's
pdfium tier: glyph metrics. Width is estimated as ``0.5 em ×
n_chars`` (average Helvetica advance); column *lefts* come from
positioning operators and are exact, only right edges are
approximate, and the boundary detector is built to tolerate that.

All functions are bytes→rows kernels with no Spark state: they run
inside Arrow-batched ``mapInPandas`` (sources/readers.py), one
executor decoding its own partitions — embarrassingly parallel at
100 TB like every other codec in sources/.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

from .binary import (
    _OBJ_RE,
    _expand_object_streams,
    _object_stream_bytes,
    _parse_pdf_string,
    _pdf_escape,
    _pdf_font_cmaps,
    _skip_inline_image,
    ToUnicodeCMap,
)

# Average glyph advance in ems (Helvetica-ish); see module docstring.
_WIDTH_EM = 0.5
# Minimum segment length for grid detection (pdf_extractor.rs:21).
_MIN_LINE_LENGTH = 5.0
# Minimum grid cells for a valid lattice table (pdf_extractor.rs:24).
_MIN_GRID_CELLS = 4


@dataclass
class TextBox:
    """A positioned text run (src/table/layout.rs:10-25). ``vdir``
    records the baseline direction: 0 = horizontal, +1 = advance along
    +y (page rotated 90° CCW), −1 = along −y (90° CW) — what the
    landscape-detection pass keys on."""

    text: str
    x: float
    y: float
    width: float
    height: float
    font_size: float
    page: int
    vdir: int = 0

    @property
    def right(self) -> float:
        return self.x + self.width

    @property
    def center_x(self) -> float:
        return self.x + self.width / 2.0

    @property
    def center_y(self) -> float:
        return self.y + self.height / 2.0


@dataclass
class LineSegment:
    """A path segment for lattice detection (src/table/layout.rs:64-75)."""

    x1: float
    y1: float
    x2: float
    y2: float
    page: int

    def is_horizontal(self, tol: float = 2.0) -> bool:
        return abs(self.y1 - self.y2) <= tol

    def is_vertical(self, tol: float = 2.0) -> bool:
        return abs(self.x1 - self.x2) <= tol

    def length(self) -> float:
        return ((self.x2 - self.x1) ** 2 + (self.y2 - self.y1) ** 2) ** 0.5

    @property
    def y_coord(self) -> float:
        return (self.y1 + self.y2) / 2.0

    @property
    def x_coord(self) -> float:
        return (self.x1 + self.x2) / 2.0


# ---------------------------------------------------------------------------
# Page → content-stream resolution
# ---------------------------------------------------------------------------

_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _decode_content(objs: dict[int, bytes], num: int) -> bytes:
    body = objs.get(num)
    if body is None:
        return b""
    data = _object_stream_bytes(body)
    return data or b""


def _page_streams(payload: bytes) -> list[bytes]:
    """Ordered per-page decoded content streams. Pages resolve through
    the /Pages tree's /Kids order (ISO 32000-1 §7.7.3); each page's
    /Contents (single ref or array) concatenates. Falls back to
    BT-containing streams in file order (one page each) for PDFs
    without a parseable page tree."""
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    objs.update(_expand_object_streams(objs))

    # Walk the page tree: roots are /Pages nodes that no other node
    # claims as a kid; order within a node is the Kids array order.
    page_nodes: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen:
            return
        seen.add(num)
        body = objs.get(num, b"")
        if re.search(rb"/Type\s*/Pages\b", body):
            km = _KIDS_RE.search(body)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), seen)
        elif re.search(rb"/Type\s*/Page\b", body):
            page_nodes.append(num)

    kid_nums = {
        int(rm.group(1))
        for body in objs.values()
        for km in _KIDS_RE.finditer(body)
        for rm in _REF_RE.finditer(km.group(1))
    }
    seen: set[int] = set()
    for num, body in sorted(objs.items()):
        if re.search(rb"/Type\s*/Pages\b", body) and num not in kid_nums:
            walk(num, seen)

    pages: list[bytes] = []
    for num in page_nodes:
        body = objs[num]
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if cm:
            pages.append(_decode_content(objs, int(cm.group(1))))
            continue
        ca = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
        if ca:
            pages.append(
                b"\n".join(
                    _decode_content(objs, int(rm.group(1)))
                    for rm in _REF_RE.finditer(ca.group(1))
                )
            )
    if pages:
        return pages

    # Fallback: every BT-carrying stream is one page, file order.
    out = []
    for m in re.finditer(rb"stream\r?\n", payload):
        end = payload.find(b"endstream", m.end())
        if end == -1:
            continue
        data = payload[m.end() : end].rstrip(b"\r\n")
        head = payload[max(0, m.start() - 400) : m.start()]
        if b"/FlateDecode" in head:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" in data:
            out.append(data)
    return out


# ---------------------------------------------------------------------------
# Geometry-tracking content-stream evaluator
# ---------------------------------------------------------------------------

_NUM_RE = re.compile(rb"[-+]?(?:\d+\.?\d*|\.\d+)")
_DELIM = (
    b" ", b"\t", b"\r", b"\n", b"(", b")", b"<", b">", b"[", b"]", b"/", b"%",
)


def _text_width(text: str, size: float) -> float:
    return _WIDTH_EM * size * len(text)




_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1, m2):
    """PDF matrix composition (row-vector convention, ISO 32000-1
    §8.3.4): applying m1 then m2 — [x y 1]·m1·m2."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _translate(tx: float, ty: float):
    return (1.0, 0.0, 0.0, 1.0, tx, ty)


def _apply(m, x: float, y: float) -> tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


def _content_stream_boxes(
    data: bytes,
    fonts: dict[bytes, ToUnicodeCMap] | None,
    page: int,
) -> tuple[list[TextBox], list[LineSegment]]:
    """One pass over a decoded content stream: evaluate text operators
    with FULL matrix state — the CTM (``cm`` composition, ``q``/``Q``
    save-restore) and the text/line matrices (``Tm``/``Td``/``TD``/
    ``T*`` per ISO 32000-1 §9.4.2: Td pre-composes a translation onto
    the LINE matrix; show ops advance the TEXT matrix) — into
    TextBoxes, and path construction operators (CTM-transformed) into
    LineSegments. Rotated/scaled text therefore lands at its true
    device-space origin; box width/height are the device-space lengths
    of the advance and size vectors. Font decode matches the flowed
    tier (latin-1 simple fonts, /ToUnicode CMaps after Tf)."""
    fonts = fonts or {}
    boxes: list[TextBox] = []
    segs: list[LineSegment] = []

    size = 12.0
    leading = 0.0
    char_sp = 0.0  # Tc
    word_sp = 0.0  # Tw
    hscale = 1.0  # Tz / 100
    ctm = _IDENTITY
    gs_stack: list[tuple] = []  # q/Q: full graphics+text state
    tm = tlm = _IDENTITY  # text matrix / line matrix
    cmap: ToUnicodeCMap | None = None
    last_name = b""
    nums: list[float] = []
    strings: list[bytes] = []
    array: list[object] | None = None  # TJ operand capture
    path_x = path_y = start_x = start_y = 0.0

    def emit(raw: bytes) -> None:
        nonlocal tm
        text = cmap.decode(raw) if cmap is not None else raw.decode("latin-1")
        # advance in text space (§9.4.4): glyph widths + char spacing
        # per glyph + word spacing per ASCII space, all × Tz
        w = (
            _text_width(text, size)
            + char_sp * len(text)
            + word_sp * text.count(" ")
        ) * hscale
        if text.strip():
            m = _mat_mul(tm, ctm)
            ox, oy = m[4], m[5]  # device-space baseline origin
            # device-space lengths of the advance (along the baseline)
            # and the font-size vector (perpendicular)
            dw = w * (m[0] ** 2 + m[1] ** 2) ** 0.5
            dh = size * (m[2] ** 2 + m[3] ** 2) ** 0.5
            vdir = (
                0
                if abs(m[0]) >= abs(m[1])
                else (1 if m[1] > 0 else -1)
            )
            boxes.append(
                TextBox(text, ox, oy, dw, dh, size, page, vdir)
            )
        tm = _mat_mul(_translate(w, 0.0), tm)

    def seg(x1: float, y1: float, x2: float, y2: float) -> None:
        (x1, y1), (x2, y2) = _apply(ctm, x1, y1), _apply(ctm, x2, y2)
        s = LineSegment(x1, y1, x2, y2, page)
        if s.length() > _MIN_LINE_LENGTH:
            segs.append(s)

    i, n = 0, len(data)
    while i < n:
        c = data[i : i + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        elif c == b"(":
            s, i = _parse_pdf_string(data, i)
            if array is not None:
                array.append(s)
            else:
                strings.append(s)
        elif c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i)
            if j == -1:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            b_ = bytes.fromhex(hx.decode("ascii"))
            if array is not None:
                array.append(b_)
            else:
                strings.append(b_)
            i = j + 1
        elif c == b"<":  # << dict — skip to matching >>
            i += 2
        elif c == b"[":
            array = []
            i += 1
        elif c == b"]":
            i += 1
        elif c == b"/":
            j = i + 1
            while j < n and data[j : j + 1] not in _DELIM:
                j += 1
            last_name = data[i + 1 : j]
            i = j
        elif c == b"%":
            j = data.find(b"\n", i)
            i = n if j == -1 else j + 1
        elif c.isdigit() or c in (b"-", b"+", b"."):
            m = _NUM_RE.match(data, i)
            if m is None:
                i += 1
                continue
            v = float(m.group())
            if array is not None:
                array.append(v)
            else:
                nums.append(v)
            i = m.end()
        else:
            j = i
            while j < n and data[j : j + 1] not in _DELIM:
                j += 1
            op = data[i:j] or c
            if not data[i:j]:
                j = i + 1
            if op == b"BI":
                # inline image (§8.9.7): raw sample data between ID and
                # EI would tokenize as garbage operators — skip past it
                i = _skip_inline_image(data, j)
                nums = []
                strings = []
                array = None
                continue
            if op == b"Tf":
                if nums:
                    size = nums[-1]
                cmap = fonts.get(last_name)
            elif op == b"TL":
                if nums:
                    leading = nums[-1]
            elif op == b"Tc":
                if nums:
                    char_sp = nums[-1]
            elif op == b"Tw":
                if nums:
                    word_sp = nums[-1]
            elif op == b"Tz":
                if nums:
                    hscale = nums[-1] / 100.0
            elif op == b"cm":
                if len(nums) >= 6:
                    ctm = _mat_mul(tuple(nums[-6:]), ctm)
            elif op == b"q":
                gs_stack.append(
                    (ctm, size, leading, cmap, char_sp, word_sp, hscale)
                )
            elif op == b"Q":
                if gs_stack:
                    (ctm, size, leading, cmap, char_sp, word_sp,
                     hscale) = gs_stack.pop()
            elif op == b"Tm":
                if len(nums) >= 6:
                    tm = tlm = tuple(nums[-6:])
            elif op == b"Td":
                if len(nums) >= 2:
                    tm = tlm = _mat_mul(
                        _translate(nums[-2], nums[-1]), tlm
                    )
            elif op == b"TD":
                if len(nums) >= 2:
                    leading = -nums[-1]
                    tm = tlm = _mat_mul(
                        _translate(nums[-2], nums[-1]), tlm
                    )
            elif op == b"T*":
                tm = tlm = _mat_mul(_translate(0.0, -leading), tlm)
            elif op == b"BT":
                tm = tlm = _IDENTITY
            elif op == b"Tj":
                for s_ in strings:
                    emit(s_)
            elif op in (b"'", b'"'):
                if op == b'"' and len(nums) >= 2:
                    # aw ac string " — sets word then char spacing
                    word_sp, char_sp = nums[-2], nums[-1]
                tm = tlm = _mat_mul(_translate(0.0, -leading), tlm)
                for s_ in strings:
                    emit(s_)
            elif op == b"TJ":
                for el in array or []:
                    if isinstance(el, bytes):
                        emit(el)
                    else:  # kerning adjustment, thousandths of an em
                        tm = _mat_mul(
                            _translate(
                                -float(el) / 1000.0 * size * hscale, 0.0
                            ),
                            tm,
                        )
                array = None
            elif op == b"m":
                if len(nums) >= 2:
                    path_x, path_y = nums[-2], nums[-1]
                    start_x, start_y = path_x, path_y
            elif op == b"l":
                if len(nums) >= 2:
                    seg(path_x, path_y, nums[-2], nums[-1])
                    path_x, path_y = nums[-2], nums[-1]
            elif op == b"re":
                if len(nums) >= 4:
                    x, y, w, h = nums[-4:]
                    seg(x, y, x + w, y)
                    seg(x + w, y, x + w, y + h)
                    seg(x + w, y + h, x, y + h)
                    seg(x, y + h, x, y)
            elif op == b"h":
                seg(path_x, path_y, start_x, start_y)
                path_x, path_y = start_x, start_y
            nums = []
            strings = []
            if op != b"TJ":
                array = None
            i = j
    return boxes, segs


def ordered_text_streams(payload: bytes) -> list[bytes] | None:
    """Decoded content streams in READING order: the page tree's
    /Kids-order streams first, then any other BT-carrying streams
    (Form XObjects and the like, drawn via ``Do``) in object order so
    no text is lost. Returns None when the PDF has no parseable page
    tree — callers fall back to raw file-order scanning."""
    objs: dict[int, bytes] = {
        int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(payload)
    }
    objs.update(_expand_object_streams(objs))

    page_nodes: list[int] = []

    def walk(num: int, seen: set[int]) -> None:
        if num in seen:
            return
        seen.add(num)
        body = objs.get(num, b"")
        if re.search(rb"/Type\s*/Pages\b", body):
            km = _KIDS_RE.search(body)
            if km:
                for rm in _REF_RE.finditer(km.group(1)):
                    walk(int(rm.group(1)), seen)
        elif re.search(rb"/Type\s*/Page\b", body):
            page_nodes.append(num)

    kid_nums = {
        int(rm.group(1))
        for body in objs.values()
        for km in _KIDS_RE.finditer(body)
        for rm in _REF_RE.finditer(km.group(1))
    }
    seen: set[int] = set()
    for num, body in sorted(objs.items()):
        if re.search(rb"/Type\s*/Pages\b", body) and num not in kid_nums:
            walk(num, seen)
    if not page_nodes:
        return None

    used: set[int] = set()
    out: list[bytes] = []
    for num in page_nodes:
        body = objs[num]
        refs: list[int] = []
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if cm:
            refs = [int(cm.group(1))]
        else:
            ca = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
            if ca:
                refs = [int(rm.group(1)) for rm in _REF_RE.finditer(ca.group(1))]
        for r in refs:
            used.add(r)
            out.append(_decode_content(objs, r))
    for num in sorted(objs):
        if num in used:
            continue
        data = _object_stream_bytes(objs[num])
        if data and b"BT" in data:
            out.append(data)
    return out


def pdf_layout(payload: bytes) -> list[dict]:
    """Per-page layout: ``[{page, boxes, lines}]`` — the PageLayout
    analogue (src/table/layout.rs:111-122)."""
    fonts = _pdf_font_cmaps(payload)
    out = []
    for pno, stream in enumerate(_page_streams(payload), start=1):
        boxes, segs = _content_stream_boxes(stream, fonts, pno)
        out.append({"page": pno, "boxes": boxes, "lines": segs})
    return out


# ---------------------------------------------------------------------------
# Clustering primitives (src/table/layout.rs:484-535)
# ---------------------------------------------------------------------------


def cluster_values(values: list[float], threshold: float) -> list[float]:
    """Single-link 1-D clustering of sorted values; returns centroids."""
    if not values:
        return []
    vals = sorted(values)
    clusters: list[list[float]] = [[vals[0]]]
    for v in vals[1:]:
        if v - clusters[-1][-1] <= threshold:
            clusters[-1].append(v)
        else:
            clusters.append([v])
    return [sum(c) / len(c) for c in clusters]


def _cluster_rows(boxes: list[TextBox], threshold: float) -> list[list[TextBox]]:
    """Group boxes into visual rows by y (descending = top to bottom),
    each row sorted left-to-right (pdf_extractor.rs:382-413)."""
    if not boxes:
        return []
    ordered = sorted(boxes, key=lambda b: -b.y)
    rows: list[list[TextBox]] = [[ordered[0]]]
    cur_y = ordered[0].y
    for b in ordered[1:]:
        if abs(cur_y - b.y) <= threshold:
            rows[-1].append(b)
        else:
            rows[-1].sort(key=lambda t: t.x)
            rows.append([b])
            cur_y = b.y
    rows[-1].sort(key=lambda t: t.x)
    return rows


def _column_boundaries(
    rows: list[list[TextBox]], threshold: float
) -> list[float]:
    """Candidate boundaries = clustered LEFT edges that recur in ≥ half
    the rows, closed with the rightmost right edge so the last column
    has an end (pdf_extractor.rs:416-458 clusters lefts AND rights —
    pdfium gives it true glyph bounds; our widths are 0.5-em estimates,
    so rights would seed phantom boundaries mid-column. Lefts come from
    positioning operators and are exact, which is what column
    alignment actually means in a generated PDF)."""
    xs: list[float] = []
    for row in rows:
        for b in row:
            xs.append(b.x)
    cand = cluster_values(xs, threshold)
    min_occ = max(1, len(rows) // 2)
    kept = [
        c
        for c in cand
        if sum(
            1
            for row in rows
            if any(abs(b.x - c) <= threshold for b in row)
        )
        >= min_occ
    ]
    if not kept:
        return kept
    hi = max(b.right for row in rows for b in row)
    kept.append(max(hi, kept[-1] + threshold))
    return kept


# ---------------------------------------------------------------------------
# Table assembly
# ---------------------------------------------------------------------------


def _drop_empty_columns(rows: list[list[str]]) -> list[list[str]]:
    """Boundary detection over lefts+rights creates gap columns between
    a column's right-edge cluster and the next column's left edge; they
    are empty in every row and carry no data — normalize them away."""
    if not rows:
        return rows
    n = max(len(r) for r in rows)
    keep = [
        j for j in range(n) if any(j < len(r) and r[j] for r in rows)
    ]
    return [[r[j] if j < len(r) else "" for j in keep] for r in rows]


def _header_split(
    rows: list[list[str]],
) -> tuple[list[str], list[list[str]]]:
    """First row promotes to header when more than half its cells are
    non-empty (pdf_extractor.rs:498-513)."""
    if not rows:
        return [], []
    n_cols = len(rows[0])
    non_empty = sum(1 for c in rows[0] if c)
    if non_empty > n_cols / 2:
        return rows[0], rows[1:]
    return [], rows


def _stream_quality(rows: list[list[str]]) -> float:
    """Confidence heuristic (pdf_extractor.rs:533-588): penalties for
    ragged non-empty counts, empty-cell ratio, and few rows; stream
    detection starts 0.1 below lattice."""
    if not rows:
        return 0.0
    counts = [sum(1 for c in r if c) for r in rows]
    avg = sum(counts) / len(counts)
    var = sum((c - avg) ** 2 for c in counts) / len(counts)
    score = 1.0 - 0.1
    if var > 1.0:
        score -= 0.2 * min(var, 2.0)
    total = sum(len(r) for r in rows)
    empty = sum(1 for r in rows for c in r if not c)
    ratio = empty / max(total, 1)
    if ratio > 0.3:
        score -= 0.2 * ratio
    if len(rows) < 4:
        score -= 0.1
    return max(0.0, min(1.0, score))


def _detect_stream_tables(
    layout: dict,
    row_threshold: float,
    col_threshold: float,
    min_rows: int,
    min_cols: int,
) -> list[dict]:
    """Stream mode: one table per page from aligned text
    (pdf_extractor.rs:339-379)."""
    boxes = layout["boxes"]
    if not boxes:
        return []
    rows = _cluster_rows(boxes, row_threshold)
    if len(rows) < min_rows:
        return []
    bounds = _column_boundaries(rows, col_threshold)
    if len(bounds) < min_cols + 1:
        return []
    grid: list[list[str]] = []
    for row in rows:
        cells = [""] * (len(bounds) - 1)
        for b in row:
            cx = b.center_x
            for j in range(len(bounds) - 1):
                if bounds[j] <= cx <= bounds[j + 1]:
                    cells[j] = (cells[j] + " " + b.text.strip()).strip()
                    break
        grid.append(cells)
    grid = _drop_empty_columns(grid)
    if not grid or len(grid[0]) < min_cols:
        return []
    headers, data = _header_split(grid)
    if len(data) + (1 if headers else 0) < min_rows:
        return []
    return [
        {
            "page_start": layout["page"],
            "page_end": layout["page"],
            "mode": "stream",
            "headers": headers,
            "rows": data,
            "n_rows": len(data),
            "n_cols": len(grid[0]),
            "quality": _stream_quality(grid),
        }
    ]


def _detect_lattice_tables(
    layout: dict,
    row_threshold: float,
    col_threshold: float,
    min_rows: int,
    min_cols: int,
) -> list[dict]:
    """Lattice mode: grid from clustered ruling lines, text assigned to
    cells by center containment (pdf_extractor.rs:154-272)."""
    lines = layout["lines"]
    h = [
        s.y_coord
        for s in lines
        if s.is_horizontal(row_threshold) and s.length() >= 20.0
    ]
    v = [
        s.x_coord
        for s in lines
        if s.is_vertical(col_threshold) and s.length() >= 20.0
    ]
    hc = sorted(cluster_values(h, row_threshold), reverse=True)
    vc = sorted(cluster_values(v, col_threshold))
    if len(hc) < 2 or len(vc) < 2:
        return []
    n_rows, n_cols = len(hc) - 1, len(vc) - 1
    if n_rows * n_cols < _MIN_GRID_CELLS:
        return []
    grid = [["" for _ in range(n_cols)] for _ in range(n_rows)]
    for b in layout["boxes"]:
        cx, cy = b.center_x, b.center_y
        for r in range(n_rows):
            if not (hc[r + 1] <= cy <= hc[r]):
                continue
            for c in range(n_cols):
                if vc[c] <= cx <= vc[c + 1]:
                    grid[r][c] = (grid[r][c] + " " + b.text.strip()).strip()
                    break
            break
    headers, data = _header_split(grid)
    if len(data) + (1 if headers else 0) < min_rows or n_cols < min_cols:
        return []
    return [
        {
            "page_start": layout["page"],
            "page_end": layout["page"],
            "mode": "lattice",
            "headers": headers,
            "rows": data,
            "n_rows": len(data),
            "n_cols": n_cols,
            "quality": 0.9,  # lattice is the most reliable tier
        }
    ]


# ---------------------------------------------------------------------------
# Line-based fallback (pdf_extractor.rs:608-1017)
# ---------------------------------------------------------------------------

_CURRENCY_RE = re.compile(r"^\$?[\d,]+\.?\d*$")


def _is_value(line: str) -> bool:
    if _CURRENCY_RE.match(line) or "$" in line:
        return True
    try:
        float(line)
        return True
    except ValueError:
        return False


def _line_based_tables(text: str, min_rows: int) -> list[dict]:
    """Label/value pair fallback for linearized extraction where every
    cell lands on its own line: alternating non-numeric label then
    numeric/currency value rows become a 2-column table."""
    lines = [ln.strip() for ln in text.splitlines() if ln.strip()]
    pairs: list[list[str]] = []
    i = 0
    while i + 1 < len(lines):
        if not _is_value(lines[i]) and _is_value(lines[i + 1]):
            pairs.append([lines[i], lines[i + 1]])
            i += 2
        else:
            i += 1
    if len(pairs) < max(3, min_rows):
        return []
    return [
        {
            "page_start": 1,
            "page_end": 1,
            "mode": "lines",
            "headers": ["Label", "Value"],
            "rows": pairs,
            "n_rows": len(pairs),
            "n_cols": 2,
            "quality": 0.6,
        }
    ]


# ---------------------------------------------------------------------------
# Multi-page continuation (src/table/multi_page.rs:23-251)
# ---------------------------------------------------------------------------


def _header_similarity(h1: list[str], h2: list[str]) -> float:
    """Exact match = 1, one-contains-other = 0.5, averaged; 0 when the
    counts differ (multi_page.rs:155-187)."""
    if not h1 or not h2 or len(h1) != len(h2):
        return 0.0
    n1 = [s.lower().strip() for s in h1]
    n2 = [s.lower().strip() for s in h2]
    score = 0.0
    for a, b in zip(n1, n2):
        if a == b:
            score += 1.0
        elif a and b and (a in b or b in a):
            score += 0.5
    return score / len(h1)


def merge_multi_page_tables(
    tables: list[dict], similarity_threshold: float = 0.8
) -> list[dict]:
    """Merge continuations: consecutive pages, equal column counts, and
    (when both carry headers) ≥threshold similarity — the repeated
    header is already split off into ``headers`` so rows concatenate
    directly (multi_page.rs:189-251)."""
    if len(tables) < 2:
        return tables
    ordered = sorted(tables, key=lambda t: (t["page_start"], t["page_end"]))
    merged: list[dict] = []
    for t in ordered:
        if merged:
            prev = merged[-1]
            gap = t["page_start"] - prev["page_end"]
            sim = _header_similarity(prev["headers"], t["headers"])
            both_headerless = not prev["headers"] and not t["headers"]
            if (
                gap == 1
                and t["n_cols"] == prev["n_cols"]
                and (sim >= similarity_threshold or both_headerless)
            ):
                prev["page_end"] = t["page_end"]
                prev["rows"] = prev["rows"] + t["rows"]
                prev["n_rows"] = len(prev["rows"])
                prev["quality"] = max(
                    0.0, (prev["quality"] + t["quality"]) / 2 - 0.05
                )
                continue
        merged.append(dict(t))
    return merged


def _unrotate_layout(lay: dict, ccw: bool) -> dict:
    """Undo a landscape rotation so rows again vary in y and columns
    in x: for content drawn 90° CCW (``0 1 -1 0 cm``; baselines along
    +y) map (x, y) → (y, −x); for 90° CW map (x, y) → (−y, x). Box
    width is the baseline-advance LENGTH, which after un-rotation runs
    along the new x axis, so it carries over unchanged."""

    def pt(x: float, y: float) -> tuple[float, float]:
        return (y, -x) if ccw else (-y, x)

    boxes = []
    for b in lay["boxes"]:
        x, y = pt(b.x, b.y)
        boxes.append(
            TextBox(b.text, x, y, b.width, b.height, b.font_size, b.page)
        )
    lines = []
    for s in lay["lines"]:
        (x1, y1), (x2, y2) = pt(s.x1, s.y1), pt(s.x2, s.y2)
        lines.append(LineSegment(x1, y1, x2, y2, s.page))
    return {"page": lay["page"], "boxes": boxes, "lines": lines}


def _normalize_orientation(lay: dict) -> dict:
    """When the majority of a page's text advances vertically, the
    page is landscape-rotated: un-rotate the layout (direction chosen
    by the dominant baseline sign) so the detectors see portrait
    geometry instead of finding a transposed table."""
    boxes = lay["boxes"]
    if not boxes:
        return lay
    up = sum(1 for b in boxes if b.vdir == 1)
    down = sum(1 for b in boxes if b.vdir == -1)
    horiz = len(boxes) - up - down
    if up + down <= horiz:
        return lay
    return _unrotate_layout(lay, ccw=up >= down)


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


def pdf_extract_tables(
    payload: bytes,
    row_threshold: float = 4.0,
    col_threshold: float = 10.0,
    min_rows: int = 2,
    min_cols: int = 2,
    merge: bool = True,
    mode: str = "auto",
    max_pages: int = 0,
    min_quality: float = 0.0,
) -> list[dict]:
    """Extract structured tables from PDF bytes: lattice first, stream
    for pages without a lattice table, line-based fallback when neither
    fires, then multi-page merge (pdf_extractor.rs:35-117). The
    TableExtractionOptions surface (types.rs:270-390): ``mode`` is
    'auto' | 'lattice' | 'stream' (LatticeOnly/StreamOnly),
    ``max_pages`` truncates layout extraction (0 = all), and
    ``min_quality`` drops tables scoring below it
    (passes_quality_filter, pdf_extractor.rs:120-137). Returns
    ``[{page_start, page_end, mode, headers, rows, n_rows, n_cols,
    quality}]`` in page order."""
    layouts = pdf_layout(payload)
    if max_pages > 0:
        layouts = layouts[:max_pages]
    tables: list[dict] = []
    for lay in layouts:
        lay = _normalize_orientation(lay)
        found = []
        if mode in ("auto", "lattice"):
            found = _detect_lattice_tables(
                lay, row_threshold, col_threshold, min_rows, min_cols
            )
        if not found and mode in ("auto", "stream"):
            found = _detect_stream_tables(
                lay, row_threshold, col_threshold, min_rows, min_cols
            )
        tables.extend(found)
    if not tables and mode != "lattice":
        from .binary import pdf_extract_text

        tables = _line_based_tables(pdf_extract_text(payload), min_rows)
    if merge:
        tables = merge_multi_page_tables(tables)
    tables = [t for t in tables if t["quality"] >= min_quality]
    tables.sort(key=lambda t: (t["page_start"], t["page_end"]))
    return tables


def find_continuation_candidates(
    tables: list[dict], similarity_threshold: float = 0.8
) -> list[tuple[int, int, float]]:
    """Non-destructive continuation report (multi_page.rs:267-286):
    (i, j, header_similarity) for table pairs on consecutive pages with
    equal column counts, sorted by similarity descending."""
    out = []
    for i, a in enumerate(tables):
        for j in range(i + 1, len(tables)):
            b = tables[j]
            if (
                b["page_start"] - a["page_end"] == 1
                and a["n_cols"] == b["n_cols"]
            ):
                sim = _header_similarity(a["headers"], b["headers"])
                if sim >= similarity_threshold * 0.8 or (
                    not a["headers"] and not b["headers"]
                ):
                    out.append((i, j, sim))
    return sorted(out, key=lambda t: -t[2])


def tables_as_sheet_text(tables: list[dict]) -> str:
    """Render extracted tables in the sheet-text shape (comma-joined
    rows, blank line between tables) that the XLSX tier's
    sheet_tables/sheet_chunks consume — so structural chunking treats a
    PDF table exactly like a spreadsheet one. Cells containing commas
    are surfaced with the comma replaced by ';' (the sheet contract is
    a separator-based line format)."""
    blocks = []
    for t in tables:
        rows = ([t["headers"]] if t["headers"] else []) + t["rows"]
        blocks.append(
            "\n".join(
                ",".join(c.replace(",", ";") for c in row) for row in rows
            )
        )
    return "\n\n".join(blocks)


# ---------------------------------------------------------------------------
# Positional table writer (fixture generator + blob-sink tier)
# ---------------------------------------------------------------------------


def pdf_from_table(
    headers: list[str],
    rows: list[list[str]],
    col_x: tuple[float, ...] = (72.0, 220.0, 360.0),
    size: float = 12.0,
    leading: float = 18.0,
    y0: float = 720.0,
    rows_per_page: int | None = None,
    ruled: bool = False,
    compress: bool = True,
) -> bytes:
    """Write a table as a REAL multi-page PDF with genuinely positioned
    cells: every cell is shown at its own ``Tm`` coordinate (no
    delimiters anywhere — extraction must reconstruct the grid from
    geometry alone). The header repeats at the top of every page, the
    way real documents print tables — which is exactly what the
    multi-page merge must detect and undo. ``ruled=True`` additionally
    strokes the full grid (``m``/``l`` paths) so lattice detection has
    real lines to find."""
    pages: list[list[list[str]]] = []
    if rows_per_page is None or rows_per_page <= 0:
        pages = [rows]
    else:
        for i in range(0, max(len(rows), 1), rows_per_page):
            pages.append(rows[i : i + rows_per_page])
    if not pages:
        pages = [[]]

    contents: list[bytes] = []
    for page_rows in pages:
        ops = []
        all_rows = ([headers] if headers else []) + page_rows
        if ruled and all_rows:
            right = col_x[-1] + 120.0
            ys = [y0 + size + 2.0] + [
                y0 - (r + 1) * leading + size - 2.0
                for r in range(len(all_rows))
            ]
            xs = [col_x[0] - 4.0] + [x - 4.0 for x in col_x[1:]] + [right]
            for y in ys:
                ops.append(b"%.1f %.1f m %.1f %.1f l S" % (xs[0], y, xs[-1], y))
            for x in xs:
                ops.append(
                    b"%.1f %.1f m %.1f %.1f l S" % (x, ys[-1], x, ys[0])
                )
        ops.append(b"BT")
        ops.append(b"/F1 %d Tf" % int(size))
        for r, row in enumerate(all_rows):
            y = y0 - r * leading
            for cell, x in zip(row, col_x):
                if cell == "":
                    continue
                ops.append(
                    b"1 0 0 1 %.1f %.1f Tm (%s) Tj"
                    % (x, y, _pdf_escape(cell))
                )
        ops.append(b"ET")
        contents.append(b"\n".join(ops))

    return _assemble_pdf(contents, compress=compress)


def _assemble_pdf(contents: list[bytes], compress: bool = True) -> bytes:
    """Assemble N content streams into a valid N-page PDF (catalog /
    pages tree / per-page content / shared Helvetica), same envelope
    discipline as binary.pdf_from_text but multi-page."""
    n = len(contents)
    # object numbering: 1 catalog, 2 pages, 3..2+n page dicts,
    # 3+n..2+2n content streams, 3+2n font
    font_obj = 3 + 2 * n
    kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(n))
    objs: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n),
    ]
    for i in range(n):
        objs.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_obj, 3 + n + i)
        )
    for content in contents:
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        objs.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream"
            % (len(content), filt, content)
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

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
# Table rendering / export (src/table/types.rs:224-267, storage.rs:498-600)
# ---------------------------------------------------------------------------


def table_search_text(table: dict) -> str:
    """Searchable text for a table frame: headers then every non-empty
    cell, space-joined (types.rs:247-267 to_search_text)."""
    parts = []
    if table["headers"]:
        parts.append(" ".join(table["headers"]))
    for row in table["rows"]:
        for cell in row:
            if cell:
                parts.append(cell)
    return " ".join(parts)


def _csv_field(field: str) -> str:
    """RFC 4180 quoting (storage.rs:527-533 escape_csv_field)."""
    if "," in field or '"' in field or "\n" in field:
        return '"' + field.replace('"', '""') + '"'
    return field


def export_csv(table: dict) -> str:
    """Header line then data rows, RFC 4180 escaped
    (storage.rs:498-525 export_to_csv)."""
    out = []
    if table["headers"]:
        out.append(",".join(_csv_field(h) for h in table["headers"]))
    for row in table["rows"]:
        out.append(",".join(_csv_field(c) for c in row))
    return "\n".join(out) + ("\n" if out else "")


def export_json(table: dict, as_records: bool = True) -> str:
    """Records ([{header: value}]) or columns ({header: [values]})
    orientation (storage.rs:543-600 export_to_json)."""
    import json as _json

    headers = table["headers"] or [
        f"col{i}" for i in range(table["n_cols"])
    ]
    if as_records:
        return _json.dumps(
            [
                {h: (row[i] if i < len(row) else "") for i, h in enumerate(headers)}
                for row in table["rows"]
            ],
            indent=2,
        )
    return _json.dumps(
        {
            h: [row[i] if i < len(row) else "" for row in table["rows"]]
            for i, h in enumerate(headers)
        },
        indent=2,
    )
