"""Document reader registry: format sniffing + per-format extraction.

Reference: the DocumentReader trait + registry dispatch on mime /
extension / magic bytes (src/reader/mod.rs:28-39,177-217), format
inference at put time (src/memvid/mutation.rs:229-321), and the XLSX
structured extractor — multi-table detection per sheet, header
propagation, column type inference (src/reader/xlsx_table_detect.rs,
src/reader/xlsx_chunker.rs; tests/xlsx_structured.rs:60-529).

Binary formats are REAL: extraction dispatches to the pure-stdlib
codecs in sources/binary.py (PDF content-stream evaluation via zlib;
OOXML zip+XML parsing), with pypdf preferred for PDF when installed.
A legacy demo-container payload (magic prefix + UTF-8 body) is still
accepted as a last-resort fallback so older fixtures keep working;
genuinely unreadable bytes surface as NULL text, never a batch failure.

Sheet-table detection is NOT stubbed: it runs on Spark columns (split
rows, gaps-and-islands on blank lines, regexp type votes) — the same
relational pattern as operators/structure.py, so it scales with zero
Python in the path.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, Window, functions as F

from . import binary
from ..session import fan_out

PDF_MAGIC = b"%PDF"
ZIP_MAGIC = b"PK\x03\x04"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

READ_SCHEMA = "doc_id long, uri string, fmt string, text string, n_chars long"


# MIME → format (mutation.rs:252-273); text/* not listed falls to text
_MIME_FORMATS = {
    "application/pdf": "pdf",
    "text/plain": "text",
    "text/markdown": "markdown",
    "text/html": "html",
    "application/xhtml+xml": "html",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "docx",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "xlsx",
    "application/vnd.ms-excel": "xls",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "pptx",
    "application/x-ndjson": "jsonl",
    "application/jsonlines": "jsonl",
    "audio/flac": "flac",
    "audio/x-flac": "flac",
    "image/tiff": "tiff",
}

# extension → format (mutation.rs:281-300: the plain-text catalog
# covers config + source-code files; md/html get their own readers)
_TEXT_EXTS = {
    "txt", "text", "log", "cfg", "ini", "json", "yaml", "yml", "toml",
    "csv", "tsv", "rs", "py", "js", "ts", "tsx", "jsx", "c", "h", "cpp",
    "hpp", "go", "rb", "php", "css", "scss", "sh", "bash", "swift",
    "kt", "java", "scala", "sql",
}
_EXT_FORMATS = {
    "pdf": "pdf", "docx": "docx", "xlsx": "xlsx", "xls": "xls",
    "pptx": "pptx", "md": "markdown", "markdown": "markdown",
    "html": "html", "htm": "html", "jsonl": "jsonl",
    **{e: "text" for e in _TEXT_EXTS},
}


def _detect_pdf_magic(payload: bytes) -> bool:
    """%PDF magic tolerant of a UTF-8 BOM and leading whitespace
    (mutation.rs:303-318 detect_pdf_magic)."""
    head = payload[:1024]
    if head.startswith(b"\xef\xbb\xbf"):
        head = head[3:]
    return head.lstrip(b" \t\r\n\x0b\x0c").startswith(b"%PDF")


def _ext_of(uri: str) -> str:
    tail = uri.rsplit("/", 1)[-1]
    return tail.rsplit(".", 1)[-1].lower() if "." in tail else ""


def sniff_format(payload: bytes, uri: str = "", mime: str | None = None) -> str:
    """Format inference ladder (mutation.rs:229-321
    infer_document_format): magic bytes first (PDF BOM/whitespace-
    tolerant; our extras for the media and archive tiers), ZIP
    containers disambiguated by extension then zip members, then the
    MIME map, then the extension catalog, then a UTF-8 text fallback
    with a cheap HTML-shape check."""
    if _detect_pdf_magic(payload):
        return "pdf"
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(b"\xff\xd8"):
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if (
        payload.startswith(b"BM")
        and len(payload) >= 26
        # "BM" alone collides with plain text; require a known DIB
        # header size at offset 14 before calling it a bitmap
        and int.from_bytes(payload[14:18], "little")
        in (12, 16, 40, 52, 56, 64, 108, 124)
    ):
        return "bmp"
    if payload[:2] == b"\x1f\x8b":
        return "gzip"
    if payload.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        # OLE2/CFB compound file: legacy Office. Disambiguate by the
        # directory stream names (mutation.rs routes by mime/ext; we
        # can do better with the magic in hand).
        from .xls import CfbError, CfbFile

        try:
            names = CfbFile(payload).stream_names()
        except (CfbError, struct.error):
            return "binary"
        if any(n in ("Workbook", "Book") for n in names):
            return "xls"
        return "binary"
    if payload[:5] in (b"WARC/",):
        return "warc"
    if len(payload) > 262 and payload[257:262] == b"ustar":
        return "tar"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload.startswith(ZIP_MAGIC):
        ext = _ext_of(uri)
        if ext in ("docx", "xlsx", "xls", "pptx"):
            return ext
        # no extension hint: disambiguate OOXML containers by zip members
        names = binary.zip_names(payload)
        if any(n.startswith("word/") for n in names):
            return "docx"
        if any(n.startswith("xl/") for n in names):
            return "xlsx"
        if any(n.startswith("ppt/") for n in names):
            return "pptx"
        return "zip"
    hinted = None
    if mime:
        m = mime.split(";", 1)[0].strip().lower()
        hinted = _MIME_FORMATS.get(m)
        if hinted is None and m.startswith("text/"):
            hinted = "text"
    if hinted is None:
        hinted = _EXT_FORMATS.get(_ext_of(uri))
    if hinted in ("pdf", "docx", "xlsx", "xls", "pptx"):
        # binary-capable hint without the matching magic: trust it and
        # let the reader's error channel surface a mismatch
        # (mutation.rs falls back through the reader chain the same way)
        return hinted
    try:
        text = payload.decode("utf-8")
    except UnicodeDecodeError:
        return "binary"  # a text-ish hint can't override non-UTF-8 bytes
    if hinted is not None:
        return hinted
    head = text[:256].lstrip().lower()
    if head.startswith(("<!doctype html", "<html")):
        return "html"
    return "text"


def _demo_container_text(payload: bytes, magic: bytes) -> str | None:
    """Parse the deterministic test container: magic prefix + UTF-8 body."""
    if payload.startswith(magic):
        try:
            return payload[len(magic):].decode("utf-8").lstrip("\n")
        except UnicodeDecodeError:
            return None
    return None


def _read_text(payload: bytes) -> str:
    return payload.decode("utf-8")


def _read_png(payload: bytes) -> str:
    from .image import png_describe

    return png_describe(payload)


def _read_wav(payload: bytes) -> str:
    from .audio import wav_describe

    return wav_describe(payload)


def _read_flac(payload: bytes) -> str:
    from .flac import flac_metadata

    m = flac_metadata(payload)
    dur = m["n_samples"] * 1000 // m["sample_rate"] if m["sample_rate"] else 0
    return (
        f"flac audio {m['sample_rate']}hz {m['n_channels']}ch "
        f"{m['bits_per_sample']}bit {m['n_samples']} frames ({dur}ms)"
    )


def _read_gzip(payload: bytes) -> str:
    """gzip is a transparent wrapper: gunzip, re-sniff, route to the
    inner format's reader — so doc.pdf.gz / corpus.tar.gz / notes.txt.gz
    all ingest without special-casing (mutation.rs's inference ladder
    treats encodings the same way)."""
    import gzip as _gz

    try:
        inner = _gz.decompress(payload)
    except OSError as e:
        raise NotImplementedError(f"unreadable gzip payload: {e}") from None
    fmt = sniff_format(inner)
    if fmt == "gzip":
        raise NotImplementedError("unreadable gzip payload (nested wrapper)")
    reader = READERS.get(fmt)
    if reader is None:
        raise NotImplementedError(f"unreadable gzip payload (inner {fmt!r})")
    return reader(inner)


def _read_tar(payload: bytes) -> str:
    """Archive-as-one-document view (the _read_warc shape): every
    regular member routes through the reader registry by its own
    sniffed format; member texts join with blank lines in archive
    order. Member-per-document ingestion lives on the facade."""
    import io
    import tarfile

    parts = []
    try:
        with tarfile.open(fileobj=io.BytesIO(payload)) as tf:
            for m in tf.getmembers():
                if not m.isfile():
                    continue
                data = tf.extractfile(m).read()
                fmt = sniff_format(data, uri=m.name)
                reader = READERS.get(fmt)
                if reader is None:
                    continue
                try:
                    parts.append(reader(data))
                except NotImplementedError:
                    continue
    except tarfile.TarError as e:
        raise NotImplementedError(f"unreadable tar payload: {e}") from None
    return "\n\n".join(parts)


def _read_tiff(payload: bytes) -> str:
    from .tiff import tiff_describe

    return tiff_describe(payload)


def _read_mp4(payload: bytes) -> str:
    from .video import mp4_describe

    return mp4_describe(payload)


def _read_warc(payload: bytes) -> str:
    """Single-document view of an archive: response bodies (HTML →
    visible text) joined by blank lines. Page-per-document ingestion
    lives on the facade (api.put_warc)."""
    from .htmltext import html_to_text
    from .warc import warc_parse

    parts = []
    for rec in warc_parse(payload):
        if rec["warc_type"] != "response" or rec["body"] is None:
            continue
        body = rec["body"].decode("utf-8", errors="replace")
        parts.append(
            html_to_text(body)
            if (rec["mime"] or "").startswith("text/html")
            else body
        )
    return "\n\n".join(parts)


def _image_reader(fmt: str) -> Callable[[bytes], str]:
    def read(payload: bytes) -> str:
        from . import image

        return getattr(image, f"{fmt}_describe")(payload)

    return read


def _read_pdf(payload: bytes) -> str:
    try:
        import pypdf  # noqa: F401  — preferred extractor when available
    except ImportError:
        pass
    else:
        import io

        return "\n".join(
            p.extract_text() or "" for p in pypdf.PdfReader(io.BytesIO(payload)).pages
        )
    text = binary.pdf_extract_text(payload)
    if text:
        return text
    # legacy demo-container fixture (magic prefix + UTF-8 body)
    text = _demo_container_text(payload, b"%PDF-1.4")
    if text is not None:
        return text
    raise NotImplementedError("unreadable pdf payload (no text streams)")


def _ooxml_reader(
    extract: Callable[[bytes], str | None], fmt: str
) -> Callable[[bytes], str]:
    def read(payload: bytes) -> str:
        text = extract(payload)
        if text is not None:
            return text
        text = _demo_container_text(payload, ZIP_MAGIC)
        if text is not None:
            return text
        raise NotImplementedError(f"unreadable {fmt} payload")

    return read


def _read_xls(payload: bytes) -> str:
    """Legacy Excel 97-2003: real BIFF8 parse (src/reader/xls.rs via
    calamine; here sources/xls.py from the MS-CFB/MS-XLS specs). ZIP
    payloads carrying an .xls extension are OOXML in disguise and fall
    through to the .xlsx extractor — the reference reaches the same
    outcome via its reader-fallback chain (xls.rs:75-101)."""
    if payload.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        from .xls import xls_extract_text

        text = xls_extract_text(payload)
        if text is not None:
            return text
        raise NotImplementedError("unreadable xls payload")
    return _ooxml_reader(binary.xlsx_extract_text, "xls")(payload)


def _read_html(payload: bytes) -> str:
    """HTML → visible text via the web-ingestion extractor (the
    reference routes DocumentFormat::Html through its passthrough
    extractor, which does the same markup strip)."""
    from .htmltext import html_to_text

    return html_to_text(payload.decode("utf-8"))


READERS: dict[str, Callable[[bytes], str]] = {
    "text": _read_text,
    # markdown/jsonl index as text (passthrough.rs:24-27 routes both
    # through the plain extractor); html strips markup first
    "markdown": _read_text,
    "jsonl": _read_text,
    "html": _read_html,
    "pdf": _read_pdf,
    # images: real header parse → one-line surrogate text; pixel features
    # live on the media/features path (sources/image.py, multimodal.py);
    # PNG additionally decodes for real
    "png": _read_png,
    "wav": _read_wav,
    "flac": _read_flac,
    "mp4": _read_mp4,
    "warc": _read_warc,
    "jpeg": _image_reader("jpeg"),
    "gif": _image_reader("gif"),
    "tiff": _read_tiff,
    "tar": _read_tar,
    "gzip": _read_gzip,
    "bmp": _image_reader("bmp"),
    "docx": _ooxml_reader(binary.docx_extract_text, "docx"),
    "xlsx": _ooxml_reader(binary.xlsx_extract_text, "xlsx"),
    "xls": _read_xls,
    "pptx": _ooxml_reader(binary.pptx_extract_text, "pptx"),
}


def register_reader(fmt: str, fn: Callable[[bytes], str]) -> None:
    """Plugin point — the DocumentReader registry (reader/mod.rs:177-217)."""
    READERS[fmt] = fn


def demo_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic test payloads cycling through the formats."""
    m = F.col("doc_id") % 4
    uri = F.concat(
        F.lit("mv2://docs/"),
        F.col("doc_id"),
        F.when(m == 0, ".txt").when(m == 1, ".pdf").when(m == 2, ".docx").otherwise(".xlsx"),
    )
    prefix = (
        F.when(m == 1, F.lit("%PDF-1.4\n"))
        .when(m >= 2, F.lit("PK\x03\x04"))
        .otherwise(F.lit(""))
    )
    return docs.select(
        "doc_id",
        uri.alias("uri"),
        F.encode(F.concat(prefix, F.col("text")), "utf-8").alias("payload"),
    )


def binary_payloads(docs: DataFrame) -> DataFrame:
    """Serialize each document's text into a REAL binary file — PDF /
    DOCX / XLSX / PPTX cycling on doc_id — via the stdlib writers in
    sources/binary.py. Runs as an Arrow-batched mapInPandas (each
    executor serializes its own partitions); the output payloads are
    valid files, so extract_documents exercises genuine Flate/zip/XML
    parsing rather than demo containers."""
    fmts = ["pdf", "docx", "xlsx", "pptx"]
    writers = {
        "pdf": binary.pdf_from_text,
        "docx": binary.docx_from_text,
        "xlsx": binary.xlsx_from_text,
        "pptx": binary.pptx_from_text,
    }

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            uris, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                fmt = fmts[int(doc_id) % 4]
                uris.append(f"mv2://docs/{int(doc_id)}.{fmt}")
                payloads.append(writers[fmt](text or ""))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "uri": uris, "payload": payloads}
            )

    return fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, uri string, payload binary"
    )


def xls_payloads(docs: DataFrame) -> DataFrame:
    """Serialize each document's text into a REAL legacy .xls file
    (CFB + BIFF8, sources/xls.py) — one cell per line, so extraction
    re-renders the exact original text. Arrow-batched mapInPandas like
    binary_payloads."""
    from .xls import xls_from_text

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "uri": [
                        f"mv2://docs/{int(d)}.xls" for d in pdf["doc_id"]
                    ],
                    "payload": [
                        xls_from_text(t or "") for t in pdf["text"]
                    ],
                }
            )

    return fan_out(docs.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, uri string, payload binary"
    )


def extract_documents(payloads: DataFrame) -> DataFrame:
    """Sniff + dispatch + extract over Arrow batches (one Python call per
    batch). Output is READ_SCHEMA; unknown binary formats surface as
    fmt='binary' with NULL text rather than failing the batch."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fmts, texts, ns = [], [], []
            for payload, uri in zip(pdf["payload"], pdf["uri"]):
                b = bytes(payload) if payload is not None else b""
                fmt = sniff_format(b, uri or "")
                reader = READERS.get(fmt)
                if reader is None:
                    fmts.append(fmt)
                    texts.append(None)
                    ns.append(0)
                    continue
                try:
                    text = reader(b)
                except NotImplementedError:
                    text = None
                fmts.append(fmt)
                texts.append(text)
                ns.append(len(text) if text is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "uri": pdf["uri"],
                    "fmt": fmts,
                    "text": texts,
                    "n_chars": ns,
                }
            )

    return payloads.mapInPandas(run, READ_SCHEMA)


# ---------------------------------------------------------------------------
# Sheet-table structured extraction (xlsx_table_detect.rs semantics)
# ---------------------------------------------------------------------------

INT_RE = r"^-?[0-9]+$"
NUM_RE = r"^-?[0-9]+(\.[0-9]+)?$"


def demo_sheets(docs: DataFrame) -> DataFrame:
    """Deterministic CSV-ish sheet per doc: two tables separated by a
    blank row; the first table's row count varies with doc_id."""
    wds = F.split(F.col("text"), " ")
    w1 = F.coalesce(F.try_element_at(wds, F.lit(1)), F.lit("pad1"))
    w2 = F.coalesce(F.try_element_at(wds, F.lit(2)), F.lit("pad2"))
    data_rows = F.transform(
        F.sequence(F.lit(1), F.col("doc_id") % 3 + 2),
        lambda i: F.concat_ws(
            ",", w1, (F.col("doc_id") + i).cast("string"),
            F.concat((F.col("doc_id") % 90 + i).cast("string"), F.lit(".5")),
        ),
    )
    sheet = F.concat(
        F.array(F.lit("name,qty,price")),
        data_rows,
        F.array(F.lit(""), F.lit("city,code")),
        F.array(F.concat_ws(",", w2, (F.col("doc_id") * 7).cast("string"))),
    )
    return docs.select("doc_id", F.array_join(sheet, "\n").alias("sheet_text"))


def _sheet_cells(sheets: DataFrame, text_col: str = "sheet_text") -> DataFrame:
    """Shared island/cell decomposition: (doc_id, table_index, rn,
    col_index, cell) — rn 1 is the header row of each blank-row island."""
    rows = sheets.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("row_no", "row"),
    )
    wkind = Window.partitionBy("doc_id", "blank").orderBy("row_no")
    islands = (
        rows.withColumn("blank", F.trim(F.col("row")) == "")
        .withColumn("grp", F.col("row_no") - F.row_number().over(wkind))
        .filter(~F.col("blank"))
    )
    wgrp = Window.partitionBy("doc_id").orderBy("grp")
    tables = islands.withColumn("table_index", F.dense_rank().over(wgrp) - 1)
    wtab = Window.partitionBy("doc_id", "table_index").orderBy("row_no")
    return (
        tables.withColumn("rn", F.row_number().over(wtab))
        .select(
            "doc_id", "table_index", "rn",
            F.posexplode(F.split(F.col("row"), ",")).alias("col_index", "cell"),
        )
    )


def sheet_chunks(
    sheets: DataFrame,
    max_chars: int = 1200,
    max_chunks: int = 500,
    text_col: str = "sheet_text",
    sheet_name: str = "sheet1",
) -> DataFrame:
    """Row-aligned semantic chunking of sheet tables — the XLSX chunker
    (src/reader/xlsx_chunker.rs): rows never split across chunks, every
    chunk carries the ``[Sheet: X] [Table: Y]`` context prefix plus the
    header line, data rows render as ``Header: Value | Header: Value``
    with empty cells skipped, rows greedy-bin-pack into ≤max_chars
    chunks (prefix counted; an oversize first row still emits), and a
    workbook produces at most max_chunks chunks in table order
    (MAX_SPREADSHEET_CHUNKS cap, xlsx_chunker.rs:21).

    Shape: cell decomposition + row assembly are keyed windows/groupBys;
    the greedy pack is a per-(doc, table) applyInPandas fold — a table's
    rows are co-located by construction, so the sequential part is local
    and bounded by sheet size.

    Output: (doc_id, table_index, chunk_index, n_rows, chunk_text).
    """
    cells = _sheet_cells(sheets, text_col)
    headers = cells.filter(F.col("rn") == 1).select(
        "doc_id", "table_index", "col_index", F.col("cell").alias("header")
    )
    body = cells.filter((F.col("rn") > 1) & (F.col("cell") != "")).join(
        headers, ["doc_id", "table_index", "col_index"], "left"
    )
    part = F.when(
        F.coalesce(F.col("header"), F.lit("")) != "",
        F.concat(F.col("header"), F.lit(": "), F.col("cell")),
    ).otherwise(F.col("cell"))
    lines = (
        body.withColumn("part", part)
        .groupBy("doc_id", "table_index", "rn")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("col_index", "part"))),
                    lambda s: s["part"],
                ),
                " | ",
            ).alias("line")
        )
        .filter(F.col("line") != "")
    )
    header_line = headers.filter(F.col("header") != "").groupBy(
        "doc_id", "table_index"
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_index", "header"))),
                lambda s: s["header"],
            ),
            " | ",
        ).alias("header_line")
    )
    prefix = F.concat(
        F.lit(f"[Sheet: {sheet_name}] [Table: t"),
        F.col("table_index").cast("string"),
        F.lit("]\n"),
        F.when(
            F.col("header_line") != "", F.concat(F.col("header_line"), F.lit("\n"))
        ).otherwise(F.lit("")),
    )
    ready = lines.join(header_line, ["doc_id", "table_index"], "left").select(
        "doc_id", "table_index", "rn", "line",
        prefix.alias("prefix"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("rn")
        out_rows = []
        pfx = pdf["prefix"].iloc[0]
        cur, cur_len, idx = [], len(pfx), 0
        for line in pdf["line"]:
            row_len = len(line) + 1
            if cur and cur_len + row_len > max_chars:
                out_rows.append((idx, len(cur), pfx + "\n".join(cur)))
                idx += 1
                cur, cur_len = [], len(pfx)
            cur.append(line)
            cur_len += row_len
        if cur:
            out_rows.append((idx, len(cur), pfx + "\n".join(cur)))
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].iloc[0],
                "table_index": pdf["table_index"].iloc[0],
                "chunk_index": [r[0] for r in out_rows],
                "n_rows": [r[1] for r in out_rows],
                "chunk_text": [r[2] for r in out_rows],
            }
        )

    packed = ready.groupBy("doc_id", "table_index").applyInPandas(
        pack,
        "doc_id long, table_index int, chunk_index int, n_rows int, chunk_text string",
    )
    # workbook-level cap in table order (chunk_index_start threading)
    wdoc = Window.partitionBy("doc_id").orderBy("table_index", "chunk_index")
    return (
        packed.withColumn("_k", F.row_number().over(wdoc))
        .filter(F.col("_k") <= max_chunks)
        .drop("_k")
    )


def sheet_tables(sheets: DataFrame, text_col: str = "sheet_text") -> DataFrame:
    """Multi-table detection per sheet + per-column type inference —
    blank-row islands become tables, row 1 of each island is the header,
    and each column's type is the strictest satisfied by every cell
    (int ⊂ double ⊂ str), mirroring xlsx_table_detect.rs's column
    voting. Pure column expressions + two groupBys.

    Output: (doc_id, table_index, col_index, header, dtype, n_rows).
    """
    rows = sheets.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("row_no", "row"),
    )
    wkind = Window.partitionBy("doc_id", "blank").orderBy("row_no")
    islands = (
        rows.withColumn("blank", F.trim(F.col("row")) == "")
        .withColumn("grp", F.col("row_no") - F.row_number().over(wkind))
        .filter(~F.col("blank"))
    )
    wgrp = Window.partitionBy("doc_id").orderBy("grp")
    tables = islands.withColumn("table_index", F.dense_rank().over(wgrp) - 1)
    wtab = Window.partitionBy("doc_id", "table_index").orderBy("row_no")
    cells = (
        tables.withColumn("rn", F.row_number().over(wtab))
        .select(
            "doc_id", "table_index", "rn",
            F.posexplode(F.split(F.col("row"), ",")).alias("col_index", "cell"),
        )
    )
    # ONE aggregation instead of headers ⋈ typed (round 12): the old
    # shape consumed `cells` twice (the rn=1 header slice and the rn>1
    # body typing), and Spark recomputed the whole scan + island window
    # chain per branch — the corpus was scanned twice per query (plan
    # evidence in plans/r12/q84_sheet_tables_before.txt: two Scan
    # subtrees, 4 Exchanges, 6 Windows). Headers fold into the same
    # per-(doc, table, col) aggregation: rn 1 contributes the header
    # (unique per group — posexplode emits each col_index once per
    # row), rn > 1 contribute the type votes and the row count. The
    # old inner join kept exactly the groups with BOTH a header cell
    # AND >= 1 body cell; the post-aggregation filter reproduces that.
    agg = cells.groupBy("doc_id", "table_index", "col_index").agg(
        F.min(F.when(F.col("rn") == 1, F.col("cell"))).alias("header"),
        F.count(F.when(F.col("rn") > 1, F.lit(1))).alias("n_rows"),
        F.min(
            F.when(F.col("rn") > 1, F.col("cell").rlike(INT_RE).cast("int"))
        ).alias("all_int"),
        F.min(
            F.when(F.col("rn") > 1, F.col("cell").rlike(NUM_RE).cast("int"))
        ).alias("all_num"),
    )
    dtype = (
        F.when(F.col("all_int") == 1, "int")
        .when(F.col("all_num") == 1, "double")
        .otherwise("str")
    )
    return (
        agg.filter(F.col("header").isNotNull() & (F.col("n_rows") > 0))
        .select(
            "doc_id", "table_index", "col_index", "header",
            dtype.alias("dtype"), "n_rows",
        )
    )


# ---------------------------------------------------------------------------
# PDF positional table extraction (src/table/ semantics; sources/pdf_layout.py)
# ---------------------------------------------------------------------------


def pdf_table_payloads(docs: DataFrame, ruled_mod: int = 2) -> DataFrame:
    """Deterministic PDF-table corpus: every third document becomes a
    REAL multi-page PDF whose cells are positioned with ``Tm``
    coordinates only — no delimiters — so extraction must rebuild the
    grid from geometry. Tables longer than 3 data rows spill onto a
    second page with the header reprinted (the multi-page-merge case);
    even doc_ids additionally stroke the full ruling grid so both the
    lattice and the stream detector are exercised in one corpus.
    Arrow-batched mapInPandas like binary_payloads."""

    sel = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .pdf_layout import pdf_from_table

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n = d % 4 + 2
                n_cols = (d // 3) % 3 + 2  # 2..4 columns — varies the geometry
                rows = [
                    [
                        f"it{d % 50}_{i}",
                        str(d + i),
                        f"{d % 90 + i}.5",
                        f"n{(d + i) % 7}",
                    ][:n_cols]
                    for i in range(1, n + 1)
                ]
                payloads.append(
                    pdf_from_table(
                        ["item", "qty", "price", "note"][:n_cols],
                        rows,
                        col_x=(72.0, 200.0, 320.0, 430.0)[:n_cols],
                        rows_per_page=3,
                        ruled=(d % ruled_mod == 0),
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return fan_out(sel).mapInPandas(run, "doc_id long, payload binary")


PDF_TABLE_CELL_SCHEMA = (
    "doc_id long, table_index int, rn int, col_index int, cell string, "
    "mode string, page_start int, page_end int"
)


def extract_pdf_table_cells(payloads: DataFrame) -> DataFrame:
    """Run positional table detection over PDF payloads and explode the
    merged logical tables to cells — the same (doc_id, table_index, rn,
    col_index, cell) grain the XLSX sheet tier uses, so downstream
    chunking/typing is format-agnostic. rn=1 is the header row."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .pdf_layout import pdf_extract_tables

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "table_index": [], "rn": [], "col_index": [],
                "cell": [], "mode": [], "page_start": [], "page_end": [],
            }
            for d, payload in zip(pdf["doc_id"], pdf["payload"]):
                tables = pdf_extract_tables(bytes(payload))
                for ti, t in enumerate(tables):
                    rows = ([t["headers"]] if t["headers"] else []) + t["rows"]
                    for rn, row in enumerate(rows, start=1):
                        for ci, cell in enumerate(row):
                            out["doc_id"].append(int(d))
                            out["table_index"].append(ti)
                            out["rn"].append(rn)
                            out["col_index"].append(ci)
                            out["cell"].append(cell)
                            out["mode"].append(t["mode"])
                            out["page_start"].append(t["page_start"])
                            out["page_end"].append(t["page_end"])
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, PDF_TABLE_CELL_SCHEMA)


def pdf_sheet_texts(payloads: DataFrame) -> DataFrame:
    """Render each PDF's detected tables in the sheet-text shape
    (comma-joined rows, blank line between tables) so the XLSX tier's
    sheet_tables / sheet_chunks run unchanged on PDF tables —
    structural chunking treats both formats identically."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from .pdf_layout import pdf_extract_tables, tables_as_sheet_text

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sheet_text": [
                        tables_as_sheet_text(pdf_extract_tables(bytes(p)))
                        for p in pdf["payload"]
                    ],
                }
            )

    return payloads.mapInPandas(run, "doc_id long, sheet_text string")
