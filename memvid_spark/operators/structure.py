"""Structure detection & structural chunking.

Reference: ``detect_structure(text)`` classifies a document into
tables / code blocks / headings / paragraphs (src/structure/detector.rs,
788 LoC) and ``StructuralChunker.chunk`` emits chunks that keep tables
whole or split them between rows with header propagation, keep code
blocks intact, and carry heading context (src/structure/chunker.rs:1-60,
src/types/structure.rs:1-892).

Spark design (SURVEY §2.10): the detector is pure relational algebra —
classify each line with column expressions, then group contiguous
same-kind runs with the gaps-and-islands trick
(``line_no - row_number() over (partition by doc_id, kind)``), so the
whole pass is two window functions + one aggregation, no Python. Code
fences are tracked with a running fence-count parity (a cumulative-sum
window), heading context with ``last_value(... ignore nulls)``. The
chunker splits oversized tables between rows, repeating the header row
per chunk, via ``sequence``/``slice``/``posexplode`` — again no Python
and no shuffle beyond the detector's single groupBy.

At 100 TB: everything is per-document, so the only shuffle is the
block-assembly groupBy keyed by (doc_id, kind, grp) — uniformly
distributed, no skew; the chunker is a pure projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

FENCE = "```"


def demo_structured_lines(docs: DataFrame) -> DataFrame:
    """Deterministic renderer (test scaffolding): turn the flat synthetic
    documents into structured markdown-ish line tables — headings, a
    2-column table, a code fence, paragraphs; docs where doc_id % 3 = 0
    get a second table so island boundaries vary.

    Output: (doc_id, line_no, line) — line_no is 0-based.
    """
    wds = F.split(F.col("text"), " ")

    def w(i: int):  # 1-based word, padded so short docs stay structured
        return F.coalesce(F.try_element_at(wds, F.lit(i)), F.lit(f"pad{i}"))

    base = F.array(
        F.concat(F.lit("# doc "), F.col("doc_id")),
        F.array_join(F.slice(wds, 1, 8), " "),
        F.lit("## details"),
        F.lit("| key | value |"),
        F.concat(F.lit("| w1 | "), w(9), F.lit(" |")),
        F.concat(F.lit("| w2 | "), w(10), F.lit(" |")),
        F.concat(F.lit("| w3 | "), w(11), F.lit(" |")),
        F.lit(FENCE),
        F.concat(F.lit('let x = "'), w(12), F.lit('"')),
        F.lit(FENCE),
        F.array_join(F.slice(wds, 13, 8), " "),
    )
    extra = F.array(
        F.lit("### extra"),
        F.lit("| k | v |"),
        F.concat(F.lit("| e | "), w(21), F.lit(" |")),
    )
    lines = F.when(F.col("doc_id") % 3 == 0, F.concat(base, extra)).otherwise(base)
    return docs.select(
        "doc_id", F.posexplode(lines).alias("line_no", "line")
    )


def lines_from_text(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Real-input adapter: split document text on newlines."""
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "line")
    )


def classify_lines(lines: DataFrame) -> DataFrame:
    """Per-line kind: code (fence-delimited, by running parity), heading
    (# prefix), table (| prefix), blank, para — detector.rs's line
    classifier as column expressions."""
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fence_cnt = F.sum(
        F.when(F.col("line") == FENCE, 1).otherwise(0)
    ).over(wcum)
    is_code = (F.col("line") == FENCE) | (fence_cnt % 2 == 1)
    kind = (
        F.when(is_code, "code")
        .when(F.col("line").startswith("#"), "heading")
        .when(F.col("line").startswith("|"), "table")
        .when(F.trim(F.col("line")) == "", "blank")
        .otherwise("para")
    )
    return lines.withColumn("kind", kind)


def detect_structure(lines: DataFrame) -> DataFrame:
    """Lines → structural blocks. Contiguous same-kind runs collapse into
    one block row carrying start line, length, content, and the governing
    heading at block start (inclusive) — chunker.rs's heading context.

    Output: (doc_id, kind, block_start, n_lines, content, heading_ctx).
    """
    classified = classify_lines(lines)
    wdoc = (
        Window.partitionBy("doc_id")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    heading_ctx = F.last(
        F.when(F.col("kind") == "heading", F.col("line")), ignorenulls=True
    ).over(wdoc)
    wkind = Window.partitionBy("doc_id", "kind").orderBy("line_no")
    grp = F.col("line_no") - F.row_number().over(wkind)

    tagged = classified.select(
        "doc_id", "line_no", "line", "kind",
        heading_ctx.alias("heading_ctx"),
        grp.alias("grp"),
    ).filter(F.col("kind") != "blank")

    ordered = F.array_sort(F.collect_list(F.struct("line_no", "line")))
    return tagged.groupBy("doc_id", "kind", "grp").agg(
        F.min("line_no").alias("block_start"),
        F.count("*").alias("n_lines"),
        F.array_join(
            F.transform(ordered, lambda s: s["line"]), "\n"
        ).alias("content"),
        F.min_by("heading_ctx", F.col("line_no")).alias("heading_ctx"),
    ).drop("grp")


def structural_chunks(blocks: DataFrame, max_table_rows: int = 2) -> DataFrame:
    """Blocks → chunks. Tables with more than ``max_table_rows`` data
    rows split between rows, the header row repeated per chunk
    (chunker.rs header propagation); every other kind passes through
    whole. Pure projection — no shuffle.

    Output: (doc_id, block_start, kind, chunk_index, chunk_text,
    heading_ctx).
    """
    ls = F.split(F.col("content"), "\n")
    header = F.element_at(ls, 1)
    data = F.slice(ls, 2, F.greatest(F.size(ls) - 1, F.lit(0)))
    n_chunks = F.ceil(F.size(data) / F.lit(max_table_rows)).cast("int")
    table_chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat(
            header,
            F.lit("\n"),
            F.array_join(
                F.slice(data, i * max_table_rows + 1, max_table_rows), "\n"
            ),
        ),
    )
    chunks = F.when(
        (F.col("kind") == "table") & (F.size(data) > max_table_rows), table_chunks
    ).otherwise(F.array(F.col("content")))
    return blocks.select(
        "doc_id", "block_start", "kind", "heading_ctx",
        F.posexplode(chunks).alias("chunk_index", "chunk_text"),
    )
