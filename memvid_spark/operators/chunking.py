"""Chunking: one document row → N chunk rows with lineage.

Reference lineage:
- StructuralChunker (src/structure/chunker.rs, src/types/structure.rs):
  chunks keep structure intact, carry heading context, and record
  lineage (role, parent_id, chunk_index, chunk_count —
  src/types/frame.rs:205-213)
- chunk planning by token budgets (src/memvid/planner.rs:17-73)

The synthetic corpus has no headings/tables, so the structural tier here
is the token-budget window chunker with overlap — the UDTF surface
(SURVEY §2.10): implemented as a pure Column expression (transform over
a sequence of window starts + explode), NOT a Python UDF, so one doc row
explodes to N chunk rows entirely inside whole-stage codegen.

Scale: explode is narrow (no shuffle); chunk rows inherit the parent's
partition. Lineage columns make the chunk→parent join (timeline.rs:118-126)
a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 40,
    stride: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(parent_id, chunk_index, chunk_count, chunk_text, n_tokens).

    Windows of ``chunk_tokens`` tokens every ``stride`` tokens (overlap =
    chunk_tokens - stride). Documents shorter than one window yield one
    chunk. chunk_index is 0-based; chunk_count repeats per chunk row
    (frame.rs:205-213 lineage).
    """
    toks = tokens(text_col)
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk_tokens, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride)).cast("int")
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(
                " ", F.slice(toks, i * stride + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(n - i * stride, F.lit(chunk_tokens)).alias("n_tokens"),
        ),
    )
    return (
        docs.select(
            F.col(id_col).alias("parent_id"),
            n_chunks.alias("chunk_count"),
            F.explode(chunks).alias("c"),
        )
        .select(
            "parent_id",
            F.col("c.idx").alias("chunk_index"),
            "chunk_count",
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


def chunks_with_parents(
    chunks: DataFrame, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Chunk → parent-document decoration (self-join on parent_id,
    frame.rs:208, timeline.rs:118-126)."""
    return chunks.join(
        docs.withColumnRenamed(id_col, "parent_id"), "parent_id"
    )


def budgeted_extract(
    docs: DataFrame,
    budget_chars: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Time-budgeted extraction (src/extract_budgeted.rs:25-460): a cheap
    skim pass emits the head of every document NOW (phase='skim'), and
    documents that exceed the budget also emit a pending row
    (phase='pending_full') that the background enrichment pass picks up —
    the two-phase "skim now, complete async" job split. Pure projection.

    Output: (doc_id, phase, text_part, remaining_chars).
    """
    head = F.substring(F.col(text_col), 1, budget_chars)
    over = F.length(F.col(text_col)) > budget_chars
    skim = docs.select(
        F.col(id_col),
        F.lit("skim").alias("phase"),
        head.alias("text_part"),
        F.greatest(
            F.length(F.col(text_col)) - budget_chars, F.lit(0)
        ).cast("long").alias("remaining_chars"),
    )
    pending = docs.filter(over).select(
        F.col(id_col),
        F.lit("pending_full").alias("phase"),
        F.substring(F.col(text_col), budget_chars + 1, 1 << 30).alias("text_part"),
        F.lit(0).cast("long").alias("remaining_chars"),
    )
    return skim.unionByName(pending)
