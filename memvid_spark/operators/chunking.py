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

from pyspark.sql import DataFrame, Window, functions as F

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
    # pinned tokenize (round 11): the window transform's lambda slices
    # the token array once per CHUNK — un-pinned, that re-ran the regex
    # split per window (plus once each for n and n_chunks); pinning
    # materializes the array once per row (functions.text.pin_expr)
    from ..functions.text import tokens_pinned

    toks = F.col("_toks")
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
            tokens_pinned(text_col).alias("_toks"),
        )
        .select(
            "parent_id",
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


def plan_segments(
    chunks: DataFrame,
    segment_tokens: int = 2048,
    segment_pages: int = 64,
    grain_col: str | None = None,
    parent_col: str = "parent_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_tokens",
    pages_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Group chunk rows into segment-sized build plans
    (SegmentPlanner::plan_from_chunks, src/memvid/planner.rs:17-121):
    chunks laid out in (frame, chunk_index) order accumulate into
    segments bounded by token AND page budgets, each chunk annotated
    with its running token span.

    The reference packs greedily in one sequential pass; the
    distributed re-expression assigns segment = max(floor(cum_tokens /
    segment_tokens), floor(cum_pages / segment_pages)) over the prefix
    sums — the q95 streaming-pack shape: segments stay ~budget-sized
    and boundaries close when EITHER budget fills, with one window
    instead of a driver loop. Pass ``grain_col`` to partition the
    prefix window at scale (segments then never span grains); the
    default global window runs over the narrow planning projection
    (ids + token estimates), which is plan metadata, not the corpus.

    Output: one row per segment — (segment, chunk_count,
    estimated_tokens, estimated_pages, token_start, token_end,
    first_chunk, last_chunk).

    Budget contract: the default prefix-sum assignment lets a chunk
    that straddles a boundary join the EARLIER segment, so
    estimated_tokens (and pages) can reach budget + max_chunk − 1 —
    treat the budgets as targets, not hard caps. ``strict=True``
    switches to the reference's close-on-overflow pass
    (planner.rs plan_from_chunks: a segment closes BEFORE either
    budget would overflow, so estimated_tokens <= budget whenever
    every chunk fits the budget alone): an Arrow-batched sequential
    pass per grain — greedy reset-on-close packing is inherently
    sequential, but it runs over the narrow planning projection (ids +
    token estimates), which is plan metadata, not the corpus; pass
    ``grain_col`` to parallelize across grains at scale.
    """
    if strict:
        return _plan_segments_strict(
            chunks,
            segment_tokens,
            segment_pages,
            grain_col,
            parent_col,
            index_col,
            tokens_col,
            pages_col,
        )
    order = [F.col(parent_col).asc(), F.col(index_col).asc()]
    w_part = (
        Window.partitionBy(grain_col) if grain_col is not None else Window.partitionBy()
    )
    w = w_part.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    tok = F.greatest(F.col(tokens_col), F.lit(1))
    pages = (
        F.greatest(F.col(pages_col), F.lit(1)) if pages_col else F.lit(1)
    )
    planned = chunks.select(
        *( [F.col(grain_col)] if grain_col else [] ),
        F.col(parent_col),
        F.col(index_col),
        tok.alias("_tok"),
        pages.alias("_pages"),
    ).withColumn(
        "_tok_before", F.coalesce(F.sum("_tok").over(w), F.lit(0))
    ).withColumn(
        "_pages_before", F.coalesce(F.sum("_pages").over(w), F.lit(0))
    ).withColumn(
        "segment",
        F.greatest(
            F.floor(F.col("_tok_before") / segment_tokens),
            F.floor(F.col("_pages_before") / segment_pages),
        ),
    )
    keys = ([F.col(grain_col)] if grain_col else []) + [F.col("segment")]
    return planned.groupBy(*keys).agg(
        F.count("*").cast("long").alias("chunk_count"),
        F.sum("_tok").cast("long").alias("estimated_tokens"),
        F.sum("_pages").cast("long").alias("estimated_pages"),
        F.min("_tok_before").cast("long").alias("token_start"),
        F.max(F.col("_tok_before") + F.col("_tok")).cast("long").alias("token_end"),
        F.min(F.struct(parent_col, index_col)).alias("first_chunk"),
        F.max(F.struct(parent_col, index_col)).alias("last_chunk"),
    )


def _plan_segments_strict(
    chunks: DataFrame,
    segment_tokens: int,
    segment_pages: int,
    grain_col: str | None,
    parent_col: str,
    index_col: str,
    tokens_col: str,
    pages_col: str | None,
) -> DataFrame:
    """Reference-exact greedy packing (planner.rs plan_from_chunks):
    walk chunks in (parent, index) order, close the open segment BEFORE
    adding a chunk that would overflow the token or page budget (an
    oversized single chunk still gets its own over-budget segment, as
    in the reference). One Arrow batch per grain; same output schema as
    the prefix-sum path."""
    import pandas as pd

    tok = F.greatest(F.col(tokens_col), F.lit(1))
    pages = F.greatest(F.col(pages_col), F.lit(1)) if pages_col else F.lit(1)
    keys = [F.col(grain_col)] if grain_col else []
    planned = chunks.select(
        *keys,
        F.col(parent_col),
        F.col(index_col),
        tok.cast("long").alias("_tok"),
        pages.cast("long").alias("_pages"),
    )
    grain_ddl = f"{grain_col} {dict(planned.dtypes)[grain_col]}, " if grain_col else ""
    out_schema = (
        grain_ddl
        + "segment long, chunk_count long, estimated_tokens long,"
        + " estimated_pages long, token_start long, token_end long,"
        + f" first_chunk struct<{parent_col}:bigint,{index_col}:bigint>,"
        + f" last_chunk struct<{parent_col}:bigint,{index_col}:bigint>"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # itertuples renames underscore-prefixed columns positionally
        pdf = pdf.rename(columns={"_tok": "tok0", "_pages": "pages0"})
        pdf = pdf.sort_values(
            [parent_col, index_col], kind="mergesort"
        ).reset_index(drop=True)
        rows: list[dict] = []
        cur: dict | None = None
        cur_tok = cur_pages = 0
        tok_prefix = 0  # running token position across ALL chunks
        for r in pdf.itertuples(index=False):
            t, p = int(r.tok0), int(r.pages0)
            if cur is not None and (
                cur_tok + t > segment_tokens or cur_pages + p > segment_pages
            ):
                cur = None  # close BEFORE overflow (planner.rs)
            if cur is None:
                cur_tok = cur_pages = 0
                cur = {
                    **({grain_col: getattr(r, grain_col)} if grain_col else {}),
                    "segment": len(rows),
                    "chunk_count": 0,
                    "estimated_tokens": 0,
                    "estimated_pages": 0,
                    "token_start": tok_prefix,
                    "token_end": tok_prefix,
                    "first_chunk": {
                        parent_col: int(getattr(r, parent_col)),
                        index_col: int(getattr(r, index_col)),
                    },
                    "last_chunk": None,
                }
                rows.append(cur)
            cur_tok += t
            cur_pages += p
            tok_prefix += t
            cur["chunk_count"] += 1
            cur["estimated_tokens"] = cur_tok
            cur["estimated_pages"] = cur_pages
            cur["token_end"] = tok_prefix
            cur["last_chunk"] = {
                parent_col: int(getattr(r, parent_col)),
                index_col: int(getattr(r, index_col)),
            }
        return pd.DataFrame(rows)

    group = (
        planned.groupBy(grain_col)
        if grain_col
        else planned.withColumn("_g", F.lit(1)).groupBy("_g")
    )
    return group.applyInPandas(pack, out_schema)
