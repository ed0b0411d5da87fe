"""Top-k / pagination operators.

Reference: every memvid sort is paired with truncation (SURVEY §2.6), and
pagination is an offset cursor with stable total ordering
(src/memvid/search/tantivy.rs:274-281, src/types/search.rs:172-196).

Scale: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-
partition heap + driver merge — no global sort). Pagination uses a rank
window only when an offset is required; at very deep offsets a real
deployment keysets on the last-seen sort key instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def topk(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def paginate(
    df: DataFrame, order: list[Column], offset: int, limit: int, rank_col: str = "rn"
) -> DataFrame:
    """Offset/limit page with a deterministic total order; emits the row
    number so callers can build a ``next_cursor``."""
    w = Window.orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter((F.col(rank_col) > offset) & (F.col(rank_col) <= offset + limit))
    )


def topk_per_group(
    df: DataFrame, group: list[str], order: list[Column], k: int, rank_col: str = "rnk"
) -> DataFrame:
    """Diversification primitive: cap rows per group
    (src/memvid/ask.rs:1300-1334 caps hits per session/uri-prefix)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
