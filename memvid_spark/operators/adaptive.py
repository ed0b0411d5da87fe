"""Adaptive result-cutoff strategies — dynamic k over a score curve.

Reference: src/types/adaptive.rs:27-33,141,504 (AbsoluteThreshold,
RelativeThreshold, ScoreCliff, Elbow, Combined), driven from
src/memvid/search/api.rs:492-628.

Pure window algebra over a ranked hit list (score DESC, id ASC total
order): lag() for cliff detection, first() for relative threshold — one
window, no extra shuffle beyond the ranking itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _ranked(hits: DataFrame, score_col: str, id_col: str) -> tuple[DataFrame, Window]:
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return hits.withColumn("rank", F.row_number().over(w)), w


def absolute_threshold(
    hits: DataFrame, min_score: float, score_col: str = "score", id_col: str = "doc_id"
) -> DataFrame:
    """Keep hits with score ≥ min_score."""
    ranked, _ = _ranked(hits, score_col, id_col)
    return ranked.filter(F.col(score_col) >= min_score)


def relative_threshold(
    hits: DataFrame, frac: float = 0.5, score_col: str = "score", id_col: str = "doc_id"
) -> DataFrame:
    """Keep hits scoring ≥ frac × top score."""
    ranked, w = _ranked(hits, score_col, id_col)
    top = F.first(score_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ranked.withColumn("_top", top).filter(
        F.col(score_col) >= frac * F.col("_top")
    ).drop("_top")


def score_cliff(
    hits: DataFrame,
    drop_ratio: float = 0.5,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cut at the first rank where score < drop_ratio × previous score:
    keep everything strictly before the first cliff.

    Computed as: cliff_rank = min(rank where score < ratio·lag(score));
    keep rank < cliff_rank (all rows if no cliff). Two stacked windows
    over one ordering.
    """
    ranked, w = _ranked(hits, score_col, id_col)
    prev = F.lag(score_col).over(w)
    flagged = ranked.withColumn(
        "_is_cliff",
        F.when(prev.isNotNull() & (F.col(score_col) < drop_ratio * prev), F.col("rank")),
    )
    cliff = F.min("_is_cliff").over(Window.partitionBy())
    return (
        flagged.withColumn("_cliff_rank", cliff)
        .filter(F.col("_cliff_rank").isNull() | (F.col("rank") < F.col("_cliff_rank")))
        .drop("_is_cliff", "_cliff_rank")
    )


def combined(
    hits: DataFrame,
    min_score: float,
    frac: float,
    drop_ratio: float,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Intersection of all three strategies (adaptive.rs Combined)."""
    out = score_cliff(hits, drop_ratio, score_col, id_col)
    ranked_w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    top = F.max(score_col).over(Window.partitionBy())
    return (
        out.withColumn("_top", top)
        .filter((F.col(score_col) >= min_score) & (F.col(score_col) >= frac * F.col("_top")))
        .drop("_top")
    )
