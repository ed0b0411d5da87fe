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
    hits: DataFrame,
    min_score: float,
    score_col: str = "score",
    id_col: str = "doc_id",
    min_results: int = 1,
) -> DataFrame:
    """Keep hits with score ≥ min_score; never cut inside the first
    min_results rows (adaptive.rs find_absolute_cutoff skips i < min_results)."""
    ranked, _ = _ranked(hits, score_col, id_col)
    return ranked.filter(
        (F.col(score_col) >= min_score) | (F.col("rank") <= min_results)
    )


def relative_threshold(
    hits: DataFrame,
    frac: float = 0.5,
    score_col: str = "score",
    id_col: str = "doc_id",
    min_results: int = 1,
) -> DataFrame:
    """Keep hits scoring ≥ frac × top score (min_results floor as above)."""
    ranked, w = _ranked(hits, score_col, id_col)
    top = F.first(score_col).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return ranked.withColumn("_top", top).filter(
        (F.col(score_col) >= frac * F.col("_top")) | (F.col("rank") <= min_results)
    ).drop("_top")


def score_cliff(
    hits: DataFrame,
    drop_ratio: float = 0.5,
    score_col: str = "score",
    id_col: str = "doc_id",
    min_results: int = 1,
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
        F.when(
            prev.isNotNull()
            & (F.col(score_col) < drop_ratio * prev)
            & (F.col("rank") > min_results),  # find_cliff_cutoff skips i < min_results
            F.col("rank"),
        ),
    )
    cliff = F.min("_is_cliff").over(Window.partitionBy())
    return (
        flagged.withColumn("_cliff_rank", cliff)
        .filter(F.col("_cliff_rank").isNull() | (F.col("rank") < F.col("_cliff_rank")))
        .drop("_is_cliff", "_cliff_rank")
    )


def elbow(
    hits: DataFrame,
    sensitivity: float = 1.0,
    min_results: int = 1,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kneedle elbow cutoff (adaptive.rs:604-657): min-max normalize the
    ranked score curve, find the candidate point (0-based index in
    [min_results, n-2]) with the maximum sensitivity-adjusted distance to
    the first→last chord, and keep ranks ≤ elbow+1. No cut when n < 3,
    the curve is flat, or the max adjusted distance ≤ 0.05·sensitivity.
    Ties resolve to the earliest rank (the reference's strict `>` update).

    Same shape as the other strategies: one ordered window, one full-frame
    window — the curve never leaves the executors."""
    ranked, w = _ranked(hits, score_col, id_col)
    full = Window.partitionBy()
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    n = F.count("*").over(full)
    smax, smin = F.max(score_col).over(full), F.min(score_col).over(full)
    rng = smax - smin
    y = F.when(rng > 1e-7, (F.col(score_col) - smin) / rng).otherwise(F.lit(1.0))
    x = (F.col("rank") - F.lit(1)).cast("double") / (n - F.lit(1))
    d = ranked.withColumn("_n", n).withColumn("_x", x).withColumn("_y", y)
    y1, y2 = F.first("_y").over(frame), F.last("_y").over(frame)
    slope = y2 - y1
    dist = F.abs(slope * F.col("_x") - F.col("_y") + y1) / F.sqrt(
        slope * slope + F.lit(1.0)
    )
    in_range = (F.col("rank") >= min_results + 1) & (F.col("rank") <= F.col("_n") - 1)
    adj = F.when(
        in_range, dist * (1.0 + sensitivity * (1.0 - F.col("_x")))
    )
    d = (
        d.withColumn("_adj", adj)
        .withColumn("_max_adj", F.max("_adj").over(full))
        .withColumn(
            "_elbow",
            F.min(
                F.when(F.col("_adj") == F.col("_max_adj"), F.col("rank"))
            ).over(full),
        )
    )
    keep = (
        (F.col("_n") < 3)
        | F.col("_max_adj").isNull()
        | (F.col("_max_adj") <= 0.05 * sensitivity)
        | (F.col("rank") <= F.col("_elbow"))
    )
    return d.filter(keep).drop("_n", "_x", "_y", "_adj", "_max_adj", "_elbow")


def combined(
    hits: DataFrame,
    min_score: float,
    frac: float,
    drop_ratio: float,
    score_col: str = "score",
    id_col: str = "doc_id",
    min_results: int = 1,
) -> DataFrame:
    """Intersection of all three strategies (adaptive.rs Combined —
    "first trigger wins"; on a descending curve each strategy keeps a
    prefix, so the intersection IS the earliest trigger)."""
    out = score_cliff(hits, drop_ratio, score_col, id_col, min_results)
    top = F.max(score_col).over(Window.partitionBy())
    return (
        out.withColumn("_top", top)
        .filter(
            ((F.col(score_col) >= min_score) & (F.col(score_col) >= frac * F.col("_top")))
            | (F.col("rank") <= min_results)
        )
        .drop("_top")
    )


def adaptive_cutoff(
    hits: DataFrame,
    strategy: str = "combined",
    *,
    min_score: float = 0.25,
    frac: float = 0.5,
    drop_ratio: float = 0.5,
    sensitivity: float = 1.0,
    min_results: int = 1,
    max_results: int = 100,
    normalize: bool = True,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """The AdaptiveConfig.evaluate driver (adaptive.rs:504-552; defaults
    :62-80 — min_results=1, max_results=100, normalize=true): min-max
    normalize the curve, dispatch one of the five strategies over the
    normalized scores, cap at max_results. Normalization is monotone, so
    ranking is unchanged; thresholds then live in [0, 1] like the
    reference's. n ≤ min_results keeps everything (short-circuit at
    :509-510, implicit here via the per-strategy floors)."""
    d, col = hits, score_col
    if normalize:
        full = Window.partitionBy()
        smax, smin = F.max(score_col).over(full), F.min(score_col).over(full)
        rng = smax - smin
        d = d.withColumn(
            "_ns",
            F.when(rng > 1e-7, (F.col(score_col) - smin) / rng).otherwise(F.lit(1.0)),
        )
        col = "_ns"
    if strategy == "absolute":
        out = absolute_threshold(d, min_score, col, id_col, min_results)
    elif strategy == "relative":
        out = relative_threshold(d, frac, col, id_col, min_results)
    elif strategy == "cliff":
        out = score_cliff(d, drop_ratio, col, id_col, min_results)
    elif strategy == "elbow":
        out = elbow(d, sensitivity, min_results, col, id_col)
    elif strategy == "combined":
        out = combined(d, min_score, frac, drop_ratio, col, id_col, min_results)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    out = out.filter(F.col("rank") <= max_results)
    return out.drop("_ns") if normalize else out
