"""Interval-overlap alignment: join two timed-segment tables (audio
energy segments, demuxed sample ranges, subtitle cues, transcription
output — all the (t_start, t_end) shapes this engine produces) on
strict time overlap within a key.

Scale: the naive formulation is an inequality join (nested loop in
Spark). This is the banded equi-join instead (the banded_pairs pattern,
operators/traindata.py:193): each interval explodes into the time
bands it covers, candidates meet on (key, band) — a shuffle Catalyst
partitions normally — and the exact overlap predicate + dedupe run on
the (small) candidate set. With ``band_ms`` at or above the typical
interval length each interval covers ≤2 bands, so the candidate
inflation is bounded by a small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ALIGN_SCHEMA_DOC = (
    "(key, a_index, b_index, ov_start_ms, ov_end_ms, ov_ms)"
)


def _banded(df: DataFrame, key: str, idx_out: str, band_ms: int) -> DataFrame:
    bands = F.sequence(
        F.expr(f"t_start_ms div {band_ms}"),
        F.expr(f"(t_end_ms - 1) div {band_ms}"),
    )
    return df.select(
        F.col(key),
        F.col("seg_index").alias(idx_out),
        F.col("t_start_ms").alias(f"{idx_out}_t0"),
        F.col("t_end_ms").alias(f"{idx_out}_t1"),
        F.explode(bands).alias("band"),
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "media_id",
    band_ms: int = 16,
) -> DataFrame:
    """Rows of ``left`` × ``right`` with strictly positive time overlap
    on the same key. Both inputs need (key, seg_index, t_start_ms,
    t_end_ms); intervals are half-open [t0, t1)."""
    a = _banded(left, key, "a_index", band_ms)
    b = _banded(right, key, "b_index", band_ms)
    ov_start = F.greatest(F.col("a_index_t0"), F.col("b_index_t0"))
    ov_end = F.least(F.col("a_index_t1"), F.col("b_index_t1"))
    return (
        a.join(b, [key, "band"])
        .filter(
            (F.col("a_index_t0") < F.col("b_index_t1"))
            & (F.col("b_index_t0") < F.col("a_index_t1"))
        )
        .select(
            F.col(key),
            "a_index",
            "b_index",
            ov_start.alias("ov_start_ms"),
            ov_end.alias("ov_end_ms"),
            (ov_end - ov_start).alias("ov_ms"),
        )
        # an overlapping pair can meet in up to 2 shared bands — dedupe
        .distinct()
    )
