"""Candidate-set intersection — the retrieval "optimizer" stage.

Reference: before scoring, search intersects frame-id candidate sets
from independent pruners — date range, temporal mentions, replay as-of
cut, sketch pre-filter — each intersection short-circuiting to an empty
response when it empties (src/memvid/search/mod.rs:84-230, SURVEY §3.1
step 3).

Spark mapping: chained ``left_semi`` joins (each pruner only ever
restricts the id set; no payload columns move). The empty-short-circuit
is a driver-side `limit(1).count()` probe between stages — at scale the
probe costs one tiny job and saves the full scoring pipeline whenever a
pruner kills the query; callers can disable it and let
empty-relation propagation handle planning instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def intersect_candidates(
    base: DataFrame,
    *pruners: DataFrame,
    key: str = "doc_id",
    short_circuit: bool = True,
) -> DataFrame:
    """Semi-join ``base`` against each pruner's key set in turn.
    Returns the restricted base (all base columns). With
    ``short_circuit``, stop probing as soon as an intersection is empty
    and return the (empty) frame immediately — the reference's
    empty-exit at each stage."""
    out = base
    for p in pruners:
        out = out.join(p.select(key).distinct(), key, "left_semi")
        if short_circuit and out.limit(1).count() == 0:
            return out.limit(0)
    return out
