"""Incremental maintenance of derived tables (postings, sketches, ...).

The reference applies WAL deltas to its indexes at commit time instead
of rebuilding them (src/memvid/mutation.rs:739-918; full rebuild is the
recovery path, api.rs:1038-1106). The Spark analogue: every derived
table D = f(frames) is per-doc decomposable, so a batch of changes
(new docs, re-extracted docs, tombstones) updates D with

    D' = (D anti-join changed_ids) UNION f(changed_docs_still_active)

— the big side (D) is never shuffled: the anti join broadcasts the
changed-id set (a batch is small relative to the corpus), and f runs
only over the batch. The invariant ``D' == f(final corpus)`` is the
correctness contract, pinned by the oracle and tests.

At warehouse scale D lives partitioned on a key of the id (date/bucket);
the anti-join+append pair becomes a partition-overwrite MERGE touching
only partitions containing changed ids.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F


def apply_delta(
    derived: DataFrame,
    changed_ids: DataFrame,
    changed_docs: DataFrame,
    rebuild_fn: Callable[[DataFrame], DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    """Generic delta application: drop every derived row belonging to a
    changed id (update OR tombstone), then append the rebuilt rows for
    the docs that remain active.

    ``changed_ids`` must cover updates, inserts and deletes;
    ``changed_docs`` holds the post-change active rows for those ids
    (deleted ids simply have no row). ``rebuild_fn`` is the same
    function that builds the derived table from scratch — one
    definition, two maintenance modes, no drift.
    """
    kept = derived.join(F.broadcast(changed_ids), id_col, "left_anti")
    return kept.unionByName(rebuild_fn(changed_docs))


def incremental_postings(
    postings: DataFrame,
    changed_ids: DataFrame,
    changed_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    from .search import build_postings

    return apply_delta(
        postings,
        changed_ids,
        changed_docs,
        lambda d: build_postings(d, id_col=id_col, text_col=text_col),
        id_col=id_col,
    )


def incremental_sketches(
    sketches: DataFrame,
    changed_ids: DataFrame,
    changed_docs: DataFrame,
    build_fn: Callable[[DataFrame], DataFrame],
    id_col: str = "doc_id",
) -> DataFrame:
    return apply_delta(sketches, changed_ids, changed_docs, build_fn, id_col)
