"""Append-only versioning: supersedes chains, tombstones, time-travel,
vacuum.

Reference lineage:
- append-only with logical deletes: updates write a new frame that
  `supersedes` the old, deletes write a tombstone
  (src/memvid/mutation.rs:3150-3287; status/supersedes fields
  src/types/frame.rs:213-218)
- time-travel: as_of_frame / as_of_ts restrict to frames id<=X, Active
  only (src/types/search.rs:61-65, api.rs:663-695)
- vacuum: drop tombstoned payloads, rewrite live data
  (src/memvid/mutation.rs:2999-3084)

The engine works on any frames-like DataFrame with columns
(frame_id, status, supersedes). ``frames_from_documents`` derives a
deterministic version-chained table from the driver's corpus.

Scale: the superseded-set is derived with one self-semi-join on
``supersedes`` (at 100 TB the frames table is partitioned by ingest
date; the supersedes column is almost always intra-partition). Vacuum
is INSERT OVERWRITE of the active view — a full rewrite, run rarely,
exactly like the reference's compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def frames_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic demo frame table: every 10th doc supersedes its
    predecessor; every 25th is tombstoned. Twin SQL in registry.py."""
    return docs.select(
        F.col("doc_id").alias("frame_id"),
        F.col("text"),
        F.when(F.col("doc_id") % 25 == 0, "deleted").otherwise("active").alias("status"),
        F.when((F.col("doc_id") % 10 == 0) & (F.col("doc_id") > 0), F.col("doc_id") - 1)
        .alias("supersedes"),
    )


def active_view(frames: DataFrame) -> DataFrame:
    """Live rows: status=active, not tombstoned, and not superseded by
    any other row (anti-join on the supersedes chain)."""
    superseded = (
        frames.filter(F.col("supersedes").isNotNull())
        .select(F.col("supersedes").alias("frame_id"))
        .distinct()
    )
    return frames.filter(F.col("status") == "active").join(
        superseded, "frame_id", "left_anti"
    )


def as_of_frame(frames: DataFrame, frame_id_upper: int) -> DataFrame:
    """Time-travel: the active view as it was when ``frame_id_upper`` was
    the newest frame — evaluate the same semantics on the id-restricted
    prefix (api.rs:663-695): later supersedes/tombstones don't exist yet."""
    return active_view(frames.filter(F.col("frame_id") <= frame_id_upper))


def vacuum(frames: DataFrame) -> DataFrame:
    """Compaction: the rewritten table contains only live rows; the
    supersedes bookkeeping column is cleared (mutation.rs:2999-3084)."""
    return active_view(frames).withColumn("supersedes", F.lit(None).cast("long"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Change detection between two corpus snapshots: one full-outer
    join on the id with a content-hash compare — (id, change) where
    change is added / removed / modified / unchanged. The change set
    feeds incremental index maintenance (operators/incremental.py)
    exactly as the reference's WAL records feed its commit path.
    """
    o = old.select(F.col(id_col), F.sha2(text_col, 256).alias("_osha"))
    n = new.select(F.col(id_col), F.sha2(text_col, 256).alias("_nsha"))
    j = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("_osha").isNull(), F.lit("added"))
        .when(F.col("_nsha").isNull(), F.lit("removed"))
        .when(F.col("_osha") != F.col("_nsha"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), change.alias("change"))


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part_key",
    id_col: str = "file_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/bin-pack step of a
    Delta/Iceberg-style table maintenance pass (completing the triad
    with vacuum() above and the Z-order layout in operators/skew.py).

    Files within a partition are packed first-fit in deterministic id
    order: bin = exclusive-prefix-sum div target. A bin may overshoot
    the target by at most one file (the standard streaming bin-pack
    bound); in exchange the whole plan is pure per-partition window
    algebra — no driver-side loop over the file listing, which at
    warehouse scale is itself a big table. One shuffle by partition;
    rewriting then maps each (partition, bin) group to one output file.

    Output: (part_col, id_col, bytes_col, bin, bin_files, bin_bytes).
    """
    w = Window.partitionBy(part_col).orderBy(F.asc(id_col))
    cum = F.sum(bytes_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # floor() on both engines (a bare double→bigint cast truncates in
    # Spark but rounds in DuckDB — a cross-engine trap)
    binned = files.withColumn(
        "bin",
        F.floor((cum - F.col(bytes_col)) / F.lit(target_bytes)).cast("long"),
    )
    g = Window.partitionBy(part_col, "bin")
    return binned.select(
        part_col,
        id_col,
        bytes_col,
        "bin",
        F.count("*").over(g).alias("bin_files"),
        F.sum(bytes_col).over(g).alias("bin_bytes"),
    )
