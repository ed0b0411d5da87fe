"""Doctor / verify: consistency audit of derived tables against the
source-of-truth table.

Reference: ``doctor()`` heals corrupt indexes and ``verify`` audits
store invariants (src/memvid/doctor.rs; audit report aggregates
src/memvid/audit.rs:44-224; exercised in tests/doctor_recovery.rs and
src/lib.rs:1160-1248). In the Spark engine every index is a rebuildable
derived table (SURVEY §1.2 verdict), so "doctor" is a set of anti-join
audits: keys present in frames but missing from a derived table (stale
index → rebuild), keys in a derived table that no longer exist in
frames (orphans → vacuum), and uniqueness invariants.

Scale: each check is one semi/anti join on the table's key — no
collects; the findings table is tiny (one row per check).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _count(df: DataFrame, colname: str) -> DataFrame:
    return df.agg(F.count("*").cast("long").alias(colname))


def doctor_report(
    frames: DataFrame,
    derived: dict[str, DataFrame],
    frame_key: str = "doc_id",
    derived_keys: dict[str, str] | None = None,
) -> DataFrame:
    """Audit every derived table against frames. For each derived table
    emit ``missing`` (frame keys with no derived row — index lags) and
    ``orphaned`` (derived keys with no frame — tombstone leak), plus a
    frames-level duplicate-key check.

    Output: (check, table_name, n_affected) — deterministic, tiny.
    """
    derived_keys = derived_keys or {}
    f_keys = frames.select(F.col(frame_key).alias("k")).distinct()
    findings: list[DataFrame] = []

    dup = (
        frames.groupBy(frame_key)
        .count()
        .filter(F.col("count") > 1)
    )
    findings.append(
        _count(dup, "n_affected").select(
            F.lit("duplicate_key").alias("check"),
            F.lit("frames").alias("table_name"),
            "n_affected",
        )
    )

    for name, table in derived.items():
        key = derived_keys.get(name, frame_key)
        d_keys = table.select(F.col(key).alias("k")).distinct()
        missing = f_keys.join(d_keys, "k", "left_anti")
        orphan = d_keys.join(f_keys, "k", "left_anti")
        findings.append(
            _count(missing, "n_affected").select(
                F.lit("missing").alias("check"),
                F.lit(name).alias("table_name"),
                "n_affected",
            )
        )
        findings.append(
            _count(orphan, "n_affected").select(
                F.lit("orphaned").alias("check"),
                F.lit(name).alias("table_name"),
                "n_affected",
            )
        )

    out = findings[0]
    for x in findings[1:]:
        out = out.unionByName(x)
    return out


def heal_plan(report: DataFrame) -> DataFrame:
    """Doctor's repair plan: findings → actions (doctor.rs's heal step:
    a stale/orphaned index is simply rebuilt from frames)."""
    action = (
        F.when(F.col("check") == "missing", "rebuild_derived_table")
        .when(F.col("check") == "orphaned", "vacuum_derived_table")
        # a graph sub-shard with no recorded entry cover (legacy
        # pre-cover index) heals with a cover REWRITE, not a rebuild —
        # the adjacency is fine, only the seed metadata is missing
        .when(F.col("check") == "stale_entry_cover", "refresh_entry_cover")
        .otherwise("dedup_frames")
    )
    return report.filter(F.col("n_affected") > 0).select(
        "table_name", "check", "n_affected", action.alias("action")
    )
