"""Skew tools: salted two-phase aggregation and partitioned table writes.

The 100 TB posture (SURVEY §7): skewed keys — a boilerplate document
duplicated millions of times, one hot tenant, one hot token — turn a
single reducer into the job's critical path. AQE's skew-join splitting
covers joins; for *aggregations* the classic fix is salting: phase 1
aggregates on (key, salt) so the hot key's rows spread over N reducers,
phase 2 merges the N partials per key. Results are identical to the
direct aggregation (floating-point sums excepted — we round at the
boundary like everywhere else in the engine).

``write_partitioned`` is the layout half of the posture: derived tables
land partitioned by a low-cardinality column (event date, track, format)
so every time/track-filtered query prunes partitions at plan time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count + sum of ``value_col`` per
    ``key_col``. Phase 1 groups on (key, salt = crc32(row-identity) %
    n_salts) — deterministic, no rand() so re-execution of a lost
    partition reproduces the same salt; phase 2 merges partials.

    Output: (key_col, n_rows, total 2dp) — identical to the direct
    groupBy, proven by the oracle.
    """
    salt = F.crc32(F.col(value_col).cast("string")) % n_salts
    phase1 = (
        df.select(F.col(key_col), F.col(value_col), salt.alias("_salt"))
        .groupBy(key_col, "_salt")
        .agg(
            F.count("*").alias("_n"),
            F.sum(value_col).alias("_s"),
        )
    )
    return (
        phase1.groupBy(key_col)
        .agg(
            F.sum("_n").cast("long").alias("n_rows"),
            F.round(F.sum("_s"), 2).alias("total"),
        )
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
) -> None:
    """Partitioned Parquet layout for derived tables — the scan side of
    partition pruning. Callers pick a low-cardinality column (a date
    bucket, track, format); high-cardinality partitioning would create
    a small-files problem instead."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_pruned(spark, path: str, **partition_filters):
    """Read back with partition-pruning filters applied before the scan
    (verifiable via PushedFilters/PartitionFilters in explain)."""
    df = spark.read.parquet(path)
    for col, val in partition_filters.items():
        df = df.filter(F.col(col) == val)
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Bucketed layout for co-located joins: both sides of a recurring
    equi-join written with the same bucket spec join WITHOUT a shuffle
    (SortMergeJoin with no Exchange) — the join half of the 100 TB
    posture. Hive-style bucketing via saveAsTable (bucket metadata needs
    a catalog table, not a bare path)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def zorder_key(x, y, bits: int = 16):
    """Morton/Z-order interleave of two non-negative int columns (each
    truncated to ``bits`` low bits) — pure JVM fold, no Python.

    The data-layout key behind multi-column clustering (Delta/Iceberg
    OPTIMIZE ZORDER): rows close in (x, y) land close in z, so file
    min/max statistics prune scans filtered on EITHER column — the
    standard warehouse answer to 'which single sort order serves two
    filter columns'."""
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, b) -> "
        f"acc + shiftleft(bigint(({x} >> b) & 1), 2 * b) "
        f"+ shiftleft(bigint(({y} >> b) & 1), 2 * b + 1))"
    )


def cluster_by_zorder(
    df: DataFrame, x_col: str, y_col: str, n_partitions: int = 32,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort by the z-key: every output partition then
    covers a compact (x, y) rectangle, so per-file column min/max stats
    are tight on BOTH columns. Write the result with write_partitioned/
    plain parquet and filters on either column prune files."""
    keyed = df.withColumn("_z", zorder_key(x_col, y_col, bits))
    return (
        keyed.repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_expr: Column | None = None,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: scatter the big side's hot keys over
    ``n_salts`` composite keys and replicate the small side to match —
    the classic remedy when a shuffle join's hottest key overwhelms one
    reducer and the small side is too large to broadcast outright.

    The salt comes from ``salt_expr`` (default:
    ``monotonically_increasing_id()`` — row-varying, so a hot key's
    rows genuinely spread over all ``n_salts`` reducers; a key-derived
    salt would give every row of the hot key the SAME salt and defeat
    the point). It is deterministic for a given partition layout (no
    rand()) so task retries reproduce the same placement, and it never
    escapes: the joined multiset is IDENTICAL to the plain join (the
    q165 oracle proves it end-to-end). AQE's skew-join split is the
    runtime flavor of the same idea; this is the explicit,
    planner-independent form that also covers aggregate-after-join
    pipelines AQE won't split.
    """
    if salt_expr is None:
        salt_expr = F.monotonically_increasing_id()
    salt = (F.crc32(salt_expr.cast("string")) % n_salts).cast("int")
    big2 = big.withColumn("_salt", salt)
    small2 = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return big2.join(small2, [on, "_salt"]).drop("_salt")
