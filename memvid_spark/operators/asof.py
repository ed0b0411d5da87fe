"""Temporal state operators: current-view, as-of lookup, sessionization.

Reference lineage:
- ``get_current_memory``: latest non-retracted card per entity:slot
  (src/memvid/memory.rs:222-224, supersedes logic
  src/types/memory_card.rs:248-283)
- ``get_memory_at_time``: latest card with effective_ts ≤ t — the as-of
  join (src/memvid/memory.rs:236-243)
- timeline since/until (src/memvid/timeline.rs:20-145)

Here the driver's ``events`` table plays the role of the fact stream:
(user_id, event_type) ≍ (entity, slot), value ≍ card value, ts ≍
effective timestamp. ``ts`` arrives as long nanos (parquet ns read with
nanosAsLong).

Scale: every operator is one window keyed by the entity — a single
uniform shuffle; no driver-side state. Partition-prune by event date at
the source when an as-of bound exists (Catalyst pushes ``ts <= t`` to
parquet row-group min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

GAP_30_MIN_NS = 30 * 60 * 1_000_000_000


def current_state(
    events: DataFrame,
    keys: list[str] = ["user_id", "event_type"],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Latest row per key — the get_current_memory analogue.

    Total order inside each key: (ts desc, event_id desc).
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def as_of(
    events: DataFrame,
    ts_upper: int,
    keys: list[str] = ["user_id", "event_type"],
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """State as of ``ts_upper`` (exclusive): latest row with ts < bound
    per key — time-travel / as-of-join primitive
    (src/types/search.rs:61-65, memory.rs:236-243)."""
    return current_state(
        events.filter(F.col(ts_col) < F.lit(ts_upper)), keys, ts_col, tiebreak_col
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_ns: int = GAP_30_MIN_NS,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign session ids per key with an inactivity-gap rule: a new
    session starts when the gap to the previous event exceeds ``gap_ns``.

    Classic lag + conditional cumsum — two stacked windows over ONE
    partitioning (single shuffle). Output: input + ``session_id``
    (1-based per key).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_ns), 1).otherwise(0)
    return events.withColumn("session_id", F.sum(is_new).over(w))


def timeline(
    events: DataFrame,
    since: int | None = None,
    until: int | None = None,
    reverse: bool = True,
    limit: int = 100,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-ordered scan with since/until/reverse/limit
    (src/memvid/timeline.rs:20-145). Bounds are pushed to the parquet
    scan; the limit compiles to TakeOrderedAndProject."""
    d = events
    if since is not None:
        d = d.filter(F.col(ts_col) >= F.lit(since))
    if until is not None:
        d = d.filter(F.col(ts_col) < F.lit(until))
    order: list[Column] = (
        [F.col(ts_col).desc(), F.col(tiebreak_col).desc()]
        if reverse
        else [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    )
    return d.orderBy(*order).limit(limit)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    val_col: str,
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Two-table as-of join: each left row picks the latest right row
    with ``right.ts <= left.ts`` per key (inclusive) — the trade/quote
    join, generalizing the single-table as-of state of
    ``get_memory_at_time`` (memory.rs:236-243).

    Scalable formulation: tag both inputs, union, ONE window per key
    ordered by (ts, side) with right rows sorting before left rows at
    equal ts, then ``last(value, ignorenulls)`` carries the most recent
    right value forward. One uniform shuffle on the key — no per-row
    subquery, no range join. Right rows are pre-deduped to one per
    (key, ts) (latest tiebreak wins) so tie behavior is deterministic.

    Output: left rows + ``asof_<val_col>`` (null where no right row
    precedes).
    """
    r1 = current_state(right, keys=[key, ts_col], ts_col=ts_col,
                       tiebreak_col=tiebreak_col)
    lt = left.withColumn("_side", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(right.schema[val_col].dataType)
    )
    rt = r1.select(
        F.col(key), F.col(ts_col), F.col(val_col).alias("_rv")
    ).withColumn("_side", F.lit(0))
    cols = lt.columns
    u = lt.select(*cols).unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                 F.col(tiebreak_col).asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    return (
        filled.filter(F.col("_side") == 1)
        .drop("_side", "_rv")
        .withColumnRenamed("_asof", f"asof_{val_col}")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the earliest time each
    step completed STRICTLY AFTER the previous step's completion — the
    classic view→click→purchase conversion query.

    Semantics: t_1 = min ts of step 1; t_i = min ts of step i with
    ts > t_{i-1}. A key enters the funnel only if step 1 occurred;
    ``steps_done`` counts the completed prefix.

    Scale posture: one filtered aggregation per step, every groupBy and
    join keyed on ``key`` — the exchanges co-partition and AQE reuses
    them; no window over the full event stream and no per-key event
    collection (the sequence constraint folds into a conditional min).
    ``ts`` is the engine's epoch-ns long; outputs surface as micros.

    Output: (key, t_<step>_us ... nullable, steps_done).
    """
    # integer div: ns -> us without a double round-trip (epoch-ns exceeds
    # 2^53, a float division would corrupt the low digits)
    us = F.expr(f"{ts_col} div 1000")
    e = events.select(F.col(key), F.col(type_col).alias("_t"), us.alias("_us"))
    cur = (
        e.filter(F.col("_t") == steps[0])
        .groupBy(key)
        .agg(F.min("_us").alias(f"t_{steps[0]}_us"))
    )
    out = cur
    prev_col = f"t_{steps[0]}_us"
    for s in steps[1:]:
        nxt = (
            e.filter(F.col("_t") == s)
            .join(cur, key)
            .filter(F.col("_us") > F.col(prev_col))
            .groupBy(key)
            .agg(F.min("_us").alias(f"t_{s}_us"))
        )
        out = out.join(nxt, key, "left")
        cur = nxt
        prev_col = f"t_{s}_us"
    done = F.lit(1)
    for s in steps[1:]:
        done = done + F.when(F.col(f"t_{s}_us").isNotNull(), 1).otherwise(0)
    return out.withColumn("steps_done", done.cast("int"))
