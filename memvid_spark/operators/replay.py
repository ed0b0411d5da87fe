"""Replay track: recorded agent sessions, deterministic re-execution,
checkpoints, divergence diff.

Reference: ReplayAction / Checkpoint / StateSnapshot types
(src/replay/types.rs:21-275) and the replay engine's deterministic
re-execution with divergence detection between a recorded session and a
re-run (src/replay/engine.rs:118-637); search-time as-of cuts restrict
candidates to frames known at a given action (src/memvid/search/
mod.rs:155-187).

Spark design: the action log is a plain table
``(session_id, seq, action_type, params, value, ts_us)``; re-execution
determinism is carried by cumulative state hashes (every action folds
its fingerprint into the running session hash — a window aggregation),
and divergence between two sessions is a seq-aligned full outer join.
All column expressions; shuffles only on session_id — the natural
partition key at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hash64


def actions_from_events(events: DataFrame) -> DataFrame:
    """Adapt the events stream into a replay action log: one session per
    user, seq by event time (ties broken on event_id), event payload as
    action params. events.ts arrives as parquet-ns long (catalog)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("user_id").alias("session_id"),
        F.row_number().over(w).alias("seq"),
        F.col("event_type").alias("action_type"),
        F.col("props").alias("params"),
        F.col("value"),
        F.expr("ts div 1000").alias("ts_us"),  # integer div: ns→µs lossless
    )


def session_log(actions: DataFrame, session_id: int) -> DataFrame:
    """One session's ordered action list (replay_session's input)."""
    return actions.filter(F.col("session_id") == session_id).orderBy("seq")


def as_of_cut(actions: DataFrame, session_id: int, max_seq: int) -> DataFrame:
    """Deterministic re-execution prefix: the session as of action N
    (the replay analogue of as_of_frame candidate cuts)."""
    return session_log(actions, session_id).filter(F.col("seq") <= max_seq)


def action_fingerprint() -> F.Column:
    """Stable per-action fingerprint over everything that must replay
    identically (type, params, value in integer cents — float→string
    formatting is not portable across engines, integers are)."""
    return hash64(
        F.concat_ws(
            "\x1f",
            F.col("action_type"),
            F.coalesce(F.col("params"), F.lit("")),
            F.round(F.col("value") * 100).cast("long").cast("string"),
        )
    )


def replay_checkpoints(actions: DataFrame, every: int = 5) -> DataFrame:
    """Checkpoint rows: every Nth action per session, carrying the
    cumulative state hash (fold of all fingerprints ≤ seq) — the
    StateSnapshot integrity analogue (replay/types.rs). A re-run whose
    checkpoints match replayed deterministically.

    Output: (session_id, seq, n_actions, state_hash).
    """
    wcum = (
        Window.partitionBy("session_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fp = actions.withColumn("fp", action_fingerprint())
    cum = fp.select(
        "session_id",
        "seq",
        F.count("*").over(wcum).alias("n_actions"),
        hash64(
            F.concat_ws("|", F.collect_list(F.col("fp").cast("string")).over(wcum))
        ).alias("state_hash"),
    )
    return cum.filter(F.col("seq") % every == 0)


def divergence_diff(run_a: DataFrame, run_b: DataFrame) -> DataFrame:
    """Seq-aligned divergence between two runs of "the same" session
    (engine.rs's replay diff): full outer join on seq; statuses
    ``same`` / ``diverged`` (both present, different fingerprint),
    ``only_a`` / ``only_b`` (length mismatch).

    Output: (seq, status, a_type, b_type).
    """
    a = run_a.select(
        "seq",
        F.col("action_type").alias("a_type"),
        action_fingerprint().alias("a_fp"),
    )
    b = run_b.select(
        "seq",
        F.col("action_type").alias("b_type"),
        action_fingerprint().alias("b_fp"),
    )
    j = a.join(b, "seq", "full_outer")
    status = (
        F.when(F.col("a_fp").isNull(), "only_b")
        .when(F.col("b_fp").isNull(), "only_a")
        .when(F.col("a_fp") == F.col("b_fp"), "same")
        .otherwise("diverged")
    )
    return j.select(
        "seq",
        status.alias("status"),
        F.coalesce("a_type", F.lit("")).alias("a_type"),
        F.coalesce("b_type", F.lit("")).alias("b_type"),
    )
