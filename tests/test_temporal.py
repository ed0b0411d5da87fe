"""NL temporal resolver golden tests (anchored clock, mirrors
src/analysis/temporal.rs resolver-chain behaviors)."""

from datetime import datetime, timezone

import pytest

from memvid_spark.plans.temporal import TemporalParseError, resolve

# anchor: Wednesday 2024-01-17 12:00 UTC
NOW = datetime(2024, 1, 17, 12, 0, 0, tzinfo=timezone.utc)


def d(*args):
    return datetime(*args, tzinfo=timezone.utc)


@pytest.mark.parametrize(
    "phrase,lo,hi",
    [
        ("today", d(2024, 1, 17), d(2024, 1, 18)),
        ("yesterday", d(2024, 1, 16), d(2024, 1, 17)),
        ("tomorrow", d(2024, 1, 18), d(2024, 1, 19)),
        ("this week", d(2024, 1, 15), d(2024, 1, 22)),
        ("last week", d(2024, 1, 8), d(2024, 1, 15)),
        ("next week", d(2024, 1, 22), d(2024, 1, 29)),
        ("this month", d(2024, 1, 1), d(2024, 2, 1)),
        ("last month", d(2023, 12, 1), d(2024, 1, 1)),
        ("next month", d(2024, 2, 1), d(2024, 3, 1)),
        ("last year", d(2023, 1, 1), d(2024, 1, 1)),
        ("last friday", d(2024, 1, 12), d(2024, 1, 13)),
        ("next friday", d(2024, 1, 19), d(2024, 1, 20)),
        ("last wednesday", d(2024, 1, 10), d(2024, 1, 11)),  # not today
        ("3 days ago", d(2024, 1, 14), d(2024, 1, 15)),
        ("2 weeks ago", d(2024, 1, 3), d(2024, 1, 4)),
        ("3 months ago", d(2023, 10, 17), d(2023, 10, 18)),
        ("90 minutes ago", d(2024, 1, 17, 10, 30), NOW),
        ("in 90 minutes", NOW, d(2024, 1, 17, 13, 30)),
        ("in 2 days", d(2024, 1, 19), d(2024, 1, 20)),
        ("q4 2025", d(2025, 10, 1), d(2026, 1, 1)),
        ("q1 2024", d(2024, 1, 1), d(2024, 4, 1)),
        ("2024", d(2024, 1, 1), d(2025, 1, 1)),
        ("2024-03", d(2024, 3, 1), d(2024, 4, 1)),
        ("2024-03-15", d(2024, 3, 15), d(2024, 3, 16)),
        # 2024-02-01 is a Thursday
        ("first business day of next month", d(2024, 2, 1), d(2024, 2, 2)),
    ],
)
def test_resolve(phrase, lo, hi):
    assert resolve(phrase, NOW) == (lo, hi)


def test_first_business_day_skips_weekend():
    # from May 2024: June 1 is a Saturday → first business day June 3
    now = datetime(2024, 5, 10, tzinfo=timezone.utc)
    lo, hi = resolve("first business day of next month", now)
    assert lo == d(2024, 6, 3)


def test_unknown_phrase_raises():
    with pytest.raises(TemporalParseError):
        resolve("the day the music died", NOW)


def test_asof_join_tie_and_missing_semantics(spark):
    """Inclusive bound: a right row at exactly the left ts is taken;
    among right ties the highest tiebreak wins; no prior right -> null."""
    from pyspark.sql import functions as F

    from memvid_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(100, 7, 1000), (101, 7, 50), (102, 8, 500)],
        "event_id long, user_id long, ts_us long",
    )
    right = spark.createDataFrame(
        [(1, 7, 1000, 5.0), (2, 7, 1000, 9.0), (3, 7, 400, 1.0)],
        "event_id long, user_id long, ts_us long, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(
            left, right, key="user_id", val_col="value", ts_col="ts_us"
        ).collect()
    }
    assert got[100] == 9.0  # tie at ts 1000: inclusive, max event_id wins
    assert got[101] is None  # nothing at or before 50
    assert got[102] is None  # user 8 has no right rows at all
