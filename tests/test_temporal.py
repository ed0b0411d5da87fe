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
        # instant, not a range: temporal.rs:151-153 datetime_resolution
        ("in 90 minutes", d(2024, 1, 17, 13, 30), d(2024, 1, 17, 13, 30)),
        ("in 2 days", d(2024, 1, 19), d(2024, 1, 20)),
        ("q4 2025", d(2025, 10, 1), d(2026, 1, 1)),
        ("q1 2024", d(2024, 1, 1), d(2024, 4, 1)),
        ("2024", d(2024, 1, 1), d(2025, 1, 1)),
        ("2024-03", d(2024, 3, 1), d(2024, 4, 1)),
        ("2024-03-15", d(2024, 3, 15), d(2024, 3, 16)),
        # 2024-02-01 is a Thursday
        ("first business day of next month", d(2024, 2, 1), d(2024, 2, 2)),
        ("the first business day of next month", d(2024, 2, 1), d(2024, 2, 2)),
        # --- extended families (temporal.rs:132-607) ---
        # word numbers (parse_number :718-737)
        ("two days ago", d(2024, 1, 15), d(2024, 1, 16)),
        ("in three days", d(2024, 1, 20), d(2024, 1, 21)),
        ("two weeks from now", d(2024, 1, 31), d(2024, 2, 1)),
        ("2 weeks from now", d(2024, 1, 31), d(2024, 2, 1)),
        # weekday families (:207-262): iterated, this-, bare
        ("two fridays ago", d(2024, 1, 5), d(2024, 1, 6)),
        ("this friday", d(2024, 1, 19), d(2024, 1, 20)),
        ("this monday", d(2024, 1, 15), d(2024, 1, 16)),
        ("saturday", d(2024, 1, 20), d(2024, 1, 21)),
        # month-edge phrases (:147-148, 465-480)
        ("end of this month", d(2024, 1, 31), d(2024, 2, 1)),
        ("start of next month", d(2024, 2, 1), d(2024, 2, 2)),
        # calendar-day clamp: Jan 31 − 3mo → Oct 31; Mar 30 2024 − 1mo → Feb 29
        ("3 months ago", d(2023, 10, 17), d(2023, 10, 18)),
        # clock instants (:151-155, 263-310, 529-559) — zero-length bounds
        ("at 5pm today", d(2024, 1, 17, 17), d(2024, 1, 17, 17)),
        ("today at 9:30", d(2024, 1, 17, 9, 30), d(2024, 1, 17, 9, 30)),
        ("today at 12am", d(2024, 1, 17, 0), d(2024, 1, 17, 0)),
        ("at 12pm today", d(2024, 1, 17, 12), d(2024, 1, 17, 12)),
        ("today at 7 p.m.", d(2024, 1, 17, 19), d(2024, 1, 17, 19)),
        ("friday at 5pm", d(2024, 1, 19, 17), d(2024, 1, 19, 17)),
        ("wednesday at 8am", d(2024, 1, 17, 8), d(2024, 1, 17, 8)),  # on-or-after: today
        ("next friday at 5pm", d(2024, 1, 19, 17), d(2024, 1, 19, 17)),
        ("midnight tomorrow", d(2024, 1, 18, 0), d(2024, 1, 18, 0)),
        # following-week weekday instants (:160-162, 545-552)
        ("noon next tuesday", d(2024, 1, 30, 12), d(2024, 1, 30, 12)),
        ("midnight next friday", d(2024, 1, 26, 0), d(2024, 1, 26, 0)),
        # hour windows (:155, 495-502)
        ("in the last 24 hours", d(2024, 1, 16, 12), d(2024, 1, 17, 12)),
        ("in the last two hours", d(2024, 1, 17, 10), d(2024, 1, 17, 12)),
        ("this morning", d(2024, 1, 17, 6), d(2024, 1, 17, 12)),
        # sunday after next (:157, 510-516)
        ("on the sunday after next", d(2024, 1, 28), d(2024, 1, 29)),
        # quarters (:335-378, 579-588)
        ("q4 2025", d(2025, 10, 1), d(2026, 1, 1)),
        ("fourth quarter of 2025", d(2025, 10, 1), d(2026, 1, 1)),
        ("second quarter 2024", d(2024, 4, 1), d(2024, 7, 1)),
        ("end of q3", d(2024, 9, 30), d(2024, 10, 1)),
        # numeric dates (:311-334): M/D/YY(YY), 2-digit year → 2000+
        ("1/5/2024", d(2024, 1, 5), d(2024, 1, 6)),
        ("11/30/24", d(2024, 11, 30), d(2024, 12, 1)),
        ("year 2024", d(2024, 1, 1), d(2025, 1, 1)),
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


def test_month_offset_clamps_to_short_month():
    # date_with_month_offset clamps the day (temporal.rs:471-480):
    # May 31 − 3 months → Feb 29 (2024 is a leap year)
    lo, hi = resolve("3 months ago", d(2024, 5, 31, 12, 0))
    assert (lo, hi) == (d(2024, 2, 29), d(2024, 3, 1))


def test_invalid_calendar_date_rejected():
    with pytest.raises(TemporalParseError):
        resolve("2/30/2024", NOW)
    with pytest.raises(TemporalParseError):
        resolve("13/1/2024", NOW)


def test_clock_hour_validation():
    with pytest.raises(TemporalParseError):
        resolve("today at 13pm", NOW)  # 12-hour clock with marker
    with pytest.raises(TemporalParseError):
        resolve("today at 25", NOW)
