"""Natural-language temporal phrase resolver → UTC timestamp bounds.

Reference: src/analysis/temporal.rs:92-240+ — a resolver chain mapping
phrases ("today", "yesterday", "last friday", "3 months ago",
"q4 2025", "in 90 minutes", "first business day of next month",
ISO prefixes) to concrete ranges against an anchor clock.

Deterministic, driver-side, anchored: callers pass ``now`` explicitly
(the reference anchors relative phrases at ingestion time,
src/analysis/temporal_enrich.rs). The resolved (lo, hi) bounds become
plain pushed-down filters — the streaming/ingest analogue of a
watermark-anchored clock.

Returns half-open [lo, hi) datetime bounds in UTC.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

_WEEKDAYS = ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"]
_UNITS = {
    "minute": timedelta(minutes=1),
    "hour": timedelta(hours=1),
    "day": timedelta(days=1),
    "week": timedelta(weeks=1),
}


class TemporalParseError(ValueError):
    pass


def _day(d: datetime) -> tuple[datetime, datetime]:
    lo = d.replace(hour=0, minute=0, second=0, microsecond=0)
    return lo, lo + timedelta(days=1)


def _month_start(d: datetime) -> datetime:
    return d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)


def _add_months(d: datetime, n: int) -> datetime:
    y, m = d.year, d.month + n
    y += (m - 1) // 12
    m = (m - 1) % 12 + 1
    return d.replace(year=y, month=m, day=1, hour=0, minute=0, second=0, microsecond=0)


def resolve(phrase: str, now: datetime) -> tuple[datetime, datetime]:
    """Resolve a phrase to half-open UTC bounds [lo, hi)."""
    if now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    p = phrase.strip().lower()

    if p == "now":
        return now, now
    if p == "today":
        return _day(now)
    if p == "yesterday":
        return _day(now - timedelta(days=1))
    if p == "tomorrow":
        return _day(now + timedelta(days=1))

    if p in ("this week", "last week", "next week"):
        week_lo = _day(now - timedelta(days=now.weekday()))[0]
        shift = {"this week": 0, "last week": -7, "next week": 7}[p]
        lo = week_lo + timedelta(days=shift)
        return lo, lo + timedelta(days=7)

    if p in ("this month", "last month", "next month"):
        base = _month_start(now)
        shift = {"this month": 0, "last month": -1, "next month": 1}[p]
        lo = _add_months(base, shift)
        return lo, _add_months(lo, 1)

    if p in ("this year", "last year", "next year"):
        shift = {"this year": 0, "last year": -1, "next year": 1}[p]
        lo = now.replace(
            year=now.year + shift, month=1, day=1, hour=0, minute=0, second=0, microsecond=0
        )
        return lo, lo.replace(year=lo.year + 1)

    m = re.fullmatch(r"(last|next)\s+(\w+day)", p)
    if m and m.group(2) in _WEEKDAYS:
        target = _WEEKDAYS.index(m.group(2))
        delta = (now.weekday() - target) % 7
        if m.group(1) == "last":
            delta = 7 if delta == 0 else delta
            return _day(now - timedelta(days=delta))
        ahead = (target - now.weekday()) % 7
        ahead = 7 if ahead == 0 else ahead
        return _day(now + timedelta(days=ahead))

    m = re.fullmatch(r"(\d+)\s+(minute|hour|day|week|month)s?\s+ago", p)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit == "month":
            point = _add_months(_month_start(now), -n) + (now - _month_start(now))
        else:
            point = now - n * _UNITS[unit]
        if unit in ("minute", "hour"):
            return point, now
        return _day(point)

    m = re.fullmatch(r"in\s+(\d+)\s+(minute|hour|day|week)s?", p)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        point = now + n * _UNITS[unit]
        if unit in ("minute", "hour"):
            return now, point
        return _day(point)

    m = re.fullmatch(r"q([1-4])\s+(\d{4})", p)
    if m:
        q, y = int(m.group(1)), int(m.group(2))
        lo = datetime(y, 3 * (q - 1) + 1, 1, tzinfo=timezone.utc)
        return lo, _add_months(lo, 3)

    if p == "first business day of next month":
        lo = _add_months(_month_start(now), 1)
        while lo.weekday() >= 5:
            lo += timedelta(days=1)
        return _day(lo)

    m = re.fullmatch(r"(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?", p)
    if m:
        y = int(m.group(1))
        if m.group(3):
            return _day(datetime(y, int(m.group(2)), int(m.group(3)), tzinfo=timezone.utc))
        if m.group(2):
            lo = datetime(y, int(m.group(2)), 1, tzinfo=timezone.utc)
            return lo, _add_months(lo, 1)
        lo = datetime(y, 1, 1, tzinfo=timezone.utc)
        return lo, datetime(y + 1, 1, 1, tzinfo=timezone.utc)

    raise TemporalParseError(f"unrecognized temporal phrase: {phrase!r}")


def resolve_ns(phrase: str, now: datetime) -> tuple[int, int]:
    """Bounds as unix nanoseconds — directly filterable against the
    nanos-as-long events ``ts`` column."""
    lo, hi = resolve(phrase, now)
    return int(lo.timestamp() * 1_000_000) * 1000, int(hi.timestamp() * 1_000_000) * 1000
