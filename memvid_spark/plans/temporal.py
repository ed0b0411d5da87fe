"""Natural-language temporal phrase resolver → UTC timestamp bounds.

Reference: src/analysis/temporal.rs:92-607 — a resolver chain mapping
phrases ("today", "last friday", "two fridays ago", "3 months ago",
"q4 2025", "fourth quarter of 2025", "end of q3", "in 90 minutes",
"in the last 24 hours", "this morning", "noon next tuesday",
"friday at 5pm", "midnight tomorrow", "on the sunday after next",
"first business day of next month", numeric M/D/YY dates, word numbers
"two days ago") to concrete values against an anchor clock.

Deterministic, driver-side, anchored: callers pass ``now`` explicitly
(the reference anchors relative phrases at ingestion time,
src/analysis/temporal_enrich.rs). The resolved (lo, hi) bounds become
plain pushed-down filters — the streaming/ingest analogue of a
watermark-anchored clock.

Returns half-open [lo, hi) datetime bounds in UTC. The reference's
resolution kinds map onto bounds as: Date → that day's [00:00, +1d);
DateRange → [start 00:00, end+1d 00:00); DateTime (an instant, e.g.
"in 90 minutes", "at 5pm today") → the zero-length [t, t);
DateTimeRange with inclusive second end → [start, end+1s).

Out of scope (documented non-goal): "next daylight saving change"
(temporal.rs:517-528) needs a tz database; everything else in the
reference's fixed-phrase and pattern tables resolves here.
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
# parse_number (temporal.rs:718-737): digits or one..twelve
_WORD_NUMS = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5, "six": 6,
    "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11, "twelve": 12,
}
_NUM_RE = r"(\d+|" + "|".join(_WORD_NUMS) + ")"
_ORDINAL_QUARTERS = {"first": 1, "second": 2, "third": 3, "fourth": 4}


class TemporalParseError(ValueError):
    pass


def _num(tok: str) -> int:
    return int(tok) if tok.isdigit() else _WORD_NUMS[tok]


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


def _last_dom(y: int, m: int) -> int:
    nxt = datetime(y + (m == 12), m % 12 + 1, 1)
    return (nxt - timedelta(days=1)).day


def _month_offset_clamped(now: datetime, n: int) -> datetime:
    """Same calendar day n months away, clamped to the target month's
    length (date_with_month_offset, temporal.rs:471-480)."""
    base = _add_months(_month_start(now), n)
    return base.replace(day=min(now.day, _last_dom(base.year, base.month)))


def _next_weekday_after(d: datetime, target: int) -> datetime:
    d = d + timedelta(days=1)
    while d.weekday() != target:
        d += timedelta(days=1)
    return d


def _prev_weekday_before(d: datetime, target: int) -> datetime:
    d = d - timedelta(days=1)
    while d.weekday() != target:
        d -= timedelta(days=1)
    return d


def _on_or_after(d: datetime, target: int) -> datetime:
    while d.weekday() != target:
        d += timedelta(days=1)
    return d


def _at(d: datetime, hour: int, minute: int = 0) -> datetime:
    return d.replace(hour=hour, minute=minute, second=0, microsecond=0)


def _instant(t: datetime) -> tuple[datetime, datetime]:
    return t, t


def _convert_hour(hour: int, ampm: str | None) -> int:
    """12-hour → 24-hour (convert_hour, temporal.rs:752-776)."""
    if ampm:
        if not 1 <= hour <= 12:
            raise TemporalParseError(f"bad clock hour {hour}")
        if ampm == "pm":
            return 12 if hour == 12 else hour + 12
        return 0 if hour == 12 else hour
    if not 0 <= hour <= 23:
        raise TemporalParseError(f"bad clock hour {hour}")
    return hour


def _quarter_bounds(y: int, q: int) -> tuple[datetime, datetime]:
    lo = datetime(y, 3 * (q - 1) + 1, 1, tzinfo=timezone.utc)
    return lo, _add_months(lo, 3)


_CLOCK = r"(\d{1,2})(?::(\d{2}))?\s*(am|pm)?"


def resolve(phrase: str, now: datetime) -> tuple[datetime, datetime]:
    """Resolve a phrase to half-open UTC bounds [lo, hi)."""
    if now.tzinfo is None:
        now = now.replace(tzinfo=timezone.utc)
    # sanitize_ampm (temporal.rs:777-784)
    p = (
        phrase.strip().lower()
        .replace("a.m.", "am").replace("p.m.", "pm")
        .replace("a.m", "am").replace("p.m", "pm")
    )

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

    # fixed phrases (temporal.rs:132-169)
    if p == "end of this month":
        return _day(now.replace(day=_last_dom(now.year, now.month)))
    if p == "start of next month":
        return _day(_add_months(_month_start(now), 1))
    if p == "this morning":  # 06:00 → 11:59:59 inclusive (morning_range)
        return _at(now, 6), _at(now, 12)
    if p == "midnight tomorrow":
        return _instant(_at(now + timedelta(days=1), 0))
    if p == "on the sunday after next":
        return _day(_next_weekday_after(now, 6) + timedelta(days=7))
    if p in ("first business day of next month",
             "the first business day of next month"):
        lo = _add_months(_month_start(now), 1)
        while lo.weekday() >= 5:
            lo += timedelta(days=1)
        return _day(lo)

    # "in the last N hours" (last_hours_range)
    m = re.fullmatch(rf"in the last {_NUM_RE} hours?", p)
    if m:
        return now - _num(m.group(1)) * _UNITS["hour"], now

    # weekday families (resolve_weekday_phrases, temporal.rs:207-262)
    m = re.fullmatch(r"(last|next|this)\s+(\w+day)", p)
    if m and m.group(2) in _WEEKDAYS:
        target = _WEEKDAYS.index(m.group(2))
        if m.group(1) == "last":
            return _day(_prev_weekday_before(now, target))
        if m.group(1) == "next":
            return _day(_next_weekday_after(now, target))
        # "this X": week-start-aligned (this_weekday; week starts monday)
        return _day(_day(now - timedelta(days=now.weekday()))[0] + timedelta(days=target))

    m = re.fullmatch(rf"{_NUM_RE}\s+(\w+day)s\s+ago", p)
    if m and m.group(2) in _WEEKDAYS:  # "two fridays ago"
        target, d = _WEEKDAYS.index(m.group(2)), now
        for _ in range(_num(m.group(1))):
            d = _prev_weekday_before(d, target)
        return _day(d)

    m = re.fullmatch(rf"(?:(next)\s+)?(\w+day)\s+at\s+{_CLOCK}", p)
    if m and m.group(2) in _WEEKDAYS:  # "[next ]friday at 5pm"
        target = _WEEKDAYS.index(m.group(2))
        hour = _convert_hour(int(m.group(3)), m.group(5))
        minute = int(m.group(4) or 0)
        d = _next_weekday_after(now, target) if m.group(1) else _on_or_after(now, target)
        return _instant(_at(d, hour, minute))

    m = re.fullmatch(r"(noon|midnight)\s+next\s+(\w+day)", p)
    if m and m.group(2) in _WEEKDAYS:  # following week (temporal.rs:160-162,545)
        target = _WEEKDAYS.index(m.group(2))
        d = _next_weekday_after(now, target) + timedelta(days=7)
        return _instant(_at(d, 12 if m.group(1) == "noon" else 0))

    if p in _WEEKDAYS:  # bare weekday → this_weekday
        target = _WEEKDAYS.index(p)
        return _day(_day(now - timedelta(days=now.weekday()))[0] + timedelta(days=target))

    # clock phrases (resolve_clock_phrases, temporal.rs:263-310)
    m = re.fullmatch(rf"at {_CLOCK} today", p) or re.fullmatch(
        rf"today at {_CLOCK}", p
    )
    if m:
        hour = _convert_hour(int(m.group(1)), m.group(3))
        return _instant(_at(now, hour, int(m.group(2) or 0)))

    # relative counts (word numbers allowed — temporal.rs:171-206)
    m = re.fullmatch(rf"{_NUM_RE}\s+(minute|hour|day|week|month)s?\s+ago", p)
    if m:
        n, unit = _num(m.group(1)), m.group(2)
        if unit == "month":
            return _day(_month_offset_clamped(now, -n))
        point = now - n * _UNITS[unit]
        if unit in ("minute", "hour"):
            return point, now
        return _day(point)

    m = re.fullmatch(rf"in\s+{_NUM_RE}\s+(minute|hour|day|week)s?", p)
    if m:
        n, unit = _num(m.group(1)), m.group(2)
        if unit in ("minute", "hour"):
            # instant: "in 90 minutes" → anchor + 90min (temporal.rs:151-153)
            return _instant(now + n * _UNITS[unit])
        return _day(now + n * _UNITS[unit])

    m = re.fullmatch(rf"{_NUM_RE}\s+weeks?\s+from\s+now", p)
    if m:
        return _day(now + _num(m.group(1)) * _UNITS["week"])

    # quarters (temporal.rs:335-378,579-588)
    m = re.fullmatch(r"q([1-4])\s+(\d{4})", p)
    if m:
        return _quarter_bounds(int(m.group(2)), int(m.group(1)))
    m = re.fullmatch(r"(first|second|third|fourth)\s+quarter(?:\s+of)?\s+(\d{4})", p)
    if m:
        return _quarter_bounds(int(m.group(2)), _ORDINAL_QUARTERS[m.group(1)])
    m = re.fullmatch(r"end of q([1-4])", p)
    if m:  # last day of that quarter in the anchor year (end_of_quarter)
        _, hi = _quarter_bounds(now.year, int(m.group(1)))
        return _day(hi - timedelta(days=1))

    # numeric M/D/YY(YY) (resolve_numeric_date, temporal.rs:311-334)
    m = re.fullmatch(r"(\d{1,2})/(\d{1,2})/(\d{2}|\d{4})", p)
    if m:
        mo, d = int(m.group(1)), int(m.group(2))
        y = int(m.group(3)) + (2000 if len(m.group(3)) == 2 else 0)
        if not (1 <= mo <= 12) or not (1 <= d <= _last_dom(y, mo)):
            raise TemporalParseError(f"bad calendar date: {phrase!r}")
        return _day(datetime(y, mo, d, tzinfo=timezone.utc))

    # ISO prefixes + "year YYYY" (resolve_year, temporal.rs:379-388)
    m = re.fullmatch(r"(?:year )?(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?", p)
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
