"""Sliding-anchor temporal enrichment — in-text mention extraction.

Reference: src/analysis/temporal_enrich.rs — the ingestion-time pipeline
that (1) detects explicit date ANCHORS in document text (session
headers, [DATE:] headers, ISO / long-month / short-month / slash dates,
each with its own confidence), (2) propagates the current anchor through
the document with a small state machine (a new detection wins only if
its confidence beats the current anchor's, or it is an explicit header),
(3) detects RELATIVE temporal phrases ("last week", "two days ago",
"next friday") with character offsets, and (4) resolves each phrase
against the anchor in effect, yielding the temporal-mentions table
(types/temporal.rs:84-145; consumed by the temporal index,
src/io/temporal_index.rs:193-380).

Spark shape: the anchor machine is inherently sequential per document,
so :func:`temporal_mentions` runs it in an ``applyInPandas`` over
``groupBy(doc_id)`` — a document's lines are co-located by construction,
the fold is local and bounded by document length, and documents
parallelize freely. Everything else (regexes, resolution arithmetic) is
per-row Python inside the same Arrow batch.

Resolution kinds mirror ``ResolvedTemporal``: date, date_range, year,
month — surfaced as inclusive [lo, hi] ISO dates.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import date, timedelta

from pyspark.sql import DataFrame

# anchor sources (AnchorSource, temporal_enrich.rs:25-35)
EXPLICIT_HEADER = "explicit_header"
INLINE_DATE = "inline_date"

_MONTHS = {
    "january": 1, "jan": 1, "february": 2, "feb": 2, "march": 3, "mar": 3,
    "april": 4, "apr": 4, "may": 5, "june": 6, "jun": 6, "july": 7,
    "jul": 7, "august": 8, "aug": 8, "september": 9, "sep": 9, "sept": 9,
    "october": 10, "oct": 10, "november": 11, "nov": 11, "december": 12,
    "dec": 12,
}

_SESSION_HEADER = re.compile(r"(?i)Session\s+\d+\s*\(([^)]+)\)")
_DATE_HEADER = re.compile(r"(?i)\[(?:SESSION_)?DATE:\s*([^\]]+)\]")
_ISO_DATE = re.compile(r"(\d{4})[/-](\d{1,2})[/-](\d{1,2})")
_LONG_DATE = re.compile(
    r"(?i)(January|February|March|April|May|June|July|August|September"
    r"|October|November|December)\s+(\d{1,2}),?\s+(\d{4})"
)
_SHORT_DATE = re.compile(
    r"(?i)(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\.?"
    r"\s+(\d{1,2}),?\s+(\d{4})"
)
_SLASH_DATE = re.compile(r"(\d{1,2})/(\d{1,2})/(\d{2,4})")

_NUM_WORD = r"\d+|a|one|two|three|four|five|six|seven|eight|nine|ten"
_REL_PATTERNS = [
    re.compile(r"(?i)\b(last|this|next)\s+year\b"),
    re.compile(r"(?i)\b(last|this|next)\s+month\b"),
    re.compile(r"(?i)\b(last|this|next)\s+week\b"),
    re.compile(rf"(?i)\b({_NUM_WORD})\s+(days?|weeks?|months?|years?)\s+ago\b"),
    re.compile(rf"(?i)\bin\s+({_NUM_WORD})\s+(days?|weeks?|months?|years?)\b"),
    re.compile(r"(?i)\b(yesterday|today|tomorrow)\b"),
    re.compile(
        r"(?i)\b(last|this|next)\s+(Monday|Tuesday|Wednesday|Thursday"
        r"|Friday|Saturday|Sunday)\b"
    ),
]
_AGO = re.compile(rf"(?i)\b({_NUM_WORD})\s+(days?|weeks?|months?|years?)\s+ago\b")
_IN_FUTURE = re.compile(rf"(?i)\bin\s+({_NUM_WORD})\s+(days?|weeks?|months?|years?)\b")
_REL_WEEKDAY = re.compile(
    r"(?i)\b(last|this|next)\s+(monday|tuesday|wednesday|thursday|friday"
    r"|saturday|sunday)\b"
)
_WEEKDAY_NUM = {
    "monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3, "friday": 4,
    "saturday": 5, "sunday": 6,
}


def _num_word(s: str) -> int | None:
    s = s.lower()
    words = {"a": 1, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
             "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10}
    if s in words:
        return words[s]
    try:
        return int(s)
    except ValueError:
        return None


def parse_date_string(s: str) -> date | None:
    """Header date formats (temporal_enrich.rs:360-396)."""
    s = s.strip()
    for pat in (r"(\d{4})-(\d{1,2})-(\d{1,2})$", r"(\d{4})/(\d{1,2})/(\d{1,2})"):
        m = re.match(pat, s)
        if m:
            try:
                return date(int(m.group(1)), int(m.group(2)), int(m.group(3)))
            except ValueError:
                return None
    for pat in (_LONG_DATE, _SHORT_DATE):
        m = pat.search(s)
        if m:
            mo = _MONTHS.get(m.group(1).lower())
            if mo:
                try:
                    return date(int(m.group(3)), mo, int(m.group(2)))
                except ValueError:
                    return None
    return None


def detect_anchor_in_line(line: str):
    """→ (date, source, confidence, matched_text) | None, in the
    reference's priority order (temporal_enrich.rs:278-356)."""
    for pat in (_SESSION_HEADER, _DATE_HEADER):
        m = pat.search(line)
        if m:
            d = parse_date_string(m.group(1))
            if d:
                return d, EXPLICIT_HEADER, 0.95, m.group(0)
    m = _ISO_DATE.search(line)
    if m:
        try:
            return (
                date(int(m.group(1)), int(m.group(2)), int(m.group(3))),
                INLINE_DATE, 0.9, m.group(0),
            )
        except ValueError:
            pass
    for pat in (_LONG_DATE, _SHORT_DATE):
        m = pat.search(line)
        if m:
            mo = _MONTHS.get(m.group(1).lower())
            if mo:
                try:
                    return (
                        date(int(m.group(3)), mo, int(m.group(2))),
                        INLINE_DATE, 0.85, m.group(0),
                    )
                except ValueError:
                    pass
    m = _SLASH_DATE.search(line)
    if m:
        y = int(m.group(3))
        if y < 100:
            y += 1900 if y > 50 else 2000
        try:
            return (
                date(y, int(m.group(1)), int(m.group(2))),
                INLINE_DATE, 0.7, m.group(0),
            )
        except ValueError:
            pass
    return None


@dataclass
class TemporalAnchorTracker:
    """Anchor propagation state machine (temporal_enrich.rs:140-226):
    a detection replaces the current anchor only when confidence is
    strictly higher, or the source is an explicit header, or no anchor
    exists yet."""

    current: date | None = None
    source: str | None = None
    confidence: float = 0.0
    text: str | None = None

    def process_line(self, line: str):
        hit = detect_anchor_in_line(line)
        if hit is None:
            return None
        d, src, conf, txt = hit
        if self.current is None or conf > self.confidence or src == EXPLICIT_HEADER:
            self.current, self.source, self.confidence, self.text = d, src, conf, txt
            return hit
        return None


def detect_relative_phrases(text: str) -> list[tuple[str, int, int]]:
    """All relative-phrase matches with (phrase, char_offset, length),
    sorted by position (temporal_enrich.rs:432-484)."""
    out = []
    for pat in _REL_PATTERNS:
        for m in pat.finditer(text):
            out.append((m.group(0), m.start(), len(m.group(0))))
    out.sort(key=lambda t: t[1])
    return out


def _month_shift(anchor: date, months: int) -> date | None:
    total = anchor.year * 12 + anchor.month + months
    y, mo = (total - 1) // 12, (total - 1) % 12 + 1
    try:
        return date(y, mo, min(anchor.day, 28))
    except ValueError:
        return None


def resolve_relative_phrase(phrase: str, anchor: date):
    """→ (kind, lo, hi) with inclusive ISO-date bounds, mirroring
    ResolvedTemporal (temporal_enrich.rs:486-646): year → whole year,
    month → whole month, week phrases → monday..sunday range, day-level
    phrases → a single date; months shift clamps the day to 28 exactly
    as the reference does."""
    lower = phrase.lower()

    def year(y: int):
        return "year", date(y, 1, 1), date(y, 12, 31)

    def month(y: int, mo: int):
        last = (date(y + (mo == 12), mo % 12 + 1, 1) - timedelta(days=1)).day
        return "month", date(y, mo, 1), date(y, mo, last)

    def day(d: date):
        return "date", d, d

    if "last year" in lower:
        return year(anchor.year - 1)
    if "this year" in lower:
        return year(anchor.year)
    if "next year" in lower:
        return year(anchor.year + 1)
    if "last month" in lower:
        y, mo = (anchor.year - 1, 12) if anchor.month == 1 else (anchor.year, anchor.month - 1)
        return month(y, mo)
    if "this month" in lower:
        return month(anchor.year, anchor.month)
    if "next month" in lower:
        y, mo = (anchor.year + 1, 1) if anchor.month == 12 else (anchor.year, anchor.month + 1)
        return month(y, mo)
    if "last week" in lower:
        start = anchor - timedelta(days=7 + anchor.weekday())
        return "date_range", start, start + timedelta(days=6)
    if "this week" in lower:
        start = anchor - timedelta(days=anchor.weekday())
        return "date_range", start, start + timedelta(days=6)
    if "next week" in lower:
        start = anchor + timedelta(days=7 - anchor.weekday())
        return "date_range", start, start + timedelta(days=6)
    if lower == "yesterday":
        return day(anchor - timedelta(days=1))
    if lower == "today":
        return day(anchor)
    if lower == "tomorrow":
        return day(anchor + timedelta(days=1))
    m = _AGO.search(lower)
    if m:
        n = _num_word(m.group(1))
        unit = m.group(2)
        if n is None:
            return None
        if unit.startswith("day"):
            return day(anchor - timedelta(days=n))
        if unit.startswith("week"):
            return day(anchor - timedelta(weeks=n))
        if unit.startswith("month"):
            d = _month_shift(anchor, -n)
            return day(d) if d else None
        if unit.startswith("year"):
            return year(anchor.year - n)
    m = _IN_FUTURE.search(lower)
    if m:
        n = _num_word(m.group(1))
        unit = m.group(2)
        if n is None:
            return None
        if unit.startswith("day"):
            return day(anchor + timedelta(days=n))
        if unit.startswith("week"):
            return day(anchor + timedelta(weeks=n))
        if unit.startswith("month"):
            d = _month_shift(anchor, n)
            return day(d) if d else None
        if unit.startswith("year"):
            return year(anchor.year + n)
    m = _REL_WEEKDAY.search(lower)
    if m:
        diff = _WEEKDAY_NUM[m.group(2)] - anchor.weekday()
        if m.group(1) == "last":
            if diff >= 0:
                diff -= 7
        elif m.group(1) == "next":
            if diff <= 0:
                diff += 7
        return day(anchor + timedelta(days=diff))
    return None


MENTIONS_SCHEMA = (
    "doc_id long, phrase string, char_offset long, length int, "
    "anchor_date string, anchor_source string, confidence double, "
    "kind string, lo string, hi string"
)


def mention_pruner(
    mentions: DataFrame, lo: str, hi: str, id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pruner over the mentions table: docs with at least one
    resolved mention overlapping the inclusive ISO-date query range —
    feed it to operators.candidates.intersect_candidates (the temporal
    pruner slot, src/memvid/search/mod.rs:84-230; temporal index reads
    src/io/temporal_index.rs:193-380). Pure filter + distinct; ISO
    strings compare lexicographically so this pushes to the scan."""
    from pyspark.sql import functions as F

    return (
        mentions.filter((F.col("lo") <= hi) & (F.col("hi") >= lo))
        .select(id_col)
        .distinct()
    )


def temporal_mentions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Documents → temporal-mentions table: per doc, run the anchor
    machine over lines, then resolve every detected relative phrase
    against the anchor in effect (enrich_chunk, temporal_enrich.rs:
    656-732). Docs with no anchor emit no mentions (nothing to resolve
    against). One applyInPandas group per document."""

    def run(pdf):
        import pandas as pd

        rows = []
        for doc_id, text in zip(pdf[id_col], pdf[text_col]):
            tracker = TemporalAnchorTracker()
            for line in (text or "").split("\n"):
                tracker.process_line(line)
            if tracker.current is None:
                continue
            for phrase, off, ln in detect_relative_phrases(text):
                resolved = resolve_relative_phrase(phrase, tracker.current)
                if resolved is None:
                    continue
                kind, lo, hi = resolved
                rows.append(
                    (doc_id, phrase, off, ln, tracker.current.isoformat(),
                     tracker.source, round(tracker.confidence, 2), kind,
                     lo.isoformat(), hi.isoformat())
                )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "phrase", "char_offset", "length",
                     "anchor_date", "anchor_source", "confidence", "kind",
                     "lo", "hi"],
        )

    return docs.select(id_col, text_col).groupBy(id_col).applyInPandas(
        run, MENTIONS_SCHEMA
    )
