"""Sliding-anchor temporal enrichment (src/analysis/temporal_enrich.rs):
anchor detection priorities/confidences, the supersession state machine,
phrase detection with offsets, and resolution arithmetic."""

from datetime import date

import pytest

from memvid_spark.functions.temporal_enrich import (
    TemporalAnchorTracker,
    detect_anchor_in_line,
    detect_relative_phrases,
    resolve_relative_phrase,
    temporal_mentions,
)

ANCHOR = date(2023, 5, 7)  # a Sunday


def test_anchor_detection_priorities():
    d, src, conf, txt = detect_anchor_in_line("Session 5 (May 7, 2023) notes")
    assert (d, src, conf) == (date(2023, 5, 7), "explicit_header", 0.95)
    d, src, conf, _ = detect_anchor_in_line("[DATE: 2023-05-07] begin")
    assert (d, src, conf) == (date(2023, 5, 7), "explicit_header", 0.95)
    d, src, conf, _ = detect_anchor_in_line("released 2023-05-07 build")
    assert (d, src, conf) == (date(2023, 5, 7), "inline_date", 0.9)
    d, src, conf, _ = detect_anchor_in_line("met on May 7, 2023 at noon")
    assert (d, src, conf) == (date(2023, 5, 7), "inline_date", 0.85)
    d, src, conf, _ = detect_anchor_in_line("due 5/7/23 sharp")
    assert (d, src, conf) == (date(2023, 5, 7), "inline_date", 0.7)
    assert detect_anchor_in_line("no dates here") is None
    # slash 2-digit year pivot: >50 → 1900s
    d, _, _, _ = detect_anchor_in_line("archived 5/7/99")
    assert d == date(1999, 5, 7)


def test_tracker_supersession_rules():
    t = TemporalAnchorTracker()
    assert t.process_line("Session 1 (May 7, 2023)") is not None
    # lower-confidence inline date must NOT supersede the header
    assert t.process_line("logged 2023-01-15 status") is None
    assert t.current == date(2023, 5, 7)
    # a new explicit header ALWAYS supersedes, even at equal confidence
    assert t.process_line("Session 2 (June 1, 2023)") is not None
    assert t.current == date(2023, 6, 1)
    # from empty, any detection seeds the anchor
    t2 = TemporalAnchorTracker()
    assert t2.process_line("due 5/7/23") is not None
    assert t2.confidence == 0.7
    # higher confidence replaces lower
    assert t2.process_line("released 2023-08-01 build") is not None
    assert t2.current == date(2023, 8, 1)


def test_phrase_detection_offsets_sorted():
    text = "we met yesterday and again two days ago; more next friday"
    got = detect_relative_phrases(text)
    assert [(p, o) for p, o, _ in got] == [
        ("yesterday", 7),
        ("two days ago", 27),
        ("next friday", 46),
    ]
    assert all(ln == len(p) for p, _, ln in got)


@pytest.mark.parametrize(
    "phrase,kind,lo,hi",
    [
        ("yesterday", "date", date(2023, 5, 6), date(2023, 5, 6)),
        ("today", "date", ANCHOR, ANCHOR),
        ("tomorrow", "date", date(2023, 5, 8), date(2023, 5, 8)),
        # anchor Sunday: this week = Mon 5/1 .. Sun 5/7
        ("this week", "date_range", date(2023, 5, 1), date(2023, 5, 7)),
        ("last week", "date_range", date(2023, 4, 24), date(2023, 4, 30)),
        ("next week", "date_range", date(2023, 5, 8), date(2023, 5, 14)),
        ("last year", "year", date(2022, 1, 1), date(2022, 12, 31)),
        ("this month", "month", date(2023, 5, 1), date(2023, 5, 31)),
        ("next month", "month", date(2023, 6, 1), date(2023, 6, 30)),
        ("two days ago", "date", date(2023, 5, 5), date(2023, 5, 5)),
        ("a week ago", "date", date(2023, 4, 30), date(2023, 4, 30)),
        ("in 3 days", "date", date(2023, 5, 10), date(2023, 5, 10)),
        ("in two years", "year", date(2025, 1, 1), date(2025, 12, 31)),
        # months shift clamps the day to 28 (reference rule)
        ("3 months ago", "date", date(2023, 2, 7), date(2023, 2, 7)),
        # weekday relative to Sunday anchor: next monday = +1
        ("next monday", "date", date(2023, 5, 8), date(2023, 5, 8)),
        ("last friday", "date", date(2023, 5, 5), date(2023, 5, 5)),
        # "last sunday" when anchor IS sunday: diff 0 → minus 7
        ("last sunday", "date", date(2023, 4, 30), date(2023, 4, 30)),
        # "this" adds the raw weekday diff — backward from a Sunday anchor
        ("this wednesday", "date", date(2023, 5, 3), date(2023, 5, 3)),
    ],
)
def test_resolution(phrase, kind, lo, hi):
    assert resolve_relative_phrase(phrase, ANCHOR) == (kind, lo, hi)


def test_month_clamp_day_28():
    # day 31 anchor, month shift → day pinned to 28
    got = resolve_relative_phrase("1 month ago", date(2023, 5, 31))
    assert got == ("date", date(2023, 4, 28), date(2023, 4, 28))


def test_mentions_spark_pipeline(spark):
    docs = spark.createDataFrame(
        [
            (1, "Session 1 (May 7, 2023)\nwe met yesterday\nlogged 2023-01-15 ok"),
            (2, "no anchor here, but we met yesterday"),
        ],
        "doc_id long, text string",
    )
    rows = temporal_mentions(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # anchorless docs emit nothing
    (m,) = by_doc[1]
    assert m.phrase == "yesterday" and m.anchor_date == "2023-05-07"
    assert m.lo == m.hi == "2023-05-06"
    assert m.anchor_source == "explicit_header" and m.confidence == 0.95
    assert m.char_offset == len("Session 1 (May 7, 2023)\nwe met ")


def test_mention_pruner_composes_with_candidates(spark):
    from memvid_spark.functions.temporal_enrich import mention_pruner
    from memvid_spark.operators.candidates import intersect_candidates

    docs = spark.createDataFrame(
        [
            (1, "Session 1 (May 7, 2023)\nwe met yesterday"),       # 5/6
            (2, "Session 2 (May 20, 2023)\nship in 3 days"),        # 5/23
            (3, "Session 3 (May 7, 2023)\nplanning next month"),    # June
        ],
        "doc_id long, text string",
    )
    mentions = temporal_mentions(docs)
    pruner = mention_pruner(mentions, "2023-05-01", "2023-05-10")
    kept = {r.doc_id for r in intersect_candidates(docs, pruner).collect()}
    assert kept == {1}
    pruner2 = mention_pruner(mentions, "2023-06-01", "2023-06-30")
    kept2 = {r.doc_id for r in intersect_candidates(docs, pruner2).collect()}
    assert kept2 == {3}
