"""SRT/WebVTT parser tests over HAND-WRITTEN fixtures (not the repo's
writer): CRLF line endings, BOM, counter gaps, multi-line cues, VTT cue
identifiers and NOTE/STYLE blocks, '.' vs ',' millisecond separators."""

import pytest

from memvid_spark.sources.subtitles import (
    srt_parse,
    srt_write,
    subtitle_segments,
    vtt_parse,
)

HAND_SRT = (
    "﻿1\r\n"
    "00:00:01,000 --> 00:00:03,500\r\n"
    "First cue\r\n"
    "\r\n"
    "7\r\n"  # counter gap — real files have them
    "00:01:00,250 --> 00:01:02,750\r\n"
    "Second cue line one\r\n"
    "line two\r\n"
    "\r\n"
    "\r\n"  # blank-line run
    "8\r\n"
    "01:00:00,001 --> 01:00:00,999\r\n"
    "Third\r\n"
)


def test_hand_written_srt():
    segs = srt_parse(HAND_SRT)
    assert segs == [
        (0, 1000, 3500, "First cue"),
        (1, 60250, 62750, "Second cue line one\nline two"),
        (2, 3600001, 3600999, "Third"),
    ]


def test_srt_without_counters_and_dot_millis():
    raw = "00:00:00.100 --> 00:00:00.900\nno counter here\n"
    assert srt_parse(raw) == [(0, 100, 900, "no counter here")]


HAND_VTT = (
    "WEBVTT - with a title\n"
    "\n"
    "NOTE\nthis block is a comment and must be skipped\n"
    "\n"
    "STYLE\n::cue { color: red }\n"
    "\n"
    "intro-cue-id\n"
    "00:00:05.000 --> 00:00:07.000 align:start\n"
    "VTT first\n"
    "\n"
    "00:00:08.000 --> 00:00:09.500\n"
    "VTT second\n"
)


def test_hand_written_vtt():
    segs = vtt_parse(HAND_VTT)
    assert segs == [
        (0, 5000, 7000, "VTT first"),
        (1, 8000, 9500, "VTT second"),
    ]
    with pytest.raises(ValueError, match="WEBVTT"):
        vtt_parse("1\n00:00:00,000 --> 00:00:01,000\nnot vtt\n")


def test_writer_parser_roundtrip_and_hour_rollover():
    segs = [(0, 1500, "a"), (3_725_042, 3_726_000, "b\nc")]
    parsed = srt_parse(srt_write(segs))
    assert parsed == [(0, 0, 1500, "a"), (1, 3_725_042, 3_726_000, "b\nc")]
    assert "01:02:05,042" in srt_write(segs)


def test_subtitle_segments_operator(spark):
    subs = spark.createDataFrame(
        [(3, HAND_SRT)], "media_id long, content string"
    )
    rows = subtitle_segments(subs).collect()
    assert [(r["seg_index"], r["t_start_ms"], r["n_words"]) for r in rows] == [
        (0, 1000, 2), (1, 60250, 6), (2, 3600001, 1),
    ]
    assert rows[1]["duration_ms"] == 2500
