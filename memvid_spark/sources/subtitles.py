"""SRT / WebVTT subtitle parsing: the text half of audio/video training
pairs.

Reference parity: the reference emits timed text segments from media
(src/whisper.rs:49-116 — (t_start, t_end, text) triples); subtitle
files are the same shape arriving as data, and a multimodal training
pipeline aligns them with demuxed samples (sources/video.py) or audio
segments (sources/audio.py) by time range. Parsers are strict about
timestamps but tolerant of the real-world mess: CRLF, BOM, blank-line
runs, out-of-order indices (SRT), cue identifiers and NOTE/STYLE blocks
(VTT), multi-line cue text.

Scale: parsing runs per Arrow batch in mapInPandas; output is a
columnar segment table keyed by media id — joinable against manifest /
segment tables with an equi- or range-join, never a UDF in the join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SRT_TS = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})"
)


def _ms(h: str, m: str, s: str, ms: str) -> int:
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def srt_parse(text: str) -> list[tuple[int, int, int, str]]:
    """Parse SubRip: blocks of [index, timing line, text lines...]
    separated by blank lines → (seg_index, t_start_ms, t_end_ms, text).
    seg_index is re-numbered 0-based in file order (real files carry
    gaps and duplicates in their counters)."""
    out: list[tuple[int, int, int, str]] = []
    for block in re.split(r"\n\s*\n", text.lstrip("﻿").replace("\r\n", "\n")):
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if not lines:
            continue
        ti = 0
        if _SRT_TS.search(lines[0]) is None:
            ti = 1  # first line is the numeric counter
            if ti >= len(lines):
                continue
        m = _SRT_TS.search(lines[ti])
        if m is None:
            continue
        g = m.groups()
        out.append(
            (
                len(out), _ms(*g[:4]), _ms(*g[4:]),
                "\n".join(lines[ti + 1 :]).strip(),
            )
        )
    return out


def vtt_parse(text: str) -> list[tuple[int, int, int, str]]:
    """Parse WebVTT: WEBVTT header, optional NOTE/STYLE/REGION blocks,
    cues with optional identifiers and settings after the timing."""
    body = text.lstrip("﻿").replace("\r\n", "\n")
    if not body.startswith("WEBVTT"):
        raise ValueError("not a WebVTT file (missing WEBVTT header)")
    out: list[tuple[int, int, int, str]] = []
    blocks = re.split(r"\n\s*\n", body)
    for block in blocks[1:] if "\n" not in blocks[0] else blocks:
        lines = [ln for ln in block.split("\n") if ln.strip() != ""]
        if not lines or lines[0].startswith(("NOTE", "STYLE", "REGION", "WEBVTT")):
            continue
        ti = 0 if _SRT_TS.search(lines[0]) else 1
        if ti >= len(lines):
            continue
        m = _SRT_TS.search(lines[ti])
        if m is None:
            continue
        g = m.groups()
        out.append(
            (
                len(out), _ms(*g[:4]), _ms(*g[4:]),
                "\n".join(lines[ti + 1 :]).strip(),
            )
        )
    return out


def srt_write(segments: list[tuple[int, int, str]]) -> str:
    """Fixture/sink writer: [(start_ms, end_ms, text)] → SRT."""

    def ts(v: int) -> str:
        h, rem = divmod(v, 3600_000)
        m, rem = divmod(rem, 60_000)
        s, ms = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"

    blocks = [
        f"{i + 1}\n{ts(t0)} --> {ts(t1)}\n{txt}"
        for i, (t0, t1, txt) in enumerate(segments)
    ]
    return "\n\n".join(blocks) + "\n"


SUBTITLE_SCHEMA = (
    "media_id long, seg_index int, t_start_ms long, t_end_ms long, "
    "duration_ms long, text string, n_words int"
)


def subtitle_segments(subs: DataFrame, fmt: str = "srt") -> DataFrame:
    """One row per cue over a (media_id, content string) DataFrame —
    real parse per Arrow batch, columnar out."""
    parse = srt_parse if fmt == "srt" else vtt_parse

    def run(batches):
        import pandas as pd

        cols = [
            "media_id", "seg_index", "t_start_ms", "t_end_ms",
            "duration_ms", "text", "n_words",
        ]
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                for idx, t0, t1, txt in parse(content):
                    rows.append(
                        (int(mid), idx, t0, t1, t1 - t0, txt, len(txt.split()))
                    )
            yield pd.DataFrame(rows, columns=cols)

    return subs.mapInPandas(run, SUBTITLE_SCHEMA)
