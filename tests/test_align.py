"""interval_overlap_join tests: strict-overlap semantics (touching
intervals do NOT match), multi-band spans dedupe to one row, keys
partition the join, and the banded plan contains no inequality
nested-loop join."""

from memvid_spark.operators.align import interval_overlap_join


def _segs(spark, rows):
    return spark.createDataFrame(
        rows, "media_id long, seg_index int, t_start_ms long, t_end_ms long"
    )


def test_overlap_semantics(spark):
    a = _segs(spark, [(1, 0, 0, 10), (1, 1, 20, 30), (2, 0, 0, 100)])
    b = _segs(spark, [
        (1, 0, 5, 8),     # inside a0
        (1, 1, 10, 20),   # touches both a0-end and a1-start: NO match
        (1, 2, 29, 40),   # clips a1 tail
        (2, 0, 99, 200),  # other key
    ])
    got = {
        (r["media_id"], r["a_index"], r["b_index"]):
            (r["ov_start_ms"], r["ov_end_ms"], r["ov_ms"])
        for r in interval_overlap_join(a, b, band_ms=16).collect()
    }
    assert got == {
        (1, 0, 0): (5, 8, 3),
        (1, 1, 2): (29, 30, 1),
        (2, 0, 0): (99, 100, 1),
    }


def test_long_interval_spanning_many_bands_dedupes(spark):
    a = _segs(spark, [(5, 0, 0, 1000)])  # spans ~63 bands at band_ms=16
    b = _segs(spark, [(5, 0, 500, 600), (5, 1, 990, 1200)])
    rows = interval_overlap_join(a, b, band_ms=16).collect()
    assert len(rows) == 2  # one row per overlapping pair, not per band
    by_b = {r["b_index"]: r["ov_ms"] for r in rows}
    assert by_b == {0: 100, 1: 10}


def test_plan_is_banded_equi_join(spark):
    a = _segs(spark, [(1, 0, 0, 10)])
    b = _segs(spark, [(1, 0, 5, 8)])
    plan = interval_overlap_join(a, b)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
