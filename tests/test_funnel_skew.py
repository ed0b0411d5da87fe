"""Semantic pins for the funnel operator (sequential-constraint
correctness the registry corpus can't isolate) and the salted skew
join (multiset identity + composite-key plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memvid_spark.operators.asof import funnel_steps
from memvid_spark.operators.skew import salted_join

US = 1000  # ns per us


def _ev(uid, etype, us):
    return (uid, etype, us * US)


def test_funnel_sequential_constraint(spark):
    events = spark.createDataFrame(
        [
            # user 1: click BEFORE first view must not count; the later
            # click does; purchase before that click must not count
            _ev(1, "click", 50),
            _ev(1, "view", 100),
            _ev(1, "purchase", 150),
            _ev(1, "click", 200),
            _ev(1, "purchase", 300),
            # user 2: full funnel in order
            _ev(2, "view", 10),
            _ev(2, "click", 20),
            _ev(2, "purchase", 30),
            # user 3: view only
            _ev(3, "view", 5),
            # user 4: never viewed -> not in the funnel at all
            _ev(4, "click", 1),
            _ev(4, "purchase", 2),
            # user 5: click exactly AT the view timestamp is not after it
            _ev(5, "view", 100),
            _ev(5, "click", 100),
        ],
        "user_id long, event_type string, ts long",
    )
    out = {
        r.user_id: r
        for r in funnel_steps(
            events, ["view", "click", "purchase"]
        ).collect()
    }
    assert set(out) == {1, 2, 3, 5}
    assert (out[1].t_view_us, out[1].t_click_us, out[1].t_purchase_us) == (
        100, 200, 300
    )
    assert out[1].steps_done == 3
    assert out[2].steps_done == 3 and out[2].t_click_us == 20
    assert out[3].steps_done == 1 and out[3].t_click_us is None
    assert out[5].steps_done == 1  # strict 'after', ties excluded


def test_salted_join_multiset_identity(spark):
    import random

    random.seed(13)
    big = spark.createDataFrame(
        # heavy skew: 70% of rows share key 0
        [(i, random.choice([0] * 7 + [1, 2, 3]), i * 10)
         for i in range(500)],
        "row_id long, k long, payload long",
    )
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (5, "unmatched")],
        "k long, name string",
    )
    plain = big.join(small, "k").select("row_id", "k", "payload", "name")
    salted = salted_join(
        big, small, on="k", salt_expr=F.col("row_id"), n_salts=8
    ).select("row_id", "k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the physical join key really is composite — the salt must appear
    # in the join, not be optimized away
    assert "_salt" in salted._jdf.queryExecution().executedPlan().toString()


def test_salted_join_default_salt_and_counts(spark):
    big = spark.createDataFrame(
        [(i, i % 3) for i in range(99)], "row_id long, k long"
    )
    small = spark.createDataFrame([(0,), (1,), (2,)], "k long")
    out = salted_join(big, small, on="k")
    assert out.count() == 99
    assert "_salt" not in out.columns  # salt never escapes


def test_compaction_plan_invariants(spark):
    from memvid_spark.operators.versioning import compaction_plan

    files = spark.createDataFrame(
        [("p1", i, s) for i, s in enumerate([50, 60, 70, 200, 10, 10, 95])]
        + [("p2", 0, 500), ("p2", 1, 1)],
        "part_key string, file_id long, bytes long",
    )
    out = compaction_plan(files, target_bytes=100).collect()
    by_file = {(r.part_key, r.file_id): r for r in out}
    # first-fit by exclusive prefix sum: cum before each p1 file is
    # 0,50,110,180,380,390,400 -> bins 0,0,1,1,3,3,4
    assert [by_file[("p1", i)].bin for i in range(7)] == [0, 0, 1, 1, 3, 3, 4]
    # p2: 500-byte file alone in bin 0 (overshoot bounded by one file),
    # next file starts bin 5
    assert by_file[("p2", 0)].bin == 0 and by_file[("p2", 1)].bin == 5
    # bin aggregates consistent
    r = by_file[("p1", 0)]
    assert r.bin_files == 2 and r.bin_bytes == 110
