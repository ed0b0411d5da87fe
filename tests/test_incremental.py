"""Incremental derived-table maintenance must be indistinguishable from
a full rebuild of the final corpus (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from memvid_spark.operators import incremental
from memvid_spark.operators.search import build_postings


def test_incremental_equals_rebuild(spark):
    base = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma delta"), (3, "epsilon zeta")],
        "doc_id long, text string",
    )
    # doc 1 updated, doc 2 tombstoned, doc 4 inserted
    changed_docs = spark.createDataFrame(
        [(1, "alpha rewritten"), (4, "brand new doc")],
        "doc_id long, text string",
    )
    changed_ids = spark.createDataFrame([(1,), (2,), (4,)], "doc_id long")
    final = spark.createDataFrame(
        [(1, "alpha rewritten"), (3, "epsilon zeta"), (4, "brand new doc")],
        "doc_id long, text string",
    )
    inc = incremental.incremental_postings(
        build_postings(base), changed_ids, changed_docs
    )
    want = build_postings(final)
    key = lambda df: sorted((r.doc_id, r.token, r.tf) for r in df.collect())
    assert key(inc) == key(want)
    # tombstoned doc leaves no trace
    assert not [r for r in inc.collect() if r.doc_id == 2]


def test_apply_delta_broadcasts_changed_ids(spark):
    """The anti join must broadcast the (small) change batch — the
    standing derived table must never shuffle for maintenance."""
    base = spark.range(1000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("token"),
        F.lit(1).alias("tf"),
    )
    ids = spark.createDataFrame([(5,)], "doc_id long")
    docs = spark.createDataFrame([(5, "y")], "doc_id long, text string")
    out = incremental.incremental_postings(base, ids, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_connected_components_chain_and_islands(spark):
    """Transitive chains collapse to one cluster (a-b, b-c, c-d); islands
    stay separate; cluster id is the min node id of the component."""
    from memvid_spark.operators.mesh import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "a long, b long",
    )
    got = {r.node: r.cluster for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from memvid_spark.operators.mesh import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=0)
