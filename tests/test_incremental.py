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


def test_nsw_delta_apply_equals_full_rebuild(spark):
    """Incremental NSW maintenance: appending a vector batch by
    rebuilding only the touched shards must equal a full rebuild
    row-for-row — the per-shard build is a deterministic function of the
    shard's id-sorted contents (rebuild_indexes idempotence,
    mutation.rs:913-918; same contract as incremental postings q101)."""
    import numpy as np

    from memvid_spark.operators.hnsw import apply_delta, build_nsw_index

    rng = np.random.RandomState(11)
    base_vecs = rng.standard_normal((300, 16))
    delta_vecs = rng.standard_normal((30, 16))
    mk = lambda vecs, start: spark.createDataFrame(
        [(start + i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    base, delta = mk(base_vecs, 0), mk(delta_vecs, 1000)
    index = build_nsw_index(base, n_shards=8, m=8, ef_construction=40).localCheckpoint()
    inc = apply_delta(index, delta, n_shards=8, m=8, ef_construction=40)
    full = build_nsw_index(
        mk(np.concatenate([base_vecs, delta_vecs]), 0).withColumn(
            "vec_id",
            F.when(F.col("vec_id") >= 300, F.col("vec_id") + 700).otherwise(
                F.col("vec_id")
            ),
        ),
        n_shards=8, m=8, ef_construction=40,
    )
    a = {(r.shard, r.vec_id, tuple(r.neighbors)) for r in inc.collect()}
    b = {(r.shard, r.vec_id, tuple(r.neighbors)) for r in full.collect()}
    assert a == b and len(a) == 330
