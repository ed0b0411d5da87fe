"""IVF-cell-sharded NSW: the serving-tier scale path for the HNSW tier.

Hash-sharded NSW (src/vec.rs:345-435 re-expressed as independent
per-shard graphs) makes every query visit every shard; the IVF-cell
variant shards by nearest centroid and beam-searches only the probed
cells — validated here against exact brute-force ground truth (the
reference's own method, src/vec.rs:587-651), with the partition-pruning
contract pinned on a cell-partitioned parquet index.
"""

import pytest
from pyspark.sql import functions as F

from memvid_spark.operators.hnsw import (
    build_nsw_index_ivf,
    nsw_knn,
    nsw_knn_pruned,
    train_cell_centroids,
)
from memvid_spark.operators.knn import knn


def _blob_emb(spark, n_blobs=6, per_blob=60, dim=6):
    """Deterministic well-separated blobs: blob b centers at 10*e_b
    (one-hot scaled), members jitter by small per-id offsets — a
    query near a center has ALL its true neighbors inside one cell."""
    rows = []
    for b in range(n_blobs):
        for i in range(per_blob):
            v = [0.0] * dim
            v[b % dim] = 10.0
            for d in range(dim):
                v[d] += (((b * per_blob + i) * (d + 3)) % 7) * 0.05
            rows.append((b * per_blob + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_pruned_recall_vs_exact(spark):
    emb = _blob_emb(spark)
    C = train_cell_centroids(emb, n_cells=6, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    q = [10.0, 0.3, 0.2, 0.1, 0.0, 0.1]  # near blob 0's center
    approx = {
        r.vec_id for r in nsw_knn_pruned(index, C, q, k=10, probes=2).collect()
    }
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    assert len(approx & exact) / 10 >= 0.8  # src/vec.rs:645-650 bound


def test_ivf_pruned_probes_all_matches_full_search(spark):
    """probes >= n_cells degenerates to the exact full-shard search —
    the pruned path must reproduce stock nsw_knn on the same graph."""
    emb = _blob_emb(spark, n_blobs=4, per_blob=40)
    C = train_cell_centroids(emb, n_cells=4, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    q = [0.2, 10.1, 0.0, 0.3, 0.1, 0.0]
    full = [(r.vec_id, r.score, r.rank) for r in nsw_knn(index, q, k=5).collect()]
    pruned = [
        (r.vec_id, r.score, r.rank)
        for r in nsw_knn_pruned(index, C, q, k=5, probes=len(C)).collect()
    ]
    assert pruned == full


def test_ivf_mega_cell_sub_shards_bound_batch_size(spark):
    """A cell larger than max_shard_rows splits into id-hash sub-shards
    (Arrow batch per build task bounded in expectation at the cap —
    hash balance adds variance, so assert a 1.5x slack bound; skew
    costs shards, not OOM); shard ids stay globally unique and search
    results are unaffected."""
    emb = _blob_emb(spark, n_blobs=2, per_blob=80)
    C = train_cell_centroids(emb, n_cells=2, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60,
                                max_shard_rows=30)
    per_shard = index.groupBy("cell", "shard").count().collect()
    assert max(r["count"] for r in per_shard) <= 45  # 1.5x hash slack
    # 80-row cells at cap 30 -> 3 sub-shards each
    assert len({(r.cell, r.shard) for r in per_shard}) >= 6
    shards_per_cell = {}
    for r in per_shard:
        shards_per_cell.setdefault(r.cell, set()).add(r.shard)
    cells = sorted(shards_per_cell)
    assert not (shards_per_cell[cells[0]] & shards_per_cell[cells[1]])
    q = [10.2, 0.1, 0.3, 0.0, 0.1, 0.2]
    approx = {
        r.vec_id for r in nsw_knn_pruned(index, C, q, k=10, probes=1).collect()
    }
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    assert len(approx & exact) / 10 >= 0.8


def test_ivf_index_parquet_partition_pruning(spark, tmp_path):
    """The 100-TB contract: persist partitionBy("cell"), and the pruned
    query's isin(cells) becomes a planning-time PartitionFilter — the
    scan never lists unprobed cells' files. Pinned the same way as the
    enrichment-manifest pruning test: assert the filter in the executed
    plan AND prove it functionally with a poison file in an unprobed
    partition."""
    emb = _blob_emb(spark)
    C = train_cell_centroids(emb, n_cells=6, train_sample=1000)
    path = str(tmp_path / "nsw_ivf")
    build_nsw_index_ivf(emb, C, m=8, ef_construction=60).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    index = spark.read.parquet(path)

    q = [10.0, 0.2, 0.1, 0.3, 0.0, 0.1]
    res = nsw_knn_pruned(index, C, q, k=10, probes=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan

    # poison an unprobed cell's partition directory: pruning means the
    # scan never opens it, so the query still succeeds
    import numpy as np
    import os

    d = ((np.asarray(C) - np.asarray(q)) ** 2).sum(axis=1)
    far_cell = int(np.argmax(d))
    poison_dir = os.path.join(path, f"cell={far_cell}")
    assert os.path.isdir(poison_dir)
    with open(os.path.join(poison_dir, "part-poison.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    # re-list AFTER poisoning (explicit schema skips footer inference)
    # so the file listing genuinely contains the poison file
    fresh = spark.read.schema(index.schema).parquet(path)
    got = {r.vec_id for r in nsw_knn_pruned(fresh, C, q, k=10, probes=2).collect()}
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    assert len(got & exact) / 10 >= 0.8
    # unpruned control: a full-shard search must visit every cell and
    # trip over the poison file
    with pytest.raises(Exception):
        nsw_knn(fresh, q, k=10).collect()


def test_q180_registry_recall_floor(spark):
    """The registry entry's recall (clustered corpus, probes=2 of 8
    cells) meets the reference's own bound (src/vec.rs:645-650)."""
    from tests.conftest import SF_DIR

    from memvid_spark.registry import all_queries

    row = all_queries()["q180_hnsw_ivf_pruned"](spark, SF_DIR).head()
    assert row.recall >= 0.8


def test_ivf_apply_delta_equals_full_rebuild(spark):
    """The apply_delta idempotence contract (mutation.rs:913-918) on
    the IVF index: delta-apply over touched cells must reproduce a full
    rebuild row-for-row — including when the delta pushes a cell over
    max_shard_rows and changes its sub-shard count (the fixed-stride
    encoding keeps every cell's shard ids independent of the others)."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    all_emb = _blob_emb(spark, n_blobs=4, per_blob=50)
    old = all_emb.filter(F.col("vec_id") % 50 < 40)  # 40/blob
    delta = all_emb.filter(F.col("vec_id") % 50 >= 40)  # +10/blob
    C = train_cell_centroids(all_emb, n_cells=4, train_sample=1000)
    # cap 45: old cells hold 40 rows (1 sub-shard), the delta pushes
    # them to 50 (2 sub-shards) — the resharding case
    base = build_nsw_index_ivf(old, C, m=8, ef_construction=60,
                               max_shard_rows=45)
    inc = apply_delta_ivf(base, delta, C, m=8, ef_construction=60,
                          max_shard_rows=45)
    full = build_nsw_index_ivf(all_emb, C, m=8, ef_construction=60,
                               max_shard_rows=45)
    ra = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in inc.collect()
    )
    rb = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in full.collect()
    )
    assert ra == rb


def test_ivf_apply_delta_untouched_cells_pass_through(spark):
    """A delta landing in one cell must leave every other cell's rows
    byte-identical (at warehouse scale: only the touched cell=
    partition directories are overwritten)."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    emb = _blob_emb(spark, n_blobs=3, per_blob=30)
    C = train_cell_centroids(emb, n_cells=3, train_sample=1000)
    base = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    # delta: three more members of blob 0 (near its center)
    delta = spark.createDataFrame(
        [(900 + i, [10.0 + 0.01 * i, 0.2, 0.1, 0.0, 0.1, 0.0])
         for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    inc = apply_delta_ivf(base, delta, C, m=8, ef_construction=60)
    import numpy as np

    d = ((np.asarray(C) - np.asarray([10.0, 0.2, 0.1, 0.0, 0.1, 0.0])) ** 2).sum(axis=1)
    hot = int(np.lexsort((np.arange(len(C)), d))[0])
    before = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors))
        for r in base.filter(F.col("cell") != hot).collect()
    )
    after = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors))
        for r in inc.filter(F.col("cell") != hot).collect()
    )
    assert before == after
    assert inc.filter(F.col("cell") == hot).count() == base.filter(
        F.col("cell") == hot
    ).count() + 3


def test_batch_join_matches_per_query_pruned(spark):
    """nsw_knn_join must reproduce nsw_knn_pruned query by query: the
    batch path is an execution-shape change (one cogrouped job for N
    queries vs N driver-issued jobs), never a semantics change."""
    from memvid_spark.operators.hnsw import nsw_knn_join

    emb = _blob_emb(spark)
    C = train_cell_centroids(emb, n_cells=6, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    qrows = [
        (100, [10.0, 0.3, 0.2, 0.1, 0.0, 0.1]),
        (200, [0.1, 10.2, 0.0, 0.3, 0.1, 0.0]),
        (300, [0.2, 0.0, 10.1, 0.1, 0.3, 0.2]),
    ]
    queries = spark.createDataFrame(
        qrows, "query_id long, query_vec array<double>"
    )
    batch = nsw_knn_join(index, C, queries, k=5, probes=2)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.score))
    for qid, qv in qrows:
        single = [
            (r.rank, r.vec_id, r.score)
            for r in nsw_knn_pruned(index, C, qv, k=5, probes=2).collect()
        ]
        assert sorted(got[qid]) == sorted(single), f"query {qid} diverged"


def test_batch_join_recall_and_self_exclusion(spark):
    """Corpus-vs-self retrieval (the dedup/hard-negative shape):
    exclude_same_id drops the trivial self-match and every query's
    top-k still hits >= 0.8 of exact ground truth."""
    from memvid_spark.operators.hnsw import nsw_knn_join

    emb = _blob_emb(spark)
    C = train_cell_centroids(emb, n_cells=6, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    queries = emb.filter(F.col("vec_id") % 60 < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    res = nsw_knn_join(
        index, C, queries, k=5, probes=2, exclude_same_id=True
    ).collect()
    assert all(r.query_id != r.vec_id for r in res)
    got = {}
    for r in res:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    for qrow in queries.collect():
        exact = [
            r.vec_id
            for r in knn(emb, list(qrow.query_vec), k=6, metric="l2").collect()
            if r.vec_id != qrow.query_id
        ][:5]
        hit = len(got[qrow.query_id] & set(exact)) / 5
        assert hit >= 0.8, f"query {qrow.query_id} recall {hit}"


def test_ivf_build_deterministic(spark):
    emb = _blob_emb(spark, n_blobs=3, per_blob=30)
    C = train_cell_centroids(emb, n_cells=3, train_sample=1000)
    a = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    b = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    ra = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in a.collect()
    )
    rb = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in b.collect()
    )
    assert ra == rb


def test_ivf_delta_with_tombstones_equals_rebuild(spark):
    """Churn contract (mutation.rs:2999-3084 rebuild-after-vacuum):
    one delta carrying inserts AND tombstones must equal a full rebuild
    of (old ∖ deletes) ∪ delta row-for-row — including a tombstone
    that pulls a cell back under max_shard_rows (re-sharding down)."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    all_emb = _blob_emb(spark, n_blobs=4, per_blob=50)
    old = all_emb.filter(F.col("vec_id") % 50 < 45)
    delta = all_emb.filter(F.col("vec_id") % 50 >= 45)
    dels = spark.createDataFrame(
        [(i * 50,) for i in range(4)] + [(1, )], "vec_id long"
    )  # drop one member of every blob + one more from blob 0
    C = train_cell_centroids(all_emb, n_cells=4, train_sample=1000)
    base = build_nsw_index_ivf(old, C, m=8, ef_construction=60,
                               max_shard_rows=45)
    inc = apply_delta_ivf(base, delta, C, m=8, ef_construction=60,
                          max_shard_rows=45, deletes=dels)
    survivors = all_emb.join(dels, "vec_id", "left_anti")
    full = build_nsw_index_ivf(survivors, C, m=8, ef_construction=60,
                               max_shard_rows=45)
    ra = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in inc.collect()
    )
    rb = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in full.collect()
    )
    assert ra == rb
    gone = {i * 50 for i in range(4)} | {1}
    assert not gone & {r[2] for r in ra}


def test_ivf_delta_upsert_replaces_moved_vector(spark):
    """Re-inserting an existing vec_id with a DIFFERENT embedding must
    replace the old graph node — even when the new embedding lands in
    another cell (the old cell is touched too). Duplicate ids would
    silently corrupt search's id→position map; upsert keeps delta ≡
    rebuild exact."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    emb = _blob_emb(spark, n_blobs=3, per_blob=30)
    C = train_cell_centroids(emb, n_cells=3, train_sample=1000)
    base = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    # vec 0 was in blob 0; move it to blob 1's center
    moved = spark.createDataFrame(
        [(0, [0.1, 10.0, 0.2, 0.0, 0.1, 0.0])],
        "vec_id long, embedding array<double>",
    )
    inc = apply_delta_ivf(base, moved, C, m=8, ef_construction=60)
    rows = inc.filter(F.col("vec_id") == 0).collect()
    assert len(rows) == 1  # exactly one node for id 0 — no duplicate
    replaced = emb.filter(F.col("vec_id") != 0).unionByName(moved)
    full = build_nsw_index_ivf(replaced, C, m=8, ef_construction=60)
    ra = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in inc.collect()
    )
    rb = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors)) for r in full.collect()
    )
    assert ra == rb


def test_hash_delta_tombstones_and_upsert(spark):
    """Same churn contract on the hash-sharded index (apply_delta)."""
    from memvid_spark.operators.hnsw import apply_delta, build_nsw_index

    emb = _blob_emb(spark, n_blobs=2, per_blob=40)
    base = build_nsw_index(emb, n_shards=4, m=8, ef_construction=60)
    delta = spark.createDataFrame(
        [(500, [10.0, 0.1, 0.0, 0.2, 0.1, 0.0]),
         (3, [0.0, 10.5, 0.1, 0.0, 0.2, 0.1])],  # upsert of existing id 3
        "vec_id long, embedding array<double>",
    )
    dels = spark.createDataFrame([(7,), (11,)], "vec_id long")
    inc = apply_delta(base, delta, n_shards=4, m=8, ef_construction=60,
                      deletes=dels)
    expected_src = (
        emb.filter(~F.col("vec_id").isin(3, 7, 11)).unionByName(delta)
    )
    full = build_nsw_index(expected_src, n_shards=4, m=8,
                           ef_construction=60)
    ra = sorted(
        (r.shard, r.vec_id, tuple(r.neighbors)) for r in inc.collect()
    )
    rb = sorted(
        (r.shard, r.vec_id, tuple(r.neighbors)) for r in full.collect()
    )
    assert ra == rb
    ids = {r[1] for r in ra}
    assert 500 in ids and 3 in ids and not {7, 11} & ids


def test_ivf_needs_retrain_policy(spark):
    """Drift policy: balanced occupancy below the engage threshold →
    no retrain; a delta piling everything into one cell → skew trips
    the bound; drained trained cells trip the occupancy branch."""
    from memvid_spark.operators.hnsw import ivf_needs_retrain

    emb = _blob_emb(spark, n_blobs=4, per_blob=40)
    C = train_cell_centroids(emb, n_cells=4, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    # 160 rows < engage_rows=1000 → never retrain, whatever the skew
    needs, stats = ivf_needs_retrain(index, engage_rows=1000)
    assert needs is False and stats["n_rows"] == 160
    # engaged and balanced (4 blobs ≈ 40 rows each): skew ≈ 1 → no
    needs, stats = ivf_needs_retrain(index, engage_rows=100, max_skew=4.0)
    assert needs is False and stats["skew"] < 2.0
    # pile 3 extra copies of one cell's rows onto the index: that cell
    # now holds ~160 of 280 rows (skew ≈ 2.3 vs the occupied mean) →
    # the 2.0 bound trips
    hot = index.filter(F.col("cell") == index.head().cell)
    skewed = index.unionByName(hot).unionByName(hot).unionByName(hot)
    needs, stats = ivf_needs_retrain(skewed, engage_rows=100, max_skew=2.0)
    assert needs is True and stats["skew"] > 2.0
    # drained: 1 occupied cell of 4 trained → retrain via occupancy
    needs, _ = ivf_needs_retrain(hot, engage_rows=10, max_skew=100.0,
                                 trained_cells=4)
    assert needs is True


def _island_emb(spark, n_main=600, n_island=20, dim=8, dist=10.0):
    """The directed-unreachable-island fixture (the reachability limit
    formerly documented at hnsw._search_seeds): a far, tight island
    inserted EARLY (ids right after the second evenly-spaced seed
    position, avoiding every seed) links out to a few main-cluster
    anchors; the hundreds of main nodes inserted after it overflow
    those anchors past 2m and neighbor pruning drops the far island
    backlinks — island→main edges survive, main→island edges die."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = n_main + n_island
    stride = max(1, n // 16)
    start = stride + 1
    assert start + n_island <= 2 * stride  # island avoids every seed
    vecs = np.empty((n, dim))
    isl = set(range(start, start + n_island))
    idx_main = [i for i in range(n) if i not in isl]
    vecs[idx_main] = rng.normal(0.0, 1.0, (n_main, dim))
    vecs[sorted(isl)] = rng.normal(dist, 0.05, (n_island, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    return emb, sorted(isl), [float(dist)] * dim


def _directed_reach(rows, seeds):
    """Positions reachable from seed POSITIONS over the id-sorted
    adjacency of one collected shard."""
    rows = sorted(rows, key=lambda r: r.vec_id)
    pos = {int(r.vec_id): i for i, r in enumerate(rows)}
    adj = [[pos[w] for w in r.neighbors] for r in rows]
    seen = set(seeds)
    stack = list(seeds)
    while stack:
        u = stack.pop()
        for v in adj[u]:
            if v not in seen:
                seen.add(v)
                stack.append(v)
    return seen, rows


def test_entry_cover_restores_island_recall(spark):
    """Build-time entry cover (hnsw._entry_cover): every node of every
    shard must be reachable from the recorded seed set by construction.
    Precondition pins that the fixture still severs the island in the
    DIRECTED sense (evenly spaced seeds alone reach none of it) — if a
    future build change reconnects it, this fails loudly instead of
    the guarantee test passing vacuously."""
    from memvid_spark.operators.hnsw import (
        _search_seeds,
        build_nsw_index,
        nsw_knn,
    )

    emb, island_ids, q = _island_emb(spark)
    index = build_nsw_index(emb, n_shards=1, m=8, ef_construction=100)
    rows = index.collect()
    n = len(rows)
    got, srows = _directed_reach(rows, _search_seeds(n))
    pos = {int(r.vec_id): i for i, r in enumerate(srows)}
    assert all(pos[i] not in got for i in island_ids)  # precondition
    # the cover marks an entry INSIDE the island...
    entries = {int(r.vec_id) for r in rows if r.entry}
    assert 0 in entries and entries & set(island_ids)
    # ...and reaches everything
    got_cov, _ = _directed_reach(rows, [pos[e] for e in sorted(entries)])
    assert len(got_cov) == n
    # island queries get their true neighbors back (recall was 0)
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    approx = {r.vec_id for r in nsw_knn(index, q, k=10).collect()}
    assert approx == exact


def test_entry_cover_batch_join_island(spark):
    """The batch cogroup path seeds the same entry cover: an island
    query through nsw_knn_join finds its true neighbors."""
    from memvid_spark.operators.hnsw import build_nsw_index_ivf, nsw_knn_join
    from memvid_spark.operators.knn import knn_join

    emb, island_ids, q = _island_emb(spark)
    # ONE explicit cell: the island must survive inside a mixed cell
    # (the q182 sliver shape), not get rescued by its own cell
    index = build_nsw_index_ivf(
        emb, [[0.0] * 8], m=8, ef_construction=100
    )
    queries = spark.createDataFrame(
        [(0, q)], "query_id long, query_vec array<double>"
    )
    batch = nsw_knn_join(index, [[0.0] * 8], queries, k=10, probes=1)
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    assert {r.vec_id for r in batch.collect()} == exact


def test_legacy_index_without_entry_column(spark):
    """An index persisted before the entry column existed still
    searches (seeds fall back to evenly spaced) and still accepts
    deltas (the union normalizes entry=false); the rebuilt shards of
    the delta carry a real cover again."""
    from memvid_spark.operators.hnsw import apply_delta_ivf, nsw_knn

    emb = _blob_emb(spark, n_blobs=2, per_blob=40)
    C = train_cell_centroids(emb, n_cells=2, train_sample=1000)
    legacy = build_nsw_index_ivf(emb, C, m=8, ef_construction=60).drop("entry")
    q = [10.0, 0.3, 0.2, 0.1, 0.0, 0.1]
    exact = {r.vec_id for r in knn(emb, q, k=5, metric="l2").collect()}
    approx = {r.vec_id for r in nsw_knn(legacy, q, k=5).collect()}
    assert len(approx & exact) / 5 >= 0.8
    delta = spark.createDataFrame(
        [(900, [10.0, 0.25, 0.2, 0.1, 0.0, 0.1])],
        "vec_id long, embedding array<double>",
    )
    upgraded = apply_delta_ivf(legacy, delta, C, m=8, ef_construction=60)
    assert "entry" in upgraded.columns
    hits = {r.vec_id for r in nsw_knn(upgraded, q, k=5).collect()}
    assert 900 in hits


def test_sub_granular_delta_rebuilds_only_changed_subs(spark):
    """A delta that keeps a cell's sub-shard count unchanged rebuilds
    ONLY the sub-shards holding changed ids. Pinned structurally with a
    poison: corrupt one row's neighbors in an untouched sub — the
    eligible delta must pass the poison through bit-exact (that sub was
    not rebuilt), while the changed sub equals a full rebuild. A delta
    that CROSSES the sub-count boundary falls back to the whole-cell
    rebuild and heals the poison."""
    from memvid_spark.operators.hnsw import apply_delta_ivf, build_nsw_index_ivf

    rows = []
    for i in range(150):
        v = [0.0] * 6
        v[i % 6] = 10.0
        for d in range(6):
            v[d] += ((i * (d + 3)) % 53) * 0.01
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = [[0.0] * 6]  # one explicit cell; msr=30 -> 5 sub-shards
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60,
                                max_shard_rows=30).localCheckpoint()
    shards = sorted({r.shard for r in index.select("shard").distinct().collect()})
    assert len(shards) == 5
    by_shard = {
        s: sorted(
            r.vec_id for r in index.filter(F.col("shard") == s).collect()
        )
        for s in shards
    }
    up_id = by_shard[shards[0]][0]       # upsert this id (sub A changes)
    poison_id = by_shard[shards[1]][0]   # corrupt this row (sub B untouched)
    poisoned = index.withColumn(
        "neighbors",
        F.when(
            F.col("vec_id") == poison_id,
            F.array().cast("array<bigint>"),
        ).otherwise(F.col("neighbors")),
    ).localCheckpoint()
    new_v = [x + 0.005 for x in dict(rows)[up_id]]
    delta = spark.createDataFrame(
        [(up_id, new_v)], "vec_id long, embedding array<double>"
    )
    out = apply_delta_ivf(poisoned, delta, C, m=8, ef_construction=60,
                          max_shard_rows=30).localCheckpoint()
    # untouched sub passed through bit-exact, poison included
    got_b = sorted(
        (r.vec_id, tuple(r.neighbors))
        for r in out.filter(F.col("shard") == shards[1]).collect()
    )
    want_b = sorted(
        (r.vec_id, tuple(r.neighbors))
        for r in poisoned.filter(F.col("shard") == shards[1]).collect()
    )
    assert got_b == want_b
    assert (poison_id, ()) in got_b
    # changed sub equals a full rebuild over the post-delta corpus
    emb2 = spark.createDataFrame(
        [(i, new_v if i == up_id else v) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    truth = build_nsw_index_ivf(emb2, C, m=8, ef_construction=60,
                                max_shard_rows=30)
    for s in (shards[0],):
        got = sorted(
            (r.vec_id, tuple(r.neighbors), bool(r.entry))
            for r in out.filter(F.col("shard") == s).collect()
        )
        want = sorted(
            (r.vec_id, tuple(r.neighbors), bool(r.entry))
            for r in truth.filter(F.col("shard") == s).collect()
        )
        assert got == want
    # boundary-crossing delta (150 -> 181 rows, 5 -> 7 subs): whole-cell
    # rebuild, poison healed
    grow = spark.createDataFrame(
        [(1000 + i, [((i * 7 + d) % 13) * 0.7 for d in range(6)])
         for i in range(31)],
        "vec_id long, embedding array<double>",
    )
    healed = apply_delta_ivf(poisoned, grow, C, m=8, ef_construction=60,
                             max_shard_rows=30)
    bad = healed.filter(
        (F.col("vec_id") == poison_id) & (F.size("neighbors") == 0)
    ).count()
    assert bad == 0


def test_auto_n_cells_clamps_and_scales():
    """Corpus-sized cell count: ceil(n/target) clamped to [min, max] —
    the term that keeps probes x cell_size constant as the corpus
    grows (VERDICT r8: fixed n_cells made per-query CPU and delta wall
    linear in corpus size)."""
    from memvid_spark.operators.hnsw import auto_n_cells

    assert auto_n_cells(0) == 4                       # min clamp
    assert auto_n_cells(100, target_cell_rows=25000) == 4
    assert auto_n_cells(250_000, target_cell_rows=25000) == 10
    assert auto_n_cells(10**12, target_cell_rows=25000) == 4096  # max
    assert auto_n_cells(60_000, target_cell_rows=2000) == 30
    assert auto_n_cells(60_001, target_cell_rows=2000) == 31     # ceil


def test_ivf_needs_retrain_occupancy_growth_trigger(spark):
    """The RESIZE moment: mean occupancy outgrowing growth_factor x
    target_cell_rows trips the retrain even with zero skew — the
    policy hook that lets corpus-sized tiers re-size instead of
    fattening their cells forever."""
    from memvid_spark.operators.hnsw import ivf_needs_retrain

    emb = _blob_emb(spark, n_blobs=4, per_blob=40)  # 160 rows
    C = train_cell_centroids(emb, n_cells=4, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    # mean = 40/cell; target 30 with factor 2 => bound 60: no trigger
    needs, stats = ivf_needs_retrain(
        index, engage_rows=100, target_cell_rows=30
    )
    assert needs is False and "overgrown" not in stats
    # target 15 => bound 30 < mean 40: trigger, stats say why
    needs, stats = ivf_needs_retrain(
        index, engage_rows=100, target_cell_rows=15
    )
    assert needs is True and stats.get("overgrown") is True
    assert stats["mean_cell_rows"] == 40.0
    # pinned tiers (target None) never trip on growth
    needs, _ = ivf_needs_retrain(index, engage_rows=100)
    assert needs is False


def test_delta_mismatched_shard_regime_falls_back_to_whole_cell(spark):
    """A delta called with a max_shard_rows differing from the build's
    must NOT mix sharding regimes inside a cell: the regime guard spots
    that the on-disk shard ids don't match the caller's derivation and
    demotes the cell to a whole-cell rebuild, which reshards
    consistently — so delta == rebuild holds at the CALLER's regime
    for every touched cell (ADVICE r8: silent divergence before)."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    rows = []
    for i in range(150):
        v = [0.0] * 6
        v[i % 6] = 10.0
        for d in range(6):
            v[d] += ((i * (d + 3)) % 53) * 0.01
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = [[0.0] * 6]  # one cell
    # build at msr=30 (5 subs); delta at msr=200 (1 sub either way —
    # eligible under the caller's regime, but the on-disk shards say
    # otherwise)
    index = build_nsw_index_ivf(
        emb, C, m=8, ef_construction=60, max_shard_rows=30
    ).localCheckpoint()
    up_id = 7
    new_v = [x + 0.005 for x in dict(rows)[up_id]]
    delta = spark.createDataFrame(
        [(up_id, new_v)], "vec_id long, embedding array<double>"
    )
    out = apply_delta_ivf(
        index, delta, C, m=8, ef_construction=60, max_shard_rows=200
    )
    emb2 = spark.createDataFrame(
        [(i, new_v if i == up_id else v) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    truth = build_nsw_index_ivf(
        emb2, C, m=8, ef_construction=60, max_shard_rows=200
    )
    got = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in out.collect()
    )
    want = sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in truth.collect()
    )
    assert got == want


def test_refresh_entry_cover_heals_legacy_island(spark):
    """doctor-driven cover upgrade (VERDICT r8 #5): an index persisted
    BEFORE the entry column searches with spaced seeds only — on the
    severed-island fixture that is recall 0 until some delta happens to
    rebuild the shard. refresh_entry_cover rewrites covers in place
    (O(V+E) per sub-graph, no rebuild): recall 0 -> 1.0, and the pass
    is idempotent on an already-covered graph."""
    from memvid_spark.operators.hnsw import (
        build_nsw_index,
        nsw_knn,
        refresh_entry_cover,
    )

    emb, island_ids, q = _island_emb(spark)
    built = build_nsw_index(emb, n_shards=1, m=8, ef_construction=100)
    legacy = built.drop("entry").localCheckpoint()
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    before = {r.vec_id for r in nsw_knn(legacy, q, k=10).collect()}
    assert not (before & exact)  # precondition: the legacy failure mode
    healed = refresh_entry_cover(legacy).localCheckpoint()
    after = {r.vec_id for r in nsw_knn(healed, q, k=10).collect()}
    assert after == exact  # recall 1.0 through the healed graph
    # idempotent: covers recomputed from the same adjacency are equal
    again = refresh_entry_cover(healed)
    key = lambda df: sorted(  # noqa: E731
        (r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )
    assert key(again) == key(healed)


def test_two_level_assignment_matches_exact_on_clustered(spark, monkeypatch):
    """Above TWO_LEVEL_MIN_CELLS the cell assignment routes through the
    IVF-of-the-centroids two-level form (O(sqrt(k)·d) per row — the
    10^5-cell regime a 100 TB corpus-sized tier needs). On data with
    cluster structure it equals the exact flat argmin; it is
    deterministic across invocations either way."""
    from memvid_spark.operators import hnsw
    from memvid_spark.operators.hnsw import _with_cell, train_cell_centroids

    emb = _blob_emb(spark, n_blobs=6, per_blob=60)
    C = train_cell_centroids(emb, n_cells=12, train_sample=1000)
    exact = {
        r.vec_id: r.cell
        for r in _with_cell(emb, C, "vec_id", "embedding").collect()
    }
    monkeypatch.setattr(hnsw, "TWO_LEVEL_MIN_CELLS", 4)
    two = {
        r.vec_id: r.cell
        for r in _with_cell(emb, C, "vec_id", "embedding").collect()
    }
    assert two == exact
    again = {
        r.vec_id: r.cell
        for r in _with_cell(emb, C, "vec_id", "embedding").collect()
    }
    assert again == two


def test_two_level_delta_equals_rebuild_and_recall(spark, monkeypatch):
    """The routing is transparent to every downstream contract: with
    the two-level path forced, delta-apply still equals a full rebuild
    row-for-row (assignment is a pure function of (row, centroids), so
    build and delta agree), and the batch-join search keeps the 0.8
    recall bound on the clustered corpus."""
    from memvid_spark.operators import hnsw
    from memvid_spark.operators.hnsw import (
        apply_delta_ivf,
        nsw_knn_join,
    )
    from memvid_spark.operators.knn import knn_join

    monkeypatch.setattr(hnsw, "TWO_LEVEL_MIN_CELLS", 4)
    t_emb = _blob_emb(spark, n_blobs=6, per_blob=50)  # 300 rows
    C = train_cell_centroids(t_emb, n_cells=12, train_sample=1000)
    base = t_emb.filter(F.col("vec_id") % 7 != 0)
    delta = t_emb.filter(F.col("vec_id") % 7 == 0)
    index = build_nsw_index_ivf(base, C, m=8, ef_construction=60)
    applied = apply_delta_ivf(index, delta, C, m=8, ef_construction=60)
    truth = build_nsw_index_ivf(t_emb, C, m=8, ef_construction=60)
    key = lambda df: sorted(  # noqa: E731
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )
    assert key(applied) == key(truth)
    queries = t_emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    batch = nsw_knn_join(
        truth, C, queries, k=5, probes=4, exclude_same_id=True
    )
    exact = knn_join(
        t_emb,
        queries.select(
            F.col("query_id").alias("q_id"),
            F.col("query_vec").alias("q_vec"),
        ),
        k=5,
        metric="l2",
    ).select(F.col("q_id").alias("query_id"), "vec_id")
    hits = (
        batch.select("query_id", "vec_id")
        .join(exact, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
    )
    per_q = [r.n / 5.0 for r in hits.collect()]
    assert per_q and min(per_q) >= 0.8


def test_flat_fallback_assigns_nearest_not_cell_zero():
    """ADVICE r9: a row whose probed super-groups are ALL memberless
    (k-means-drained supers — degenerate but reachable) must fall back
    to the flat argmin over every centroid, not park in cell 0: query-
    time probing ranks cells by centroid distance, so a row far from
    centroid 0 parked there would only be found when cell 0 happens to
    be probed. The helper is the exact path's rule: first-min tie-break
    to the lowest cell id."""
    import numpy as np

    from memvid_spark.operators.hnsw import _flat_fallback

    C = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]])
    X = np.array([[9.0, 1.0], [0.1, 9.5], [0.2, 0.2]])
    best_d = np.array([np.inf, np.inf, 0.08])  # row 2 already resolved
    best_c = np.array([0, 0, 0], dtype="int64")
    _flat_fallback(X, C, best_d, best_c)
    assert list(best_c) == [1, 2, 0]
    assert np.isfinite(best_d).all()
    # tie: equidistant between cells 1 and 2 -> lowest id wins
    Xt = np.array([[6.0, 6.0]])
    d = np.array([np.inf])
    c = np.array([7], dtype="int64")
    _flat_fallback(Xt, C, d, c)
    assert c[0] == 1


def _unique_blob_emb(spark, n_blobs, per_blob, dim=6, scale=10.0):
    """Well-separated blobs with UNIQUE vectors (jitter period 53 is
    coprime to the axis cycle — coincident points make zero-distance
    tie clouds that blur recall comparisons at ~1 row per cell)."""
    rows = []
    for b in range(n_blobs):
        for i in range(per_blob):
            gid = b * per_blob + i
            v = [0.0] * dim
            v[b % dim] = scale
            for d in range(dim):
                v[d] += ((gid * (d + 3)) % 53) * 0.01
            rows.append((gid, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_scaled_trainer_is_deterministic_and_exactly_sized(spark):
    """train_cell_centroids_scaled (the distributed coarse-quantizer
    trainer): returns exactly n_cells centroids on healthy data, is
    deterministic across invocations (per-group rows sort by (hash,id)
    before k-means, so partitioning can't leak into the model), and
    places centroids on the actual cluster structure."""
    import numpy as np

    from memvid_spark.operators.hnsw import train_cell_centroids_scaled

    emb = _unique_blob_emb(spark, n_blobs=6, per_blob=80)
    C = np.asarray(train_cell_centroids_scaled(emb, 24, n_hint=480))
    assert C.shape == (24, 6)
    C2 = np.asarray(train_cell_centroids_scaled(emb, 24, n_hint=480))
    assert np.array_equal(C, C2)
    # every blob center has a centroid within its own jitter radius —
    # the coarse model found the structure, not sampling noise
    for b in range(6):
        center = np.zeros(6)
        center[b % 6] = 10.0
        d2 = ((C - center) ** 2).sum(axis=1).min()
        assert d2 < 1.0, f"blob {b} has no nearby centroid (d2={d2})"


def test_train_dispatch_goes_distributed_above_bound(spark, monkeypatch):
    """train_cell_centroids routes through the distributed trainer
    above SCALED_TRAIN_MIN_CELLS and stays on the byte-identical
    driver path at or below it (existing artifacts replay)."""
    import numpy as np

    from memvid_spark.operators import hnsw

    emb = _unique_blob_emb(spark, n_blobs=4, per_blob=50)
    before = np.asarray(train_cell_centroids(emb, n_cells=8))
    calls = []
    real = hnsw.train_cell_centroids_scaled

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(hnsw, "train_cell_centroids_scaled", spy)
    same = np.asarray(hnsw.train_cell_centroids(emb, n_cells=8))
    assert np.array_equal(same, before) and not calls  # driver path
    monkeypatch.setattr(hnsw, "SCALED_TRAIN_MIN_CELLS", 4)
    routed = np.asarray(hnsw.train_cell_centroids(emb, n_cells=8))
    assert calls and routed.shape == (8, 6)


def test_above_clamp_cells_delta_equals_rebuild_and_recall(spark):
    """The max_cells=4096 lift end-to-end (VERDICT r9 #1): >4096 cells
    train DISTRIBUTED (per-super-group k-means — no driver O(k·sample)
    bottleneck), assignment routes two-level, and every load-bearing
    contract survives at ~1.5 rows/cell: delta-apply equals a full
    rebuild row-for-row, and the pruned search keeps the 0.8 recall
    bound vs exact ground truth."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    emb = _unique_blob_emb(spark, n_blobs=12, per_blob=500)  # 6000 rows
    C = train_cell_centroids(emb, n_cells=4100, n_hint=6000)
    assert len(C) == 4100  # the distributed path, exactly sized
    base = emb.filter(F.col("vec_id") % 11 != 0)
    delta = emb.filter(F.col("vec_id") % 11 == 0)
    index = build_nsw_index_ivf(base, C, m=8, ef_construction=60)
    applied = apply_delta_ivf(index, delta, C, m=8, ef_construction=60)
    truth = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    key = lambda df: sorted(  # noqa: E731
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )
    assert key(applied) == key(truth)
    truth = truth.localCheckpoint()
    q = [10.2, 0.3, 0.2, 0.1, 0.0, 0.1]  # near blob 0's center
    approx = {
        r.vec_id
        for r in nsw_knn_pruned(truth, C, q, k=10, probes=16).collect()
    }
    exact = {r.vec_id for r in knn(emb, q, k=10, metric="l2").collect()}
    assert len(approx & exact) / 10 >= 0.8  # src/vec.rs:645-650 bound


def test_append_fast_path_equals_rebuild_and_reuses_graph(spark):
    """Round-10 delta kernel: an append-only delta (every new id above
    the cell's stored max, nothing removed) must (a) still equal a full
    rebuild row-for-row — the stored sub-graph is the rebuild's
    construction prefix, so resuming the insert loop is exact — and
    (b) actually REUSE the stored adjacency instead of rebuilding:
    pinned structurally with a poisoned neighbor list that an append
    must propagate and a rebuild would heal. A delete demotes to the
    rebuild path (same poison heals)."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    emb = _unique_blob_emb(spark, n_blobs=4, per_blob=60)  # ids 0..239
    C = train_cell_centroids(emb, n_cells=4, train_sample=1000)
    base = emb.filter(F.col("vec_id") < 200)
    delta = emb.filter(F.col("vec_id") >= 200)  # all above stored max
    index = build_nsw_index_ivf(base, C, m=8, ef_construction=60)
    applied = apply_delta_ivf(index, delta, C, m=8, ef_construction=60)
    truth = build_nsw_index_ivf(emb, C, m=8, ef_construction=60)
    key = lambda df: sorted(  # noqa: E731
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )
    assert key(applied) == key(truth)

    # structural reuse pin: truncate one stored row's neighbor list in
    # a cell the delta appends to; the append path must carry the
    # poison through (it resumes on the stored adjacency)
    victim = int(
        index.filter(F.size("neighbors") >= 3)
        .orderBy("vec_id").head().vec_id
    )
    poisoned = index.withColumn(
        "neighbors",
        F.when(
            F.col("vec_id") == victim, F.slice("neighbors", 1, 1)
        ).otherwise(F.col("neighbors")),
    ).localCheckpoint()
    ap = apply_delta_ivf(poisoned, delta, C, m=8, ef_construction=60)
    row = ap.filter(F.col("vec_id") == victim).head()
    # the victim's OLD-id links must still be the poisoned singleton
    # (appended backlinks carry ids >= 200); a rebuild would restore
    # the >= 3 original links
    kept = int(
        poisoned.filter(F.col("vec_id") == victim).head().neighbors[0]
    )
    old_links = {int(x) for x in row.neighbors if x < 200}
    assert old_links <= {kept}
    # a delete in the same delta demotes the cell to whole rebuild:
    # the poison heals back to the truth graph of the surviving set
    dels = spark.createDataFrame([(victim,)], "vec_id long")
    healed = apply_delta_ivf(
        poisoned, delta, C, m=8, ef_construction=60, deletes=dels
    )
    truth2 = build_nsw_index_ivf(
        emb.filter(F.col("vec_id") != victim), C, m=8, ef_construction=60
    )
    assert key(healed) == key(truth2)


def test_centroid_frame_model_serves_without_driver_table(spark):
    """CentroidFrame (round 10): the coarse model stays a DataFrame —
    past the O(n_cells·dim) broadcast/collect bound of the ndarray
    model. Same trainer math (per-super-group k-means), cell ids
    assigned from the tiny count agg; assignment routes through the
    cogroup form and must be deterministic and delta==rebuild-exact
    (tombstones included); query-time probing collects only the
    nearest supers' blocks and keeps the recall bound."""
    from memvid_spark.operators.hnsw import (
        apply_delta_ivf,
        train_cell_centroids_frame,
    )

    emb = _unique_blob_emb(spark, n_blobs=8, per_blob=120)  # 960 rows
    cf = train_cell_centroids_frame(emb, 16, n_hint=960)
    assert cf.n_cells == 16 and len(cf.offsets) >= 2
    assert cf.df.count() == 16  # the model lives as rows, not ndarray
    from memvid_spark.operators.hnsw import _with_cell

    a1 = sorted(
        (r.cell, r.vec_id)
        for r in _with_cell(emb, cf, "vec_id", "embedding").collect()
    )
    a2 = sorted(
        (r.cell, r.vec_id)
        for r in _with_cell(emb, cf, "vec_id", "embedding").collect()
    )
    assert a1 == a2 and len(a1) == 960  # pure function of (row, model)
    base = emb.filter(F.col("vec_id") % 9 != 0)
    delta = emb.filter(F.col("vec_id") % 9 == 0)
    dels = spark.createDataFrame([(4,), (13,)], "vec_id long")
    idx = build_nsw_index_ivf(base, cf, m=8, ef_construction=60)
    ap = apply_delta_ivf(idx, delta, cf, m=8, ef_construction=60,
                         deletes=dels)
    truth = build_nsw_index_ivf(
        emb.filter(~F.col("vec_id").isin(4, 13)), cf, m=8,
        ef_construction=60,
    )
    key = lambda df: sorted(  # noqa: E731
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )
    assert key(ap) == key(truth)
    truth = truth.localCheckpoint()
    q = [10.2, 0.3, 0.2, 0.1, 0.0, 0.1]
    approx = {
        r.vec_id
        for r in nsw_knn_pruned(truth, cf, q, k=10, probes=4).collect()
    }
    exact = {
        r.vec_id
        for r in knn(
            emb.filter(~F.col("vec_id").isin(4, 13)), q, k=10, metric="l2"
        ).collect()
    }
    assert len(approx & exact) / 10 >= 0.8
    # probe_cells never pulls the whole table: asking for 3 cells
    # collects at most a few groups' blocks
    cells = cf.probe_cells(q, 3)
    assert len(cells) == 3 and len(set(cells)) == 3
    # the batch retrieval join routes its probe step through the same
    # cogroup form — every query answered, recall bound held
    from memvid_spark.operators.hnsw import nsw_knn_join
    from memvid_spark.operators.knn import knn_join

    live = emb.filter(~F.col("vec_id").isin(4, 13))
    queries = live.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    batch = nsw_knn_join(
        truth, cf, queries, k=5, probes=4, exclude_same_id=True
    )
    exact_j = knn_join(
        live,
        queries.select(
            F.col("query_id").alias("q_id"),
            F.col("query_vec").alias("q_vec"),
        ),
        k=5,
        metric="l2",
    ).select(F.col("q_id").alias("query_id"), "vec_id")
    hits = (
        batch.select("query_id", "vec_id")
        .join(exact_j, ["query_id", "vec_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n"))
    )
    n_queries = queries.count()
    per_q = [r.n / 5.0 for r in hits.collect()]
    assert len(per_q) == n_queries  # every query came back
    assert min(per_q) >= 0.8


def _graph_key(df):
    return sorted(
        (r.cell, r.shard, r.vec_id, tuple(r.neighbors), bool(r.entry))
        for r in df.collect()
    )


def test_regime_probe_catches_overlapping_shard_ranges(spark):
    """Round-11 planning fold: the regime guard is now a driver range
    check over the corpus agg's observed shard SET (exact at
    nsubs == 1) plus a per-row probe ONLY for multi-sub eligible
    cells. This pins the case the range check alone cannot catch:
    build at nsubs=1 (all shards == cell*stride, inside the caller's
    [0, 4) range), delta at a max_shard_rows giving nsubs=4 — per-row
    membership differs even though every observed shard is in range,
    so the probe must demote the cell to a whole-cell rebuild."""
    from memvid_spark.operators.hnsw import apply_delta_ivf

    rows = []
    for i in range(80):
        v = [0.0] * 6
        v[i % 6] = 10.0
        for d in range(6):
            v[d] += ((i * (d + 3)) % 53) * 0.01
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = [[0.0] * 6]  # one cell
    index = build_nsw_index_ivf(
        emb, C, m=8, ef_construction=60, max_shard_rows=80
    ).localCheckpoint()  # nsubs = 1: every stored shard is 0
    up_id = 7
    new_v = [x + 0.005 for x in dict(rows)[up_id]]
    delta = spark.createDataFrame(
        [(up_id, new_v)], "vec_id long, embedding array<double>"
    )
    out = apply_delta_ivf(
        index, delta, C, m=8, ef_construction=60, max_shard_rows=20
    )  # caller regime: nsubs = 4, range [0, 4) covers the stored 0
    emb2 = spark.createDataFrame(
        [(i, new_v if i == up_id else v) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    truth = build_nsw_index_ivf(
        emb2, C, m=8, ef_construction=60, max_shard_rows=20
    )
    assert _graph_key(out) == _graph_key(truth)


def test_driver_bounds_fall_back_to_distributed_forms(spark, monkeypatch):
    """ADVICE r10: above DRIVER_DELTA_IDS_MAX the delete-id set stays a
    distributed pinned frame (no driver list), the planning take yields
    to the lazy agg path, and above DRIVER_DELTA_CELLS_MAX every
    cell-literal expression (touched isin, regime create_map, append
    isin) rides a broadcast join instead. Shrinking both bounds to
    force every fallback must leave delta == rebuild byte-identical."""
    from memvid_spark.operators import hnsw as H

    monkeypatch.setattr(H, "DRIVER_DELTA_IDS_MAX", 2)
    monkeypatch.setattr(H, "DRIVER_DELTA_CELLS_MAX", 0)
    emb = _blob_emb(spark, n_blobs=4, per_blob=50)
    C = train_cell_centroids(emb, n_cells=4, train_sample=1000)
    index = build_nsw_index_ivf(emb, C, m=8, ef_construction=60).localCheckpoint()
    # 6 upserts (> ids bound), 5 deletes (> ids bound), plus an append
    # batch later — every guarded path engages
    ups = emb.filter(F.col("vec_id") % 31 == 3).withColumn(
        "embedding", F.transform("embedding", lambda x: x + F.lit(0.004))
    )
    assert ups.count() > 2
    dels = spark.createDataFrame([(i,) for i in (1, 11, 21, 31, 41)], "vec_id long")
    out = H.apply_delta_ivf(index, ups, C, m=8, ef_construction=60, deletes=dels)
    gone = {1, 11, 21, 31, 41}
    up_ids = {r.vec_id for r in ups.select("vec_id").collect()}
    # deletes apply to the pre-delta index; an id in both lands as the
    # delta row (none here overlap)
    truth = build_nsw_index_ivf(
        emb.filter(~F.col("vec_id").isin(sorted(gone - up_ids)))
        .filter(~F.col("vec_id").isin(sorted(up_ids)))
        .unionByName(ups),
        C, m=8, ef_construction=60,
    )
    assert _graph_key(out) == _graph_key(truth)
    # append-shaped batch under the shrunken bounds (join-flag path)
    app = spark.createDataFrame(
        [(1000 + i, [0.1 * i, 10.0, 0.2, 0.0, 0.0, 0.3]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    out2 = H.apply_delta_ivf(
        index, app, C, m=8, ef_construction=60
    )
    truth2 = build_nsw_index_ivf(
        emb.unionByName(app), C, m=8, ef_construction=60
    )
    assert _graph_key(out2) == _graph_key(truth2)


def test_centroid_frame_save_load_round_trip(spark, tmp_path):
    """Round-11 serving wiring: a CentroidFrame persists as parquet +
    manifest and reloads equivalently — same supers/offsets/n_cells,
    identical assignment and probe decisions, and delta == rebuild
    stays exact when build and delta run on the two copies (the
    path-consistency contract across a save/open boundary)."""
    from memvid_spark.operators.hnsw import (
        apply_delta_ivf,
        load_centroid_frame,
        save_centroid_frame,
        train_cell_centroids_frame,
    )

    emb = _unique_blob_emb(spark, n_blobs=6, per_blob=60)  # 360 rows
    cf = train_cell_centroids_frame(emb, 12, n_hint=360)
    path = str(tmp_path / "model.frame")
    cf2 = save_centroid_frame(cf, path, extra={"model_id": "m-1"})
    from memvid_spark.operators.hnsw import centroid_frame_manifest

    assert centroid_frame_manifest(path)["model_id"] == "m-1"
    cf3 = load_centroid_frame(spark, path)
    for other in (cf2, cf3):
        assert other.n_cells == cf.n_cells and other.dim == cf.dim
        assert other.offsets == cf.offsets
        assert (
            sorted(map(tuple, other.supers.tolist()))
            == sorted(map(tuple, cf.supers.tolist()))
        )
    from memvid_spark.operators.hnsw import _with_cell

    a_mem = sorted(
        (r.cell, r.vec_id)
        for r in _with_cell(emb, cf, "vec_id", "embedding").collect()
    )
    a_disk = sorted(
        (r.cell, r.vec_id)
        for r in _with_cell(emb, cf3, "vec_id", "embedding").collect()
    )
    assert a_mem == a_disk
    q = [10.2, 0.3, 0.2, 0.1, 0.0, 0.1]
    assert cf.probe_cells(q, 3) == cf3.probe_cells(q, 3)
    # delta == rebuild across the persistence boundary: build with the
    # in-session model, delta with the reloaded one
    base = emb.filter(F.col("vec_id") % 7 != 0)
    delta = emb.filter(F.col("vec_id") % 7 == 0)
    idx = build_nsw_index_ivf(base, cf, m=8, ef_construction=60)
    ap = apply_delta_ivf(idx, delta, cf3, m=8, ef_construction=60)
    truth = build_nsw_index_ivf(emb, cf3, m=8, ef_construction=60)
    assert _graph_key(ap) == _graph_key(truth)


def test_frame_probe_matches_ndarray_exactly(spark):
    """Round-11 exactness: with group radii in the frame (every
    trained/loaded frame), BOTH frame probes — single-query
    branch-and-bound and the batch U-bound cogroup — pick the SAME
    cells as the ndarray model's full ranking, ties included. Pinned
    by reconstructing the equivalent ndarray (C[cell] = centroid) and
    comparing nsw_knn_pruned / nsw_knn_join / probe_cells outputs for
    strict equality across several probes settings."""
    import numpy as np

    from memvid_spark.operators.hnsw import (
        nsw_knn_join,
        train_cell_centroids_frame,
    )

    emb = _unique_blob_emb(spark, n_blobs=8, per_blob=120)  # 960 rows
    cf = train_cell_centroids_frame(emb, 24, n_hint=960)
    assert cf.radii is not None and len(cf.radii) == len(cf.offsets)
    C = np.zeros((cf.n_cells, cf.dim))
    for r in cf.df.collect():
        C[int(r["cell"])] = [float(x) for x in r["centroid"]]
    idx = build_nsw_index_ivf(emb, cf, m=8, ef_construction=60)
    idx = idx.localCheckpoint()
    qs = [
        [10.2, 0.3, 0.2, 0.1, 0.0, 0.1],
        [0.0, 7.7, 0.1, 0.0, 0.2, 0.0],
        [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
    ]
    for probes in (1, 3, 7):
        for q in qs:
            # single-query: identical probed cells...
            want = np.lexsort(
                (np.arange(len(C)),
                 (C * C).sum(axis=1) - 2.0 * (C @ np.asarray(q))
                 + float(np.asarray(q) @ np.asarray(q)))
            )[:probes]
            assert cf.probe_cells(q, probes) == [int(c) for c in want]
            # ...and identical served results either model form
            a = [
                (r.vec_id, r.score, r.rank)
                for r in nsw_knn_pruned(
                    idx, cf, q, k=5, probes=probes
                ).collect()
            ]
            b = [
                (r.vec_id, r.score, r.rank)
                for r in nsw_knn_pruned(
                    idx, C, q, k=5, probes=probes
                ).collect()
            ]
            assert a == b
    queries = emb.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    for probes in (2, 5):
        fa = sorted(
            (r.query_id, r.rank, r.vec_id, r.score)
            for r in nsw_knn_join(
                idx, cf, queries, k=5, probes=probes
            ).collect()
        )
        nb = sorted(
            (r.query_id, r.rank, r.vec_id, r.score)
            for r in nsw_knn_join(
                idx, C, queries, k=5, probes=probes
            ).collect()
        )
        assert fa == nb


def test_frame_probe_exactness_fuzz(spark):
    """Property fuzz of the round-11 exactness claim: for CONSTRUCTED
    frame models (random groupings, radii computed as the true
    per-group max distance, integer coordinates to force exact
    distance ties, degenerate shapes — one group, singleton groups,
    probes >= n_cells) both probe paths must equal the flat ranking of
    the full centroid table. Catches bound-arithmetic regressions the
    clustered fixtures can't (ties at lb == U, memberless supers,
    short-cover queries)."""
    import random

    import numpy as np

    from memvid_spark.operators.hnsw import (
        CentroidFrame,
        _probe_cells_frame,
    )

    rng = random.Random(1234)
    for case in range(12):
        d = rng.choice([2, 3, 5])
        k = rng.choice([3, 7, 16, 33])
        n_groups = rng.choice([1, 2, max(1, int(k ** 0.5)), k])
        C = np.array(
            [[rng.randint(-4, 4) for _ in range(d)] for _ in range(k)],
            dtype="float64",
        )
        grp_of = [rng.randrange(n_groups) for _ in range(k)]
        # supers = group means where occupied, random point otherwise
        S = np.zeros((n_groups, d))
        offsets, radii = {}, {}
        rows = []
        start = 0
        for g in range(n_groups):
            mem = [i for i in range(k) if grp_of[i] == g]
            if not mem:
                S[g] = [rng.randint(-4, 4) for _ in range(d)]
                continue
            S[g] = C[mem].mean(axis=0)
            radii[g] = float(
                np.sqrt(((C[mem] - S[g][None, :]) ** 2).sum(axis=1)).max()
            )
            offsets[g] = (start, len(mem))
            for j, i in enumerate(mem):
                rows.append((g, start + j, [float(x) for x in C[i]]))
            start += len(mem)
        cells_C = np.zeros((start, d))
        for g, cell, cen in rows:
            cells_C[cell] = cen
        df = spark.createDataFrame(
            rows, "grp int, cell int, centroid array<double>"
        ).localCheckpoint()
        cf = CentroidFrame(S, offsets, df, start, d, radii=radii)
        qs = [
            [float(rng.randint(-4, 4)) for _ in range(d)]
            for _ in range(3)
        ]
        for probes in (1, 2, start, start + 3):
            for q in qs:
                qv = np.asarray(q)
                flat = np.lexsort(
                    (np.arange(start),
                     (cells_C * cells_C).sum(axis=1)
                     - 2.0 * (cells_C @ qv) + float(qv @ qv))
                )[: max(1, probes)]
                assert cf.probe_cells(q, probes) == [int(c) for c in flat], (
                    case, probes, q
                )
        # batch path over the same queries in one job
        qdf = spark.createDataFrame(
            [(i, q) for i, q in enumerate(qs)],
            "query_id long, query_vec array<double>",
        )
        for probes in (1, 2, start):
            got = {}
            for r in _probe_cells_frame(
                qdf, cf, probes, "query_id", "query_vec"
            ).collect():
                got.setdefault(int(r["query_id"]), []).append(int(r["cell"]))
            for i, q in enumerate(qs):
                qv = np.asarray(q)
                flat = np.lexsort(
                    (np.arange(start),
                     (cells_C * cells_C).sum(axis=1)
                     - 2.0 * (cells_C @ qv) + float(qv @ qv))
                )[: max(1, probes)]
                assert sorted(got[i]) == sorted(int(c) for c in flat), (
                    case, probes, i
                )


def test_cell_index_handle_matches_dataframe_filtering(spark, tmp_path):
    """CellIndexHandle (round 11) reads only the probed cells'
    directories; results must equal the DataFrame isin-filter path
    exactly, including through nsw_knn_pruned, and the handle must
    never TOUCH an unprobed cell's directory (poison pin)."""
    import os

    from memvid_spark.operators.hnsw import CellIndexHandle

    emb = _blob_emb(spark)
    C = train_cell_centroids(emb, n_cells=6, train_sample=1000)
    path = str(tmp_path / "nsw_ivf_handle")
    build_nsw_index_ivf(emb, C, m=8, ef_construction=60).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(path)
    index_df = spark.read.parquet(path)
    handle = CellIndexHandle(spark, path)

    # slice equivalence for an arbitrary cell subset (schema cache
    # kicks in on the second call — both calls must agree)
    for cells in ([0, 2], [1, 3, 5]):
        want = sorted(
            tuple(r)
            for r in index_df.filter(F.col("cell").isin(cells))
            .select(sorted(index_df.columns)).collect()
        )
        got = sorted(
            tuple(r)
            for r in handle.for_cells(cells)
            .select(sorted(index_df.columns)).collect()
        )
        assert got == want

    # pruned query equivalence (handle vs DataFrame), plus poison in a
    # far cell's directory: the handle path must not open it
    q = [10.0, 0.2, 0.1, 0.3, 0.0, 0.1]
    import numpy as np

    d = ((np.asarray(C) - np.asarray(q)) ** 2).sum(axis=1)
    far_cell = int(np.argmax(d))
    with open(os.path.join(path, f"cell={far_cell}", "poison.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    want = [tuple(r) for r in nsw_knn_pruned(
        spark.read.schema(index_df.schema).parquet(path), C, q, k=10, probes=2
    ).collect()]
    got = [tuple(r) for r in nsw_knn_pruned(
        handle, C, q, k=10, probes=2
    ).collect()]
    assert got == want

    # empty/missing-cell fallback stays correct (fallback reads the
    # root; the poison file would break parquet inference there, so
    # drop it first)
    os.remove(os.path.join(path, f"cell={far_cell}", "poison.parquet"))
    assert handle.for_cells([9999]).count() == 0


def test_coarse_assignment_batch_independent(spark):
    """Near-tie rescue pin (hnsw._TIE_REL): coarse assignment is a
    bitwise-pure function of (row, centroids) — the same row assigns to
    the same cell whether it rides in a small batch (a delta) or the
    full corpus (a rebuild), even when its two nearest centroids are a
    knife-edge (sub-1e-12) apart. BLAS GEMM is only shape-stable in the
    last ulps; before the rescue this exact flip broke
    test_above_clamp_cells_delta_equals_rebuild_and_recall."""
    import numpy as np

    from memvid_spark.operators.hnsw import assign_cells

    rng = np.random.default_rng(11)

    def mk_rows(C, n_knife, n_easy):
        rows = []
        vid = 0
        # knife-edge rows: midpoint of a random centroid pair, nudged
        # by ~1e-15 — inside the rescue band, outside exact-tie
        for _ in range(n_knife):
            a, b = rng.choice(len(C), size=2, replace=False)
            v = (C[a] + C[b]) / 2.0 + rng.normal(scale=1e-15, size=C.shape[1])
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        for _ in range(n_easy):
            c = rng.integers(len(C))
            v = C[c] + rng.normal(scale=0.01, size=C.shape[1])
            rows.append((vid, [float(x) for x in v]))
            vid += 1
        return rows

    def check(C, label):
        rows = mk_rows(np.asarray(C), 40, 200)
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        full = {
            r["vec_id"]: r["cell"]
            for r in assign_cells(emb, C).collect()
        }
        part = {}
        for m in (0, 1, 2):
            sub = emb.filter(F.col("vec_id") % 3 == m)
            part.update(
                {r["vec_id"]: r["cell"]
                 for r in assign_cells(sub, C).collect()}
            )
        assert part == full, label

    # flat path (<= TWO_LEVEL_MIN_CELLS)
    C_flat = rng.normal(size=(64, 8)).tolist()
    check(C_flat, "flat")
    # two-level path
    C_two = rng.normal(size=(1100, 8)).tolist()
    check(C_two, "two-level")
