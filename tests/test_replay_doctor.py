"""Replay determinism / divergence and doctor audit semantics
(replay/engine.rs divergence diff, doctor.rs heal plan)."""

from pyspark.sql import functions as F

from memvid_spark.operators.doctor import doctor_report, heal_plan
from memvid_spark.operators.replay import (
    as_of_cut,
    divergence_diff,
    replay_checkpoints,
)

ACT_SCHEMA = (
    "session_id long, seq int, action_type string, params string, value double"
)


def _acts(spark, rows):
    return spark.createDataFrame(rows, ACT_SCHEMA)


def test_divergence_statuses(spark):
    a = _acts(spark, [(1, 1, "search", "{}", 1.0), (1, 2, "put", "{}", 2.0),
                      (1, 3, "ask", "{}", 3.0)])
    b = _acts(spark, [(1, 1, "search", "{}", 1.0), (1, 2, "put", "{}", 9.9)])
    d = {r.seq: r for r in divergence_diff(a, b).collect()}
    assert d[1].status == "same"
    assert d[2].status == "diverged"
    assert d[3].status == "only_a" and d[3].b_type == ""


def test_replay_is_deterministic(spark):
    rows = [(1, i, "act", '{"k":1}', float(i)) for i in range(1, 11)]
    a, b = _acts(spark, rows), _acts(spark, rows)
    cp_a = {r.seq: r.state_hash for r in replay_checkpoints(a).collect()}
    cp_b = {r.seq: r.state_hash for r in replay_checkpoints(b).collect()}
    assert cp_a == cp_b and set(cp_a) == {5, 10}
    # prefix property: as-of cut re-execution reproduces the prefix hash
    cut = as_of_cut(a, 1, 5)
    assert replay_checkpoints(cut).collect()[0].state_hash == cp_a[5]
    # any change before a checkpoint changes it
    mut = _acts(spark, rows[:4] + [(1, 5, "act", '{"k":2}', 5.0)] + rows[5:])
    assert replay_checkpoints(mut).collect()[0].state_hash != cp_a[5]


def test_doctor_and_heal(spark):
    frames = spark.createDataFrame(
        [(i,) for i in range(10)] + [(3,)], "doc_id long"
    )
    emb = spark.createDataFrame(
        [(i,) for i in range(8)] + [(99,)], "vec_id long"
    )
    rep = doctor_report(
        frames, {"embeddings": emb}, derived_keys={"embeddings": "vec_id"}
    )
    r = {(x.check, x.table_name): x.n_affected for x in rep.collect()}
    assert r[("duplicate_key", "frames")] == 1
    assert r[("missing", "embeddings")] == 2  # ids 8, 9
    assert r[("orphaned", "embeddings")] == 1  # id 99
    plan = {(x.table_name, x.check): x.action for x in heal_plan(rep).collect()}
    assert plan[("embeddings", "missing")] == "rebuild_derived_table"
    assert plan[("embeddings", "orphaned")] == "vacuum_derived_table"
    assert plan[("frames", "duplicate_key")] == "dedup_frames"


def test_replay_save_load_roundtrip(spark, tmp_path):
    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    mv.put("hash joins shuffle both sides on the key")
    mv.put("broadcast joins ship the small side to every executor")
    mv.record_search("joins", top_k=5)
    mv.record_search("broadcast", top_k=3)
    path = str(tmp_path / "session.json")
    assert mv.save_replay(path) == 2

    # a fresh facade over the same corpus restores and re-executes
    mv2 = MemvidSpark(spark)
    mv2.put("hash joins shuffle both sides on the key")
    mv2.put("broadcast joins ship the small side to every executor")
    assert mv2.load_replay(path) == 2
    assert [tuple(r) for r in mv2.replay_log().collect()] == [
        tuple(r) for r in mv.replay_log().collect()
    ]
    # divergence diff over the restored log is empty (same corpus)
    div = mv2.replay()
    assert div.filter("status <> 'same'").count() == 0


def test_doctor_heals_dropped_sketch_track(spark, tmp_path):
    """doctor(heal=True) executes the heal plan: a store whose
    sketches.parquet was dropped (the corrupt-index case of
    tests/doctor_recovery.rs:194-717) is detected as missing rows,
    rebuilt via finalize_indexes, and sketch search returns results
    identical to the pre-corruption store."""
    import shutil

    from pyspark.sql import functions as F

    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    for i in range(8):
        mv.put(f"sketchable document number {i} about spark tables and joins")
    mv.build_all_sketches("small")
    path = str(tmp_path / "store")
    mv.save(path)
    want = sorted(
        tuple(r) for r in mv.find_sketch_candidates("spark tables", hamming_threshold=60).collect()
    )
    assert want  # the query actually hits

    shutil.rmtree(path + "/sketches.parquet")
    back = MemvidSpark.open(spark, path)
    assert back._sketch_df() is None  # track gone, variant remembered
    pre = {
        (r.check, r.table_name): r.n_affected
        for r in back.doctor().collect()
    }
    assert pre[("missing", "sketches")] == 8

    post = back.doctor(heal=True)
    assert (
        post.filter(
            (F.col("table_name") == "sketches") & (F.col("n_affected") > 0)
        ).count()
        == 0
    )
    got = sorted(
        tuple(r) for r in back.find_sketch_candidates("spark tables", hamming_threshold=60).collect()
    )
    assert got == want


def test_sketch_track_persists_across_save_open(spark, tmp_path):
    """save() ships the sketch track with the store (sketch_track.rs);
    open() restores it plus the schema registry, strict flag, memory
    cards, and enrichment bookkeeping — no finalize_indexes needed."""
    import pytest

    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    a = mv.put("alpha doc about joins")
    mv.put("beta doc about windows")
    mv.build_all_sketches("small")
    mv.register_schema("age", "number", "Single")
    mv.set_schema_strict(True)
    mv.remember("ada", "age", "36")
    want = sorted(tuple(r) for r in mv.find_sketch_candidates("joins").collect())
    want_queue = list(mv._enrich_queue)
    path = str(tmp_path / "store")
    mv.save(path)

    back = MemvidSpark.open(spark, path)
    assert back.has_sketches()
    assert back._sketch_variant == "small"
    got = sorted(tuple(r) for r in back.find_sketch_candidates("joins").collect())
    assert got == want
    # schema registry + strict flag round-trip
    assert back.is_schema_strict()
    with pytest.raises(ValueError):
        back.remember("ada", "unregistered_slot", "x")
    # memory cards round-trip
    assert back.get_current_memory("ada").head().value == "36"
    # enrichment bookkeeping round-trips
    assert list(back._enrich_queue) == want_queue
    assert back.get_unenriched_frames() == mv.get_unenriched_frames()
    assert not back.is_frame_enriched(a)

    # variant lock survives the round trip (one variant per track)
    with pytest.raises(ValueError):
        back.build_all_sketches("large")


def test_commit_skip_indexes_ships_no_stale_sketches(spark, tmp_path):
    """commit_skip_indexes persists content only: a previously built
    sketch track must not survive on disk, so open() after a bulk
    ingest sees no stale derived state until finalize_indexes."""
    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    mv.put("first doc about joins")
    mv.build_all_sketches("small")
    path = str(tmp_path / "store")
    mv.save(path)  # sketch track persisted

    mv.put("second doc added in bulk")
    mv.commit_skip_indexes(path)
    back = MemvidSpark.open(spark, path)
    assert not back.has_sketches()
    assert back.finalize_indexes("small") == 2


def test_doctor_heal_breadth_rebuilder_registry(spark, tmp_path):
    """The heal-then-pass loop across index KINDS
    (doctor_recovery.rs:194-717): each derived table is dropped/damaged
    in turn; doctor(heal=True) routes every rebuild action through the
    per-table rebuilder registry — the facade's own sketches via
    finalize_indexes, a user-supplied derived table via its closure —
    and the post-heal re-audit is clean. A table with findings but no
    registered rebuilder stays visible in the post-heal report."""
    import shutil

    from memvid_spark.api import MemvidSpark

    mv = MemvidSpark(spark)
    for i in range(8):
        mv.put(f"sketchable document number {i} about spark tables and joins")
    mv.build_all_sketches("small")
    path = str(tmp_path / "store")
    mv.save(path)

    # user-maintained derived table: per-doc lengths persisted to parquet
    lengths_path = str(tmp_path / "lengths.parquet")

    def rebuild_lengths():
        mv_open.docs().select(
            "doc_id", F.length(mv_open.text_col).alias("n_chars")
        ).write.mode("overwrite").parquet(lengths_path)
        spark.catalog.refreshByPath(lengths_path)
        return spark.read.parquet(lengths_path)

    # damage BOTH kinds: drop the sketch track entirely, and persist a
    # lengths table missing half the docs (stale index)
    shutil.rmtree(path + "/sketches.parquet")
    mv_open = MemvidSpark.open(spark, path)
    mv_open.docs().filter("doc_id < 4").select(
        "doc_id", F.length(mv_open.text_col).alias("n_chars")
    ).write.mode("overwrite").parquet(lengths_path)
    stale = spark.read.parquet(lengths_path)

    pre = {
        (r.check, r.table_name): r.n_affected
        for r in mv_open.doctor(derived={"lengths": stale}).collect()
    }
    assert pre[("missing", "sketches")] == 8
    assert pre[("missing", "lengths")] == 4

    post = mv_open.doctor(
        derived={"lengths": stale},
        heal=True,
        rebuilders={"lengths": rebuild_lengths},
    )
    dirty = post.filter(F.col("n_affected") > 0).collect()
    assert dirty == [], [tuple(r) for r in dirty]

    # no-rebuilder table: heal leaves its findings visible (plan, not fix)
    orphan = spark.createDataFrame([(999,)], "doc_id long")
    post2 = mv_open.doctor(derived={"mystery": orphan}, heal=True)
    bad = {
        (r.check, r.table_name): r.n_affected
        for r in post2.filter(F.col("n_affected") > 0).collect()
    }
    assert bad == {("missing", "mystery"): 8, ("orphaned", "mystery"): 1}
