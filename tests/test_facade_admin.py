"""Facade admin surfaces: logic-mesh CRUD, vector track, memory
binding, batch/commit/finalize (src/memvid/mesh.rs, helpers.rs,
enrichment.rs:470-650, lifecycle.rs:799-880, mutation.rs:752-930)."""

from __future__ import annotations

import pytest

from memvid_spark.api import MemvidSpark


# -- logic-mesh admin ------------------------------------------------------


def test_mesh_node_merge_semantics(spark):
    mv = MemvidSpark(spark)
    assert not mv.has_logic_mesh()
    mv.add_mesh_node("sarah lee", "Person", [1, 2], support=2)
    mv.add_mesh_node("sarah lee", "Person", [2, 3], support=1)
    mv.add_mesh_node("sarah lee", "Project", [9], support=1)  # kind differs
    assert mv.mesh_node_count() == 2
    n = mv.find_entity("Sarah Lee")
    assert n is not None
    person = (
        n if n["kind"] == "Person" else mv.entities_by_kind("Person").head().asDict()
    )
    # merged: frame_ids unioned, mentions accumulated
    # (merge_node, logic_mesh.rs:516-536)
    assert person["frame_ids"] == [1, 2, 3]
    assert person["support"] == 3
    assert mv.find_entity("nobody") is None


def test_mesh_edge_dedup_and_stats(spark):
    mv = MemvidSpark(spark)
    mv.add_mesh_edge("sarah lee", "acme", "employer", frame_id=1)
    mv.add_mesh_edge("sarah lee", "acme", "employer", frame_id=7)  # dup key
    mv.add_mesh_edge("sarah lee", "bob", "manager")
    assert mv.mesh_edge_count() == 2
    # existing edge wins the dedup (merge_edge skip-if-present)
    kept = mv.logic_mesh()[1].filter("link_type = 'employer'").head()
    assert kept.frame_id == 1
    mv.add_mesh_node("sarah lee", "Person", [1])
    st = mv.logic_mesh_stats()
    assert st["node_count"] == 1 and st["edge_count"] == 2
    assert st["edges_by_link"] == {"employer": 1, "manager": 1}
    assert st["nodes_by_kind"] == {"Person": 1}


def test_frame_entities_and_follow_entity(spark):
    mv = MemvidSpark(spark)
    mv.add_mesh_nodes(
        [
            ("sarah lee", "Person", [1, 2], 2),
            ("acme", "Org", [2], 1),
        ]
    )
    ents = {r.entity for r in mv.frame_entities(2).collect()}
    assert ents == {"sarah lee", "acme"}
    assert {r.entity for r in mv.frame_entities(1).collect()} == {"sarah lee"}

    mv.add_mesh_edges(
        [
            ("sarah lee", "acme", "employer", 1, 1.0),
            ("acme", "globex", "parent", 1, 1.0),
        ]
    )
    reached = {r.node_id: r.hop for r in mv.follow_entity("Sarah Lee", "employer").collect()}
    assert reached == {"acme": 1}


def test_set_logic_mesh_replaces(spark):
    mv = MemvidSpark(spark)
    mv.add_mesh_node("old", "Person", [0])
    nodes = spark.createDataFrame([("new", "Org", [5], 1)], mv.NODE_SCHEMA)
    edges = spark.createDataFrame([], mv.EDGE_SCHEMA)
    mv.set_logic_mesh(nodes, edges)
    assert mv.find_entity("old") is None and mv.find_entity("new") is not None


# -- vector track ----------------------------------------------------------


def test_vector_track_lifecycle(spark):
    mv = MemvidSpark(spark)
    assert not mv.has_embeddings()
    assert mv.vector_count() == 0
    assert mv.vec_index_dimension() is None
    assert mv.frame_embedding(0) is None
    assert mv.embedding_identity_summary()["status"] == "unknown"

    a = mv.put_with_embedding("doc alpha", [1.0, 0.0, 0.0, 0.0], model="m1")
    b = mv.put_with_embedding("doc beta", [0.0, 1.0, 0.0, 0.0], model="m1")
    assert mv.has_embeddings() and mv.vector_count() == 2
    assert mv.vec_index_dimension() == 4
    assert mv.effective_vec_index_dimension() == 4
    assert mv.frame_embedding(a) == [1.0, 0.0, 0.0, 0.0]
    assert mv.is_frame_enriched(a)  # embed path marks enriched

    with pytest.raises(ValueError, match="dimension mismatch"):
        mv.add_embeddings([(b, [1.0, 2.0])])
    with pytest.raises(ValueError, match="mixed"):
        mv.add_embeddings([(5, [1.0]), (6, [1.0, 2.0])])

    summ = mv.embedding_identity_summary()
    assert summ["status"] == "single"
    assert summ["identities"][0]["model"] == "m1"
    mv.add_embeddings([(b, [0.5, 0.5, 0.0, 0.0])], model="m2")
    assert mv.embedding_identity_summary()["status"] == "mixed"

    hits = mv.search_embeddings([1.0, 0.0, 0.0, 0.0], k=1).collect()
    assert hits[0].vec_id == a


def test_vector_compression_routing(spark):
    mv = MemvidSpark(spark)
    ids = [
        mv.put_with_embedding(f"doc {i}", [float(i % 5), float(i % 3), float(i % 7), 1.0], dedup=False)
        for i in range(40)
    ]
    exact = [r.vec_id for r in mv.search_embeddings([4.0, 2.0, 6.0, 1.0], k=5).collect()]
    assert mv.vector_compression() == "none"
    with pytest.raises(ValueError):
        mv.set_vector_compression("zfp")
    mv.set_vector_compression("sq8")
    sq8 = [r.vec_id for r in mv.search_embeddings([4.0, 2.0, 6.0, 1.0], k=5).collect()]
    # SQ8 on these well-separated vectors recovers the exact top hit
    assert sq8[0] == exact[0]
    assert set(ids) >= set(sq8)


def test_vector_track_persists(spark, tmp_path):
    mv = MemvidSpark(spark)
    a = mv.put_with_embedding("persisted doc", [1.0, 2.0, 3.0], model="m1")
    mv.set_vector_compression("sq8")
    mv.save(str(tmp_path / "store"))
    re = MemvidSpark.open(spark, str(tmp_path / "store"))
    assert re.vector_count() == 1
    assert re.frame_embedding(a) == [1.0, 2.0, 3.0]
    assert re.vec_index_dimension() == 3
    assert re.vector_compression() == "sq8"


# -- memory binding --------------------------------------------------------


def test_binding_lifecycle(spark):
    mv = MemvidSpark(spark)
    assert mv.get_memory_binding() is None
    mv.set_memory_binding_only("mem-7")
    b = mv.get_memory_binding()
    assert b["memory_id"] == "mem-7" and not b["verified"]
    # rebinding to a different memory raises (MemoryAlreadyBound)
    with pytest.raises(ValueError, match="already bound"):
        mv.set_memory_binding_only("mem-8")
    mv.set_memory_binding_only("mem-7")  # same id is idempotent
    mv.unbind_memory()
    assert mv.get_memory_binding() is None
    assert mv.get_capacity() == 50 * 1024 * 1024  # free tier


# -- batch / commit / finalize ---------------------------------------------


def test_batch_defers_sketch_maintenance(spark):
    mv = MemvidSpark(spark)
    mv.put("seed document about engines")
    assert mv.build_all_sketches() == 1
    mv.begin_batch()
    with pytest.raises(RuntimeError):
        mv.begin_batch()
    for i in range(5):
        mv.put(f"batched document number {i}")
    # track untouched during the batch
    assert mv.sketch_stats()["total_entries"] == 1
    assert mv.end_batch() == 5  # one delta job for the whole batch
    assert mv.sketch_stats()["total_entries"] == 6
    with pytest.raises(RuntimeError):
        mv.end_batch()


def test_commit_and_finalize(spark, tmp_path):
    store = str(tmp_path / "store")
    mv = MemvidSpark(spark)
    mv.put("first doc for commit")
    with pytest.raises(ValueError, match="no store path"):
        mv.commit()
    mv.commit(store)  # explicit path works like save
    assert MemvidSpark.open(spark, store).docs().count() == 1

    mv.put("second doc after open-less commit")
    mv.build_all_sketches()
    mv.commit()  # remembered path; refreshes the sketch track
    assert mv.sketch_stats()["total_entries"] == 2

    mv.put("third doc via bulk path")
    mv.commit_skip_indexes()
    assert not mv.has_sketches()  # derived cleared (stale-index clearing)
    assert mv.finalize_indexes() == 3
    assert mv.sketch_stats()["total_entries"] == 3
    re = MemvidSpark.open(spark, store)
    assert re.docs().count() == 3


# -- chunk planner + chunk embeddings --------------------------------------


def test_preview_chunks_threshold_and_content(spark):
    mv = MemvidSpark(spark)
    assert mv.preview_chunks(b"short text") is None  # under 2400 chars
    long_text = ("spark segment planner chunk preview " * 120).encode()
    chunks = mv.preview_chunks(long_text)
    assert chunks is not None and len(chunks) > 1
    # chunks cover the text in order with the configured overlap
    assert chunks[0].startswith("spark segment planner")
    assert all(isinstance(c, str) and c for c in chunks)


def test_put_with_chunk_embeddings(spark):
    mv = MemvidSpark(spark)
    payload = ("chunked document body " * 50).encode()
    i = mv.put_with_chunk_embeddings(payload, [[1.0, 0.0], [0.0, 1.0]])
    rows = mv.chunk_embeddings().orderBy("chunk_index").collect()
    assert [r.frame_id for r in rows] == [i, i]
    assert [r.chunk_index for r in rows] == [0, 1]
    assert list(rows[0].embedding) == [1.0, 0.0]
    with pytest.raises(ValueError, match="mixed"):
        mv.put_with_chunk_embeddings(b"other payload bytes", [[1.0], [1.0, 2.0]])


def test_plan_from_chunks_budgets(spark):
    mv = MemvidSpark(spark)
    for i in range(12):
        mv.put(f"document number {i} " + ("token " * 100), dedup=False)
    plans = mv.plan_from_chunks(segment_tokens=200).orderBy("segment").collect()
    assert len(plans) > 1
    # every chunk is planned exactly once and spans are contiguous
    total_chunks = sum(p.chunk_count for p in plans)
    from memvid_spark.operators.chunking import chunk_documents

    assert total_chunks == chunk_documents(mv.docs()).count()
    for prev, nxt in zip(plans, plans[1:]):
        assert nxt.token_start == prev.token_end
    # budget respected up to one chunk of overshoot (streaming pack)
    assert all(p.estimated_tokens <= 200 + 40 for p in plans)


def test_plan_segments_page_budget(spark):
    from memvid_spark.operators.chunking import plan_segments

    chunks = spark.createDataFrame(
        [(0, i, 10, 3) for i in range(10)],
        "parent_id long, chunk_index long, n_tokens long, pages long",
    )
    plans = plan_segments(
        chunks, segment_tokens=10_000, segment_pages=6, pages_col="pages"
    ).collect()
    # 10 chunks x 3 pages, 6-page budget → 2 chunks per segment
    assert len(plans) == 5
    assert all(p.estimated_pages == 6 for p in plans)


def test_get_entity_memories(spark):
    mv = MemvidSpark(spark)
    mv.remember("ada", "age", "36")
    mv.remember("grace", "age", "100")
    mv.remember("ada", "likes", "proofs")
    rows = mv.get_entity_memories("ada").collect()
    assert [r.slot for r in rows] == ["age", "likes"]


def test_plan_segments_strict_close_on_overflow(spark):
    """strict=True matches the reference planner: a segment closes
    BEFORE the budget would overflow, so a 1500-token chunk stream with
    a 2048 budget yields one chunk per segment (the default prefix-sum
    assignment would produce ~3000-token segments)."""
    from memvid_spark.operators.chunking import plan_segments

    chunks = spark.createDataFrame(
        [(0, i, 1500) for i in range(6)],
        "parent_id long, chunk_index long, n_tokens long",
    )
    loose = plan_segments(chunks, segment_tokens=2048).orderBy("segment").collect()
    assert any(p.estimated_tokens > 2048 for p in loose)  # documented overshoot

    plans = (
        plan_segments(chunks, segment_tokens=2048, strict=True)
        .orderBy("segment")
        .collect()
    )
    assert len(plans) == 6
    assert all(p.estimated_tokens == 1500 for p in plans)
    # contiguous token spans, lineage intact
    for prev, nxt in zip(plans, plans[1:]):
        assert nxt.token_start == prev.token_end
    assert plans[0].first_chunk.chunk_index == 0
    assert plans[-1].last_chunk.chunk_index == 5

    # page budget closes segments too; an oversized single chunk still
    # gets its own over-budget segment (reference behavior)
    paged = spark.createDataFrame(
        [(0, 0, 10, 3), (0, 1, 10, 3), (0, 2, 10, 9), (0, 3, 10, 3)],
        "parent_id long, chunk_index long, n_tokens long, pages long",
    )
    pp = (
        plan_segments(
            paged, segment_tokens=10_000, segment_pages=6,
            pages_col="pages", strict=True,
        )
        .orderBy("segment")
        .collect()
    )
    assert [p.estimated_pages for p in pp] == [6, 9, 3]
