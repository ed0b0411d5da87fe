"""Sketch track: distributed entries vs the driver-side integer twin,
query-sketch gating/scoring semantics, and the facade surface
(src/memvid/sketch.rs, src/types/sketch_track.rs)."""

from __future__ import annotations

import pytest

from memvid_spark.api import MemvidSpark
from memvid_spark.operators import sketchtrack as sk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXTS = [
    (0, "spark joins use hash partitioning for large distributed tables"),
    (1, "window functions rank rows within partitions of a table"),
    (2, "spark joins use hash partitioning for large distributed tables!"),
    (3, "a b c d"),  # single-char tokens only → skipped entirely
    (4, "vector similarity search with quantized embeddings " * 20),
]


@pytest.mark.parametrize("variant", ["small", "medium", "large"])
def test_entries_match_driver_twin(spark, variant):
    """The distributed builder and py_sketch_entry are the same integer
    math (the twin is also the insert_sketch path)."""
    rows = (
        sk.sketch_entries(_docs(spark, TEXTS), variant)
        .orderBy("doc_id")
        .collect()
    )
    words = sk.filter_word_cols(variant)
    got = {r.doc_id: r for r in rows}
    assert 3 not in got  # no token of length ≥ 2 → no entry (sketch.rs:124)
    for doc_id, text in TEXTS:
        if doc_id == 3:
            continue
        e = sk.py_sketch_entry(text, variant)
        r = got[doc_id]
        assert r.simhash == e["simhash"], doc_id
        assert [r[w] for w in words] == e["filter_words"], doc_id
        assert list(r.top_terms) == e["top_terms"], doc_id
        assert r.term_weight_sum == e["term_weight_sum"]
        assert r.token_count == e["token_count"]
        assert r.length_hint == e["length_hint"]
        assert r.short_text == e["short_text"]


def test_identical_docs_share_sketch_and_punctuation_is_invisible(spark):
    rows = {r.doc_id: r for r in sk.sketch_entries(_docs(spark, TEXTS)).collect()}
    assert rows[0].simhash == rows[2].simhash
    assert rows[0].f0 == rows[2].f0 and rows[0].f1 == rows[2].f1
    assert list(rows[0].top_terms) == list(rows[2].top_terms)


def test_weight_cap_matches_reference():
    """TF capped at 3 then scaled ×100 (compute_token_weights,
    sketch_track.rs:668-698)."""
    e3 = sk.py_sketch_entry("term term term")
    e9 = sk.py_sketch_entry("term term term term term term term term term")
    assert e3["term_weight_sum"] == e9["term_weight_sum"] == 300
    assert e3["simhash"] == e9["simhash"]


def test_candidate_gates(spark):
    """Term-filter gate rejects disjoint vocab; Hamming gate is a hard
    threshold; scoring favors the doc sharing top terms."""
    entries = sk.sketch_entries(_docs(spark, TEXTS))
    # Disjoint vocabulary: no shared token → no filter-word overlap is
    # not guaranteed (Bloom FPs), but identical text scores highest.
    cands = sk.sketch_candidates(
        entries,
        "spark joins use hash partitioning for large distributed tables",
        hamming_threshold=60,
        max_candidates=10,
    ).collect()
    assert [c.doc_id for c in cands[:2]] == [0, 2]
    assert cands[0].hamming == 0
    assert cands[0].matching_top_terms == len(
        sk.query_sketch(TEXTS[0][1])["top_terms"]
    )
    # tight Hamming gate keeps only the exact-vocabulary docs
    tight = sk.sketch_candidates(
        entries, TEXTS[0][1], hamming_threshold=0, max_candidates=10
    ).collect()
    assert {c.doc_id for c in tight} == {0, 2}


def test_no_false_negatives_on_shared_query_terms(spark):
    """A doc containing every query token always passes the term filter
    (Bloom property: subset of set bits)."""
    entries = sk.sketch_entries(_docs(spark, TEXTS))
    qs = sk.query_sketch("hash partitioning")
    row = entries.filter("doc_id = 0").head()
    assert any(
        (row[f"f{i}"] & qs["filter_words"][i]) != 0
        for i in range(len(qs["filter_words"]))
    )


def test_score_formula_hand_example():
    """score = 0.5·overlap/terms + 0.4·(1 − ham/60) + 0.1·len-compat,
    verified against a hand-computed value (sketch_track.rs:823-860)."""
    # identical text → ham 0, full overlap, same length bucket
    e = sk.py_sketch_entry(TEXTS[0][1])
    assert e["length_hint"] == 0  # 9 tokens
    expected = 0.5 * 1.0 + 0.4 * 1.0 + 0.1 * 1.0
    assert abs(expected - 1.0) < 1e-9


def test_facade_sketch_surface(spark):
    mv = MemvidSpark(spark)
    for _, text in TEXTS[:3]:
        mv.put(text, dedup=False)
    assert not mv.has_sketches()
    assert mv.sketch_stats()["total_entries"] == 0
    n = mv.build_all_sketches()
    assert n == 3 and mv.has_sketches()
    st = mv.sketch_stats()
    assert st["total_entries"] == 3
    assert st["short_text_entries"] == 3  # all under 50 tokens
    assert st["track_bytes"] == 3 * 32  # Small entries are 32 bytes
    # idempotent: nothing new to sketch
    assert mv.build_all_sketches() == 0
    # a new put is picked up incrementally
    mv.put("an entirely different document about stream processing windows")
    assert mv.build_all_sketches() == 1
    assert mv.sketch_stats()["total_entries"] == 4

    cands, stats = mv.find_sketch_candidates_with_stats(
        "spark joins hash partitioning", hamming_threshold=60, max_candidates=10
    )
    got = cands.collect()
    assert got and got[0].doc_id in (0, 2)
    assert stats["frames_scanned"] == 4
    assert stats["candidates_returned"] == len(got)
    assert stats["term_filter_hits"] >= stats["simhash_hits"] >= len(got)


def test_facade_insert_sketch_matches_builder(spark):
    mv = MemvidSpark(spark)
    i = mv.put(TEXTS[0][1])
    entry = mv.insert_sketch(i, TEXTS[0][1])
    assert mv.has_sketches()
    row = mv._sketches.head()
    assert row.simhash == entry["simhash"]
    assert row.term_weight_sum == entry["term_weight_sum"]
    # re-inserting replaces, not duplicates (sketch track is keyed)
    mv.insert_sketch(i, "completely new text for this frame")
    assert mv.sketch_stats()["total_entries"] == 1
    # empty text still records a SHORT_TEXT zero entry (generate_sketch
    # on no tokens, sketch_track.rs:727-731)
    j = mv.put("??")
    e = mv.insert_sketch(j, "??")
    assert e["simhash"] == 0 and e["short_text"] and e["token_count"] == 0
    assert mv.sketch_stats()["total_entries"] == 2
    assert mv.sketch_stats()["short_text_entries"] == 2


def test_read_only_store_rejects_sketch_mutation(spark, tmp_path):
    mv = MemvidSpark(spark)
    mv.put("some document text for the store")
    mv.save(str(tmp_path / "store"))
    ro = MemvidSpark.open(spark, str(tmp_path / "store"), read_only=True)
    with pytest.raises(PermissionError):
        ro.build_all_sketches()
    with pytest.raises(PermissionError):
        ro.insert_sketch(0, "text")


def test_variant_is_fixed_per_track(spark):
    """One variant per track (sketch_track.rs:869-875): mixing entry
    widths raises; finalize_indexes rebuilds under the new variant."""
    mv = MemvidSpark(spark)
    mv.put("document one about engines and joins")
    mv.build_all_sketches("small")
    with pytest.raises(ValueError, match="variant"):
        mv.build_all_sketches("medium")
    with pytest.raises(ValueError, match="variant"):
        mv.insert_sketch(0, "text", "large")
    assert mv.finalize_indexes("medium") == 1
    assert mv._sketch_variant == "medium"


def test_fuzz_entries_match_twin_one_job(spark):
    """Seeded fuzz: 150 adversarial texts (unicode, punctuation runs,
    repeated tokens, digits, empties) through the distributed builder in
    ONE job, every entry compared to the driver twin. (Charset avoids
    locale-dependent lowercasing like Greek final sigma, where JVM and
    Python disagree by design.)"""
    import random

    rng = random.Random(20260814)
    frags = [
        "hash", "join", "Vector", "MERGE", "é", "ñu", "汉字", "42", "x1",
        "??", "--", "  ", "\t", ".", "token token token", "Ümlaut",
        "a", "b2", "scan-scan", "N0", "🎉", "under_score", "",
    ]
    texts = []
    for i in range(150):
        n = rng.randint(0, 30)
        texts.append((i, " ".join(rng.choice(frags) for _ in range(n))))
    rows = {r.doc_id: r for r in sk.sketch_entries(_docs(spark, texts)).collect()}
    checked = 0
    for doc_id, text in texts:
        e = sk.py_sketch_entry(text)
        if e["token_count"] == 0:
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert r.simhash == e["simhash"], (doc_id, text)
        assert [r.f0, r.f1] == e["filter_words"], (doc_id, text)
        assert list(r.top_terms) == e["top_terms"], (doc_id, text)
        assert r.term_weight_sum == e["term_weight_sum"], (doc_id, text)
        assert r.token_count == e["token_count"], (doc_id, text)
        checked += 1
    assert checked > 50  # the fuzz actually exercised non-empty docs


def test_fuzz_candidates_match_pure_python_scorer(spark):
    """Independent reimplementation check: the distributed candidate
    scorer vs a from-scratch Python scorer over the same entries
    (Decimal HALF_UP emulates Spark's F.round)."""
    import random
    from decimal import ROUND_HALF_UP, Decimal

    rng = random.Random(7)
    vocab = ["hash", "join", "vector", "merge", "scan", "sort", "spill",
             "shuffle", "codec", "frame", "token", "index"]
    texts = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 60))))
        for i in range(80)
    ]
    entries = sk.sketch_entries(_docs(spark, texts))
    query = "hash join spill codec"
    got = sk.sketch_candidates(
        entries, query, hamming_threshold=20, max_candidates=1000
    ).collect()

    qs = sk.query_sketch(query)
    qb = min(qs["token_count"] // 10, 255)
    mt_max = max(len(qs["top_terms"]), 1)
    expected = {}
    for r in entries.collect():
        if not any(
            (r[f"f{i}"] & qs["filter_words"][i]) != 0 for i in range(2)
        ):
            continue
        ham = bin(r.simhash ^ qs["simhash"]).count("1")
        if ham > 20:
            continue
        mt = sum(1 for t in r.top_terms if t != 0 and t in qs["top_terms"])
        score = (
            0.5 * (mt / float(mt_max))
            + 0.4 * (1.0 - ham / 60.0)
            + 0.1 * (1.0 / (1.0 + 0.1 * abs(r.length_hint - qb)))
        )
        score = float(
            Decimal(repr(score)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        expected[r.doc_id] = (score, ham, mt)
    assert {c.doc_id for c in got} == set(expected)
    for c in got:
        s, h, m = expected[c.doc_id]
        assert abs(c.score - s) < 2e-6, c
        assert (c.hamming, c.matching_top_terms) == (h, m)
