"""Semantic pins for the cluster-level dedup tier
(operators/semdedup.py, traindata.dsir_weights): seed-assignment
determinism, SemDeDup survivor semantics, window-guard behavior,
survivor-selection quality pick, the stop-gram df ceiling, and DSIR's
integer-exact target-likeness ordering."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from memvid_spark.operators import semdedup as sd
from memvid_spark.operators import traindata


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_seed_assign_nearest_seed(spark):
    # Two orthogonal seeds; later vectors land on the nearer one.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),   # -> seed 0
        (3, [0.1, 0.9]),   # -> seed 1
        (4, [2.0, 0.0]),   # scale-invariant: -> seed 0
    ]
    out = {r.vec_id: r.cluster for r in sd.seed_assign(_emb(spark, rows), k=2).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}


def test_seed_assign_tie_breaks_to_lowest_seed(spark):
    # Equidistant from both seeds -> lowest seed id wins.
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])]
    out = {r.vec_id: r.cluster for r in sd.seed_assign(_emb(spark, rows), k=2).collect()}
    assert out[2] == 0


def test_semdedup_marks_later_near_dup(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.001, 0.0]),  # scaled copy of 0 -> dup
        (3, [0.9, 0.1]),    # cluster 0 but cosine ~0.994 < tau -> kept
    ]
    out = {r.vec_id: (r.cluster, r.is_dup) for r in
           sd.semdedup(_emb(spark, rows), k=2, tau=0.999).collect()}
    assert out[0] == (0, False)   # earliest member survives
    assert out[2] == (0, True)    # scaled copy removed
    assert out[3] == (0, False)   # below tau -> kept
    assert out[1] == (1, False)


def test_passage_windows_short_doc_guard(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g h i")],
        "doc_id long, text string",
    )
    out = sd.passage_windows(docs, w=8).collect()
    # doc 1 has 7 tokens -> zero windows; doc 2 has 9 -> two windows.
    assert {r.doc_id for r in out} == {2}
    assert len(out) == 2


def test_passage_dup_stats_full_and_partial_copy(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                          # exact copy: fraction 1.0
            (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),  # unique: fraction 0.0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in sd.passage_dup_stats(docs, w=8).collect()}
    assert out[1].dup_fraction == 1.0 and out[1].flagged
    assert out[2].dup_fraction == 1.0 and out[2].flagged
    assert out[3].dup_fraction == 0.0 and not out[3].flagged
    assert out[1].n_windows == 5  # 12 tokens, w=8 -> 5 windows


def test_fingerprint_edges_df_ceiling_prunes_stop_grams(spark):
    # Every doc shares the same boilerplate; with max_df below the doc
    # count those grams carry no edges, so no pairs emerge.
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, f"doc{i} " + boiler) for i in range(6)],
        "doc_id long, text string",
    )
    none = sd.fingerprint_overlap_edges(docs, k=3, p=1, min_shared=1, max_df=3)
    assert none.count() == 0
    # With the ceiling lifted the shared grams connect everything.
    some = sd.fingerprint_overlap_edges(docs, k=3, p=1, min_shared=1, max_df=100)
    assert some.count() > 0


def test_survivor_selection_longest_then_lowest(spark):
    docs = spark.createDataFrame(
        [
            (1, "short text"),
            (2, "short text plus a longer tail"),
            (3, "short text plus a longer tail"),  # same length as 2
            (9, "unrelated"),
        ],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    out = sd.survivor_selection(docs, edges).collect()
    assert len(out) == 1
    row = out[0]
    # Longest wins; tie between 2 and 3 -> lowest id.
    assert row.survivor_doc == 2
    assert row.n_members == 3 and row.n_removed == 2
    assert row.cluster == 1  # min-label component id


def test_dsir_targetlike_docs_score_higher(spark):
    target_text = "protein genome enzyme receptor cell biology research"
    raw_text = "stock market futures trading revenue quarterly earnings"
    docs = spark.createDataFrame(
        [(i, target_text, "en") for i in range(5)]
        + [(10 + i, raw_text, "de") for i in range(5)]
        + [(100, target_text, "de"), (101, raw_text, "en")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.weight_micro for r in
           traindata.dsir_weights(docs, F.col("lang") == "en").collect()}
    # A doc made of target-distribution tokens outscores one made of
    # raw-only tokens, regardless of its own label.
    assert out[100] > out[101]
    assert out[0] > out[10]
    # Integer micro units: exact equality across identical docs.
    assert out[0] == out[100]


def test_dsir_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} shared common words here", "en" if i % 2 else "fr")
         for i in range(20)],
        "doc_id long, text string, lang string",
    )
    a = sorted(map(tuple, traindata.dsir_weights(docs, F.col("lang") == "en").collect()))
    b = sorted(map(tuple, traindata.dsir_weights(docs, F.col("lang") == "en").collect()))
    assert a == b


def test_dedup_paragraphs_first_occurrence_and_short_kept(spark):
    from memvid_spark.operators.dedup import dedup_paragraphs

    text = "alpha beta\n\nrepeated para\nmiddle\nrepeated para\n\nend"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = dedup_paragraphs(docs).head()
    # second 'repeated para' dropped; BOTH empty separators survive
    assert row.text == "alpha beta\n\nrepeated para\nmiddle\n\nend"
    assert row.n_paras == 7 and row.n_removed == 1
    # no repeats -> unchanged
    clean = spark.createDataFrame(
        [(2, "one\ntwo\nthree")], "doc_id long, text string"
    )
    r2 = dedup_paragraphs(clean).head()
    assert r2.text == "one\ntwo\nthree" and r2.n_removed == 0


def test_semdedup_mega_cluster_guard(spark):
    """A planted mega-cluster (every vector near-identical → one seed
    cluster) must not materialize one O(m²) task: above max_cluster the
    cluster splits into hash sub-shards, each with exactly one survivor
    of the identical chain — bounded per-task rows, bounded recall loss."""
    import numpy as np

    from memvid_spark.operators.semdedup import semdedup

    n = 100
    rows = [(i, [1.0, 0.0, 1e-9 * i]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # unguarded: one cluster, one survivor
    full = semdedup(emb, k=1, tau=0.999, max_cluster=0).collect()
    assert sum(not r.is_dup for r in full) == 1
    assert len(full) == n

    # guarded at 10: ceil(100/10) = 10 hash shards, one survivor each;
    # no task ever sees more than ~n/shards rows of the m² kernel
    guarded = semdedup(emb, k=1, tau=0.999, max_cluster=10).collect()
    assert len(guarded) == n
    survivors = sum(not r.is_dup for r in guarded)
    assert survivors == 10
    # every row still reports its ORIGINAL cluster id
    assert {r.cluster for r in guarded} == {r.cluster for r in full}


def test_seed_assign_scaled_matches_exact_when_fully_probed(spark):
    """With probes >= sqrt(k) every super-group is probed, so the
    two-level path degenerates to exhaustive search and must reproduce
    the exact join path's assignment bit-for-bit (same COS_ROUND
    rounding, same lowest-seed-id tie rule). d=2 keeps the dot product
    a single fma so JVM-fold and NumPy sums are bit-identical."""
    rows = [
        (i, [float((i * 7) % 13) - 6.0, float((i * 11) % 17) - 8.0])
        for i in range(300)
    ]
    emb = _emb_d(spark, rows)
    k = 70  # > SEM_EXACT_K_MAX -> the band semdedup routes to scaled
    exact = {r.vec_id: r.cluster
             for r in sd.seed_assign(emb, k=k).collect()}
    scaled = {r.vec_id: r.cluster
              for r in sd.seed_assign_scaled(emb, k=k, probes=10**6).collect()}
    assert scaled == exact


def test_seed_assign_scaled_null_vector_lowest_seed(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])]
    out = {r.vec_id: r.cluster
           for r in sd.seed_assign_scaled(_emb_d(spark, rows), k=2).collect()}
    assert out[2] == 0  # zero vector -> lowest seed id, exact-path rule


def test_semdedup_autok_small_corpus_exact_band(spark):
    """k=None at small n lands in the exact band (k = ceil(n/target_m)
    <= 64) and still flags planted scaled copies."""
    import math

    # distinct directions 4 degrees apart (cos 0.07 rad = 0.9976 < tau)
    # — angle-spread matters: collinear vectors are exact dups after
    # unit normalization regardless of magnitude
    rows = [(i, [math.cos(i * 0.07), math.sin(i * 0.07)]) for i in range(20)]
    rows += [(100 + i, [v * 1.001 for v in rows[i][1]]) for i in range(4)]
    out = {r.vec_id: r.is_dup
           for r in sd.semdedup(_emb_d(spark, rows), k=None,
                                tau=0.999, target_m=8).collect()}
    assert len(out) == 24
    for i in range(4):
        # the planted copy has cosine exactly 1 with its original; the
        # EARLIER id survives, the copy is marked dup
        assert out[100 + i] is True
        assert out[i] is False


def test_semdedup_autok_scaled_band_flags_planted_dups(spark):
    """target_m small enough that auto-k > SEM_EXACT_K_MAX routes the
    assignment through the two-level matmul path; planted scaled copies
    are coincident with their originals so they share a cluster no
    matter where the IVF boundary falls, and must come back flagged."""
    rows = [
        (i, [float((i * 3) % 11) + 1.0, float((i * 5) % 7), 1.0])
        for i in range(200)
    ]
    planted = [(1000 + i, [v * 1.001 for v in rows[i][1]]) for i in range(0, 200, 10)]
    emb = _emb_d(spark, rows + planted)
    got = sd.semdedup(emb, k=None, tau=0.999, target_m=2).collect()
    out = {r.vec_id: r.is_dup for r in got}
    assert len(out) == 220
    for i in range(0, 200, 10):
        assert out[1000 + i] is True, f"planted copy of {i} not flagged"


def _emb_d(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_seed_assign_scaled_sub_split_invariance(spark):
    """The distributed path's per-task bound (group_rows → sub-split of
    each super-group's row side) is an execution-shape knob, never a
    semantics knob: a tiny group_rows that forces many sub-slices must
    reproduce the unsplit assignment row-for-row, at partial AND full
    probes. k > s² here (k=80, s=9) so several seeds share every
    super-group — the regime the seed-block cogroup exists for."""
    rows = [
        (i, [float((i * 7) % 13) - 6.0, float((i * 11) % 17) - 8.0,
             float((i * 5) % 9) - 4.0])
        for i in range(400)
    ]
    emb = _emb_d(spark, rows)
    k = 80
    for probes in (2, 10**6):
        a = {r.vec_id: r.cluster
             for r in sd.seed_assign_scaled(
                 emb, k=k, probes=probes).collect()}
        b = {r.vec_id: r.cluster
             for r in sd.seed_assign_scaled(
                 emb, k=k, probes=probes, group_rows=16).collect()}
        assert a == b, f"sub-split changed assignment at probes={probes}"
    exact = {r.vec_id: r.cluster for r in sd.seed_assign(emb, k=k).collect()}
    full = {r.vec_id: r.cluster
            for r in sd.seed_assign_scaled(
                emb, k=k, probes=10**6, group_rows=16).collect()}
    assert full == exact


def test_seed_assign_scaled_covers_every_row(spark):
    """Every corpus row comes back exactly once — including rows whose
    probed super-groups hold no seeds and null/zero vectors (both take
    the lowest seed id via the fallback union)."""
    rows = [(i, [math.cos(i * 0.21), math.sin(i * 0.21)])
            for i in range(150)]
    rows += [(500, [0.0, 0.0]), (501, None)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sd.seed_assign_scaled(emb, k=70, probes=1).collect()
    assert len(out) == 152
    got = {r.vec_id: r.cluster for r in out}
    assert got[500] == 0 and got[501] == 0


def test_seed_assign_scaled_per_group_split_under_skew(spark):
    """Zipfy probe mass: ~90% of rows hug ONE super-seed's region. The
    per-group sub-split (sampled probe estimate) must keep the hot
    group's tasks bounded as an execution shape WITHOUT changing the
    assignment: the skewed corpus with a tiny group_rows reproduces the
    unsplit run row-for-row, and fully probed reproduces the exact
    path — the semantics pin for the split-sizing rework."""
    rows = [
        (i, [10.0 + ((i * 7) % 5) * 0.01, ((i * 11) % 9) * 0.01, 1.0])
        for i in range(360)
    ]
    rows += [
        (400 + i, [-(float(i % 4)) - 1.0, float(i % 7), -2.0])
        for i in range(40)
    ]
    emb = _emb_d(spark, rows)
    k = 80
    for probes in (2, 10**6):
        a = {r.vec_id: r.cluster
             for r in sd.seed_assign_scaled(emb, k=k, probes=probes).collect()}
        b = {r.vec_id: r.cluster
             for r in sd.seed_assign_scaled(
                 emb, k=k, probes=probes, group_rows=8).collect()}
        assert a == b, f"per-group split changed assignment at probes={probes}"
    exact = {r.vec_id: r.cluster for r in sd.seed_assign(emb, k=k).collect()}
    full = {r.vec_id: r.cluster
            for r in sd.seed_assign_scaled(
                emb, k=k, probes=10**6, group_rows=8).collect()}
    assert full == exact


def _rand_rows(n, dim=6):
    return [
        (i, [((i * (d + 3)) % 23) * 0.1 + (3.0 if d == i % dim else 0.0)
             for d in range(dim)])
        for i in range(n)
    ]


def test_mark_cluster_dups_factors_semdedup_kernel(spark):
    """mark_cluster_dups over a precomputed assignment IS semdedup's
    pairwise stage (q184 runs it over both assignment paths): semdedup
    == seed_assign |> mark_cluster_dups row-for-row."""
    from memvid_spark.operators.dedup import plant_near_dups
    from memvid_spark.operators.semdedup import (
        mark_cluster_dups,
        seed_assign,
        semdedup,
    )

    emb = plant_near_dups(_emb(spark, _rand_rows(120)), every=10)
    a = semdedup(emb, k=8, tau=0.999)
    b = mark_cluster_dups(seed_assign(emb, k=8), tau=0.999)
    rows = lambda df: sorted(  # noqa: E731
        (r.vec_id, r.cluster, r.is_dup) for r in df.collect()
    )
    assert rows(a) == rows(b)


def test_scaled_assignment_preserves_dup_mass_at_shipping_probes(spark):
    """The q184 invariant at test scale: on a corpus WITH cluster
    structure the probes=2 scaled assignment agrees with exact
    everywhere; on the raw isotropic corpus agreement degrades to
    boundary noise by construction, but the DUPLICATE MASS the
    pipeline consumes stays intact (planted near-dup pairs move
    between clusters together)."""
    from pyspark.sql import functions as F

    from memvid_spark.operators.dedup import plant_near_dups
    from memvid_spark.operators.semdedup import (
        mark_cluster_dups,
        seed_assign,
        seed_assign_scaled,
    )

    base = _emb(spark, _rand_rows(200))
    clustered = base.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            + F.when(
                i == (F.col("vec_id") % 4).cast("int"), F.lit(8.0)
            ).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    planted = plant_near_dups(clustered, every=10).localCheckpoint()
    exact = seed_assign(planted, k=16).localCheckpoint()
    scaled = seed_assign_scaled(planted, k=16, probes=2).localCheckpoint()
    j = exact.select("vec_id", F.col("cluster").alias("ce")).join(
        scaled.select("vec_id", F.col("cluster").alias("cs")), "vec_id"
    )
    agg = j.agg(
        F.count("*").alias("n"),
        F.sum((F.col("ce") == F.col("cs")).cast("int")).alias("agree"),
    ).head()
    assert agg.agree / agg.n >= 0.95
    de = mark_cluster_dups(exact).filter("is_dup").count()
    ds = mark_cluster_dups(scaled).filter("is_dup").count()
    assert de == ds and de >= 20  # every planted copy marked either way
