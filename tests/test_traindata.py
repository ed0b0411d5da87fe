"""Semantic pins for the training-data pipeline operators
(operators/traindata.py) that the synthetic-corpus oracle sweep can't
express: short-doc n-gram guards, planted-contamination recall, the
banded range join vs a naive theta join, packing invariants, and split
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from memvid_spark.operators import traindata


def test_ngram_guard_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "only three tokens"), (2, "a b c d e f g h i"), (3, "")],
        "doc_id long, text string",
    )
    out = traindata.ngram_set(docs, n=8).collect()
    # doc 1 (3 toks) and doc 3 (0 toks) must yield NO grams — Spark's
    # sequence(1, 0) is descending, not empty, without the guard.
    assert {r.doc_id for r in out} == {2}
    assert len(out) == 2  # 9 tokens -> 2 distinct 8-grams


def test_decontaminate_planted_copy(spark):
    bench = "alpha beta gamma delta epsilon zeta eta theta iota"
    docs = spark.createDataFrame(
        [
            (1, bench, "bench"),
            (2, bench, "cand"),  # exact copy -> fully contaminated
            (3, "totally unrelated words nowhere near the benchmark set ok", "cand"),
            (4, "too short", "cand"),  # < 8 tokens -> zero grams
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in traindata.decontaminate(
            docs, F.col("source") == "bench"
        ).collect()
    }
    assert set(out) == {2, 3, 4}
    assert out[2].contamination == 1.0 and out[2].contaminated == 1
    assert out[3].n_hits == 0 and out[3].contaminated == 0
    assert out[4].n_grams == 0 and out[4].contamination == 0.0


def test_banded_pairs_equals_naive_join(spark):
    # Events straddling bucket boundaries: gap = 300s exactly, 1us over,
    # same-bucket pairs, cross-bucket pairs.
    gap_ns = traindata.PAIR_GAP_NS
    rows = [
        (1, 10, 1_000_000_000_000),
        (1, 11, 1_000_000_000_000 + gap_ns),  # exactly gap -> pair
        (1, 12, 1_000_000_000_000 + 2 * gap_ns + 1000),  # 1us past -> no pair w/ 11? (gap exact) yes pair
        (2, 20, 5 * gap_ns - 1000),  # just before a bucket edge
        (2, 21, 5 * gap_ns + 1000),  # just after -> cross-bucket pair
        (3, 30, 7 * gap_ns),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts long")
    got = sorted(
        (r.user_id, r.a_id, r.b_id, r.gap_us)
        for r in traindata.banded_pairs(ev).collect()
    )
    gap_us = gap_ns // 1000
    a = ev.select("user_id", F.col("event_id").alias("a_id"),
                  F.expr("ts div 1000").alias("a_us"))
    b = ev.select("user_id", F.col("event_id").alias("b_id"),
                  F.expr("ts div 1000").alias("b_us"))
    naive = sorted(
        (r.user_id, r.a_id, r.b_id, r.b_us - r.a_us)
        for r in a.join(b, "user_id")
        .filter((F.col("b_us") > F.col("a_us"))
                & (F.col("b_us") - F.col("a_us") <= gap_us))
        .collect()
    )
    assert got == naive and len(got) >= 2


def test_pack_windows_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * (10 + i % 7), "s%d" % (i % 2)) for i in range(40)],
        "doc_id long, text string, source string",
    )
    out = traindata.pack_windows(docs, budget=64).collect()
    # every doc packed exactly once
    assert sum(r.n_docs for r in out) == 40
    # doc-id spans within a grain are disjoint and ordered by shard
    for src in ("s0", "s1"):
        spans = sorted(
            (r.shard, r.first_doc, r.last_doc) for r in out if r.source == src
        )
        for (s1, f1, l1), (s2, f2, l2) in zip(spans, spans[1:]):
            assert l1 < f2 and s1 < s2
    # greedy prefix rule: a shard overflows only by its last doc
    max_doc_tok = 16
    assert all(r.n_tokens <= 64 + max_doc_tok for r in out)


def test_split_assign_deterministic_and_total(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(500)], "doc_id long, text string"
    )
    s1 = {r.doc_id: r.split for r in traindata.split_assign(docs).collect()}
    s2 = {r.doc_id: r.split for r in traindata.split_assign(docs).collect()}
    assert s1 == s2  # no RNG anywhere
    counts = {v: list(s1.values()).count(v) for v in ("train", "val", "test")}
    assert sum(counts.values()) == 500
    # stratification is approximate but must be in the right ballpark
    assert 320 <= counts["train"] <= 470
    assert counts["val"] >= 10 and counts["test"] >= 10
    # a different salt redraws the split
    s3 = {
        r.doc_id: r.split
        for r in traindata.split_assign(docs, salt="other").collect()
    }
    assert s3 != s1


def test_mixture_sample_deterministic_and_exact_bounds(spark):
    docs = spark.createDataFrame(
        [(i, "t", "s%d" % (i % 3)) for i in range(300)],
        "doc_id long, text string, source string",
    )
    rates = {"s0": 1.0, "s1": 0.0}
    a = {r.doc_id for r in traindata.mixture_sample(docs, rates, default_rate=0.5).collect()}
    b = {r.doc_id for r in traindata.mixture_sample(docs, rates, default_rate=0.5).collect()}
    assert a == b  # no RNG
    by_src = {s: [i for i in range(300) if i % 3 == int(s[1])] for s in ("s0", "s1", "s2")}
    assert set(by_src["s0"]) <= a          # rate 1.0 keeps everything
    assert not (set(by_src["s1"]) & a)     # rate 0.0 keeps nothing
    frac = len(set(by_src["s2"]) & a) / 100
    assert 0.3 <= frac <= 0.7              # default 0.5 in the ballpark


def test_vocabulary_size_hll_error_bound(spark):
    """approx_count_distinct (HLL++) must land within ~3*rsd of the
    exact distinct-token count — the sketch path that replaces the
    exact-distinct shuffle at corpus scale (SURVEY §2.4)."""
    from memvid_spark.operators.traindata import vocabulary_size
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    exact = vocabulary_size(docs).head()["n_vocab"]
    approx = vocabulary_size(docs, approx=True, rsd=0.05).head()["n_vocab"]
    assert exact > 0
    assert abs(approx - exact) / exact <= 0.15, (exact, approx)
    # grouped flavor keeps one row per source with a sane estimate
    per_src = {
        r.source: r.n_vocab
        for r in vocabulary_size(docs, group_col="source", approx=True).collect()
    }
    assert per_src and all(v > 0 for v in per_src.values())


def test_heavy_hitters_exact_with_planted_skew(spark):
    # 40 docs of filler + one token planted heavily: 'hot' appears 400x
    rows = [(i, "filler" + str(i) + " words vary here") for i in range(40)]
    rows += [(100 + i, "hot " * 10) for i in range(40)]  # 400 'hot'
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: (r.n, r.threshold)
           for r in traindata.heavy_hitters(docs, phi=0.1).collect()}
    # total tokens = 40*4 + 400 = 560; threshold = ceil(0.1*560) = 56
    assert "hot" in out and out["hot"][0] == 400
    assert out["hot"][1] == 56
    # no token below threshold sneaks through (sketch over-admits are
    # filtered by the exact recount)
    assert all(n >= th for n, th in out.values())
    # per-doc filler tokens (freq 1) never appear
    assert "filler0" not in out


def test_heavy_hitters_matches_exact_groupby(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 17} tok{i % 5}") for i in range(200)],
        "doc_id long, text string",
    )
    got = {(r.token, r.n)
           for r in traindata.heavy_hitters(docs, phi=0.02).collect()}
    from pyspark.sql import functions as F2
    from memvid_spark.functions.text import tokens as _tk
    toks = docs.select(F2.explode(_tk("text")).alias("token"))
    total = toks.count()
    import math
    th = math.ceil(0.02 * total)
    want = {(r.token, r.n) for r in
            toks.groupBy("token").agg(F2.count("*").alias("n"))
            .filter(F2.col("n") >= th).collect()}
    assert got == want


def test_semantic_decontaminate_flags_scaled_copies(spark):
    import math
    rows = []
    # benchmark: two orthogonal-ish vectors
    rows.append((0, [1.0, 0.0, 0.0]))
    rows.append((1, [0.0, 1.0, 0.0]))
    # corpus: a scaled copy of bench 0 (contaminated), an orthogonal
    # vector (clean), and a 45-degree vector (cos ~0.707, clean)
    rows.append((10, [2.0, 0.0, 0.0]))
    rows.append((11, [0.0, 0.0, 1.0]))
    rows.append((12, [1.0, 1.0, 0.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vec_id: (r.max_bench_cos, r.contaminated)
           for r in traindata.semantic_decontaminate(
               emb, F.col("vec_id") < 2, tau=0.999).collect()}
    assert out[10][1] is True and out[10][0] == 1.0
    assert out[11][1] is False and out[11][0] == 0.0
    assert out[12][1] is False
    assert abs(out[12][0] - round(1 / math.sqrt(2), 6)) < 1e-6


def test_budget_select_prefix_semantics(spark):
    from memvid_spark.operators.traindata import budget_select

    # scores: doc 0/1 high diversity, doc 2 low (repeated token)
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),          # 4 toks, q=1000
            (1, "one two three four five six"),     # 6 toks, q=1000
            (2, "spam spam spam spam spam spam"),   # 6 toks, q=166
        ],
        "doc_id long, text string",
    )
    # budget 11: both q=1000 docs fit (4+6=10); boundary bucket q=166
    # has remaining=1 < 6, so doc 2 is excluded
    got = {r.doc_id for r in budget_select(docs, 11).collect()}
    assert got == {0, 1}
    # budget 5: prefix within the q=1000 bucket orders by doc_id asc —
    # doc 0 (4 toks) fits, doc 1 would overflow
    got = {r.doc_id for r in budget_select(docs, 5).collect()}
    assert got == {0}
    # everything fits
    got = {r.doc_id for r in budget_select(docs, 1000).collect()}
    assert got == {0, 1, 2}


def test_stratified_sample_exact_k_and_deterministic(spark):
    from memvid_spark.operators.traindata import stratified_sample

    docs = spark.createDataFrame(
        [(i, f"text {i}", "s" + str(i % 3)) for i in range(60)],
        "doc_id long, text string, source string",
    )
    a = stratified_sample(docs, k=5, stratum_col="source")
    counts = {r.source: r.n for r in a.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts == {"s0": 5, "s1": 5, "s2": 5}
    # deterministic across invocations
    ids1 = sorted(r.doc_id for r in a.collect())
    ids2 = sorted(
        r.doc_id for r in stratified_sample(docs, k=5, stratum_col="source").collect()
    )
    assert ids1 == ids2
