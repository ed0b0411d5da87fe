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


def test_lm_perplexity_backoff_tiers_hand_computed(spark):
    """Pin all three scoring tiers of the stupid-backoff LM against
    hand-computed micro-nat values on a 4-doc corpus.

    Reference split (lang='en'): "a b a b" and "a c"
      bigrams: (a b) x2, (b a), (a c)  ->  c1ctx(a)=3, c1ctx(b)=1
      unigram (continuation) counts: b=2, a=1, c=1 -> T=4, V=3
    """
    import math

    from memvid_spark.operators.traindata import lm_perplexity

    docs = spark.createDataFrame(
        [
            (1, "a b a b", "en"),
            (2, "a c", "en"),
            (3, "a b", "zh"),   # seen bigram tier
            (4, "b c", "zh"),   # unigram backoff tier (c seen, (b c) not)
            (5, "x y", "zh"),   # OOV tier (y unseen anywhere)
        ],
        "doc_id long, text string, lang string",
    )
    out = {
        r.doc_id: r
        for r in lm_perplexity(docs, F.col("lang") == "en").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    micro = lambda x: round(x * 1_000_000)  # noqa: E731
    assert out[3].lp_sum_micro == micro(math.log(2 / 3))
    assert out[4].lp_sum_micro == micro(math.log(0.4) + math.log(2 / 7))
    assert out[5].lp_sum_micro == micro(math.log(0.4) - math.log(7))
    # doc 1: (a b)+(b a)+(a b) = 2*ln(2/3) + ln(1/1)
    assert out[1].lp_sum_micro == 2 * micro(math.log(2 / 3)) + micro(0.0)
    assert out[1].n_big == 3
    # terciles partition each lang group: en has 2 docs -> ranks 1,2 of 2
    # give buckets middle/tail (rk*3<=n fails for both)
    assert {out[1].bucket, out[2].bucket} == {"middle", "tail"}
    assert sorted(out[d].bucket for d in (3, 4, 5)) == [
        "head", "middle", "tail"
    ]


def test_mixture_weights_alpha_flattening(spark):
    """sqrt-temperature sampling upweights the small domain relative to
    its natural share, weights sum to ~1e6, and every derived integer
    matches the closed-form recomputation."""
    import math

    from memvid_spark.operators.traindata import mixture_weights

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * 90), "big") for i in range(3)]
        + [(100 + i, " ".join(["tok"] * 10), "small") for i in range(1)],
        "doc_id long, text string, lang string",
    )
    rows = {
        r.stratum: r
        for r in mixture_weights(docs, token_budget=50000).collect()
    }
    big, small = rows["big"], rows["small"]
    assert big.n_toks == 270 and small.n_toks == 10
    w_big = round(math.sqrt(270 / 280) * 1_000_000_000)
    w_small = round(math.sqrt(10 / 280) * 1_000_000_000)
    tot = w_big + w_small
    assert big.weight_ppm == w_big * 1_000_000 // tot
    assert small.weight_ppm == w_small * 1_000_000 // tot
    # flattening: small domain's sampling weight exceeds natural share
    assert small.weight_ppm > small.share_ppm
    assert big.weight_ppm < big.share_ppm
    # weights sum to 1e6 up to per-stratum truncation
    assert 1_000_000 - 2 <= big.weight_ppm + small.weight_ppm <= 1_000_000
    # epoch factor: tokens drawn over tokens owned
    assert small.epochs_micro == small.tokens_drawn * 1_000_000 // 10


def test_pii_regex_counts_ground_truth(spark):
    """The PII catalog actually matches what it claims to match —
    non-zero ground-truth counts, not just cross-engine agreement."""
    from memvid_spark.functions.extract import (
        EMAIL_RE,
        PHONE_RE,
        SSN_RE,
        mask_pii,
    )

    txt = (
        "mail a@b.co and c.d+e@f.org call 555-123-4567 "
        "ssn 123-45-6789 but not 12-345-6789 or 1234-56-7890"
    )
    df = spark.createDataFrame([(1, txt)], "doc_id long, text string")
    r = df.select(
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).alias("e"),
        F.size(F.regexp_extract_all("text", F.lit(SSN_RE), F.lit(0))).alias("s"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), F.lit(0))).alias("p"),
        mask_pii(F.col("text")).alias("m"),
    ).head()
    assert (r.e, r.s, r.p) == (2, 1, 1)
    assert "[EMAIL]" in r.m and "[SSN]" in r.m and "[PHONE]" in r.m
    assert "a@b.co" not in r.m and "123-45-6789" not in r.m


def test_nb_classifier_separates_planted_classes(spark):
    """The NB quality classifier must actually learn: positives (gate-
    passing prose built from vocab A) and negatives (too-short docs from
    vocab B) are perfectly separable, so held-out accuracy is 1.0."""
    from memvid_spark.operators.traindata import nb_quality_classifier

    pos_text = " ".join(
        ["the data table merge spark row batch scan key value"] * 3
    )  # 30 tokens, has stopword 'the' -> label 1
    rows = [(i, pos_text) for i in range(40)] + [
        (100 + i, "zork blip quux flerb") for i in range(40)
    ]  # 4 tokens -> too_short -> label 0
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = nb_quality_classifier(docs).collect()
    assert len(out) == 80
    splits = {r.split for r in out}
    assert splits == {"train", "eval"}  # both splits populated
    ev = [r for r in out if r.split == "eval"]
    assert len(ev) >= 5
    assert all(r.pred == r.label for r in ev), [
        (r.doc_id, r.label, r.pred) for r in ev if r.pred != r.label
    ]
