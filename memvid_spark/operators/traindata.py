"""Training-data pipeline operators: decontamination, context-window
packing, deterministic splits, banded range joins.

These extend the reference's surface with the operations a large-scale
LLM training-data pipeline needs (driver mandate). They reuse the
engine's portable primitives (md5-based hash64, the shared tokenizer)
so every output is replayable by the DuckDB oracle.

Scale posture (100 TB):
- ``decontaminate``: the benchmark side of the join is a *benchmark
  suite* — MBs, not TBs — so its distinct n-gram set is broadcast; the
  candidate corpus streams through a single hash join, no shuffle of the
  big side. The n-gram explode is bounded (≤ tokens-n+1 rows per doc)
  and collapses immediately into per-doc counts with map-side partial
  aggregation.
- ``pack_windows``: greedy streaming packing needs a prefix sum, which
  is a window — so the pack *grain* is the partition key (source/shard
  of origin). One shuffle by source, never a global single-partition
  window. At warehouse scale the grain would be (source, date).
- ``split_assign``: pure narrow hash arithmetic on the id — no shuffle,
  no RNG, reproducible across engines and runs.
- ``banded_pairs``: turns the inequality self-join ("events of the same
  user within gap seconds") into an equi-join on (user, time-bucket)
  by exploding ONE side into its two covering buckets — 2× row
  duplication instead of a nested-loop theta join; AQE handles hot
  users.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import hash64
from ..functions.text import tokens, tokens_pinned as _tokens_pinned

DECON_N = 8  # industry-standard contamination n-gram size (8..13)
PACK_BUDGET = 256  # tokens per context window at test scale
SPLIT_SALT = "split"  # salt for the deterministic split hash
PAIR_GAP_NS = 300 * 1_000_000_000  # 5-minute range-join window


def ngram_set(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECON_N,
    keep_cols: list[str] | None = None,
    hashed: bool = False,
) -> DataFrame:
    """Distinct word n-grams per doc: (id, [keep_cols...], gram).

    Docs shorter than ``n`` tokens yield zero rows (guarded — Spark's
    ``sequence(1, 0)`` is descending, not empty).

    ``hashed=True`` replaces the gram string with its 64-bit xxhash64
    BEFORE the distinct — the shuffle and any downstream join move
    8-byte ints instead of ~50-byte strings (the at-scale layout;
    64 bits make collisions negligible). Round 11: the hash moved from
    the md5-backed portable hash64 to native xxhash64 — it is a pure
    within-engine equality key (the only consumer, decontaminate,
    surfaces counts, never hashes; the oracle twin hashes with ITS OWN
    md5 internally, so either way each engine only sees its own
    hash space and outputs agree up to a ~2^-64-scale collision, now
    rarer than the 60-bit md5 slice), and the md5 digest ran twice per
    gram across decontaminate's two branches.
    """
    from ..functions.text import ngram_rows

    keep = tuple(keep_cols or [])
    rows = ngram_rows(docs, n, id_col, text_col, keep_cols=keep)
    if hashed:
        rows = rows.select(
            F.col(id_col), *keep, F.xxhash64(F.col("gram")).alias("gram")
        )
    return rows.distinct()


def decontaminate(
    docs: DataFrame,
    bench_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DECON_N,
) -> DataFrame:
    """Benchmark decontamination: per candidate doc, how many of its
    distinct n-grams collide with the benchmark corpus (rows matching
    ``bench_pred``).

    Output: (id, n_grams, n_hits, contamination, contaminated) for every
    candidate doc — including token-poor docs with zero n-grams.
    """
    # The gram subtree feeds both branches; recomputing it is cheaper
    # than checkpointing on cold runs (measured — codegen compile, not
    # the second compute, dominates cold time).
    grams = ngram_set(
        docs.withColumn("_is_bench", bench_pred), id_col, text_col, n,
        keep_cols=["_is_bench"], hashed=True,
    )
    bench = (
        grams.filter(F.col("_is_bench"))
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # Single pass over the candidate grams: broadcast-left-join the
    # benchmark flags (no shuffle of the big side), then ONE per-doc
    # aggregation yields gram and hit counts together.
    stats = (
        grams.filter(~F.col("_is_bench"))
        .join(F.broadcast(bench), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_hits"),
        )
    )
    base = docs.withColumn("_is_bench", bench_pred).filter(
        ~F.col("_is_bench")
    ).select(id_col)
    return base.join(stats, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.coalesce(
            F.round(F.col("n_hits") / F.nullif(F.col("n_grams"), F.lit(0)), 6),
            F.lit(0.0),
        ).alias("contamination"),
        (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def pack_windows(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    grain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy streaming context-window packing: docs are laid out in
    (grain, id) order and assigned shard = floor(cum_tokens_before /
    budget) — each shard is a pack of consecutive docs totalling ~budget
    tokens. The prefix sum is windowed PER GRAIN (one uniform shuffle).

    Output: one row per (grain, shard) with doc/token totals and the
    id span, ready to drive a partitioned write.
    """
    w = (
        Window.partitionBy(grain_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = F.size(tokens(text_col))
    packed = docs.select(
        F.col(grain_col), F.col(id_col), n_tok.alias("n_tok")
    ).withColumn(
        "shard",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(budget)),
    )
    return packed.groupBy(grain_col, "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def split_assign(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = SPLIT_SALT,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test assignment from the portable 60-bit
    md5 hash of the id: bucket = hash64(id || '#salt') % 100. Stable
    across runs, engines, and cluster sizes; changing the salt redraws
    the split without touching the data.
    """
    bucket = hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))
    ) % 100
    split = (
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.withColumn("split", split)


def banded_pairs(
    events: DataFrame,
    gap_ns: int = PAIR_GAP_NS,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Range self-join via time-bucket banding: all ordered pairs of a
    user's events with 0 < t2-t1 <= gap. Each right-side event explodes
    into its bucket and the previous one, so every qualifying pair meets
    on exactly one (key, bucket) — an equi-join Catalyst can shuffle-
    partition, instead of a nested-loop inequality join.

    Output: (key, a_id, b_id, gap_us). Comparisons and the gap are in
    epoch-micros (per-value truncation from the raw nanos, matching the
    oracle's µs timestamp precision); the ns-grain banding is a strict
    superset of the µs predicate, so no qualifying pair is lost.
    """
    a = events.select(
        F.col(key_col),
        F.col(id_col).alias("a_id"),
        F.expr(f"{ts_col} div 1000").alias("a_us"),
        F.expr(f"{ts_col} div {gap_ns}").alias("bucket"),
    )
    b = events.select(
        F.col(key_col),
        F.col(id_col).alias("b_id"),
        F.expr(f"{ts_col} div 1000").alias("b_us"),
        F.explode(
            F.array(
                F.expr(f"{ts_col} div {gap_ns}"),
                F.expr(f"{ts_col} div {gap_ns}") - 1,
            )
        ).alias("bucket"),
    )
    gap_us = gap_ns // 1000
    return (
        a.join(b, [key_col, "bucket"])
        .filter(
            (F.col("b_us") > F.col("a_us"))
            & (F.col("b_us") - F.col("a_us") <= F.lit(gap_us))
        )
        .select(
            F.col(key_col),
            "a_id",
            "b_id",
            (F.col("b_us") - F.col("a_us")).alias("gap_us"),
        )
    )


MIXTURE_SALT = "mix"


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    grain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = MIXTURE_SALT,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic dataset-mixture construction: keep each doc with its
    grain's sampling rate, decided by the portable md5 hash of the id —
    include iff hash64(id || '#salt') % 10000 < rate * 10000.

    The mixing step of a training-data pipeline (upsample scarce,
    downsample abundant sources) without RNG: reproducible across runs,
    engines and cluster sizes, and pure narrow arithmetic — no shuffle,
    no sort, no sampling pass. Rates are per ten-thousand, so the
    smallest expressible rate is 0.01%.
    """
    bucket = hash64(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}"))
    ) % 10000
    # thresholds as Python ints: double->bigint casts ROUND in DuckDB but
    # TRUNCATE in Spark, so the cutoff must never be computed in floats
    thresh = F.lit(int(round(default_rate * 10000)))
    for src, r in sorted(rates.items()):
        thresh = F.when(
            F.col(grain_col) == src, F.lit(int(round(r * 10000)))
        ).otherwise(thresh)
    return docs.filter(bucket < thresh)


GATE_MIN_TOKENS = 20
GATE_MAX_TOKENS = 70


def quality_gates(
    docs: DataFrame,
    min_tokens: int = GATE_MIN_TOKENS,
    max_tokens: int = GATE_MAX_TOKENS,
    text_col: str = "text",
) -> DataFrame:
    """Gopher/C4-style corpus cleaning: label every doc with the FIRST
    failing quality rule (rule order is part of the contract) or 'kept'.

    Rules: too_short / too_long (token-count bounds), no_stopwords (a
    text with zero function words is boilerplate, a listing, or not
    prose). All rules are narrow Column arithmetic over the shared
    tokenizer — the full corpus is labeled in one scan, no shuffle;
    rejection stats are one map-side-combinable groupBy.

    The tokenizer materializes ONCE per row (``tokens_pinned``) and
    n_tok / n_stop / verdict derive from the pinned columns in layered
    selects — the flat form re-ran the regex split for each of its 4
    references, and a downstream ``verdict == 'kept'`` filter (the
    clean-corpus pipelines) re-inlined the whole chain at the scan for
    a 5th (measured in scratch/plan_shape_tokenize.py). ``verdict`` is
    pinned so consumer filters read the computed column."""
    from ..functions.text import STOPWORDS, pin_expr, tokens_pinned

    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    toked = docs.withColumn("_toks", tokens_pinned(text_col))
    counted = toked.withColumn("n_tok", F.size(F.col("_toks")))
    # the stopword scan stays INSIDE the when-chain (not a column):
    # CaseWhen evaluates lazily, so rows failing the length bounds —
    # most of a raw corpus — never pay the O(|stopwords|·tokens)
    # membership scan (materializing it as a column measured SLOWER
    # than the unpinned form at the 100x probe: 49 vs 37 cpu_s).
    # The gate only needs EXISTENCE of a stopword, not the count, so
    # round 12 swaps size(filter(contains)) == 0 — an interpreted
    # CodegenFallback lambda per element — for NOT arrays_overlap
    # (whole-stage codegen, early-exits on the first hit; identical
    # truth value on the null-free token arrays).
    has_stop = F.arrays_overlap(F.col("_toks"), stop)
    verdict = (
        F.when(F.col("n_tok") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tok") > max_tokens, F.lit("too_long"))
        .when(~has_stop, F.lit("no_stopwords"))
        .otherwise(F.lit("kept"))
    )
    return counted.withColumn("verdict", pin_expr(verdict)).drop("_toks")


def vocabulary_size(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct-token counts, exact or sketched.

    The exact path (`count_distinct`) is the correctness tier; the
    approx path is HyperLogLog++ (`approx_count_distinct`, relative
    standard deviation `rsd`) — at 100 TB a distinct count over a
    trillion-token corpus is exactly where the sketch replaces the
    exact shuffle: partial HLL registers merge map-side, no giant
    distinct exchange (SURVEY §2.4: cube/approx-distinct exposed as
    engine surface on top of the reference's plain counts).

    Output: ([group_col], n_vocab).
    """
    from ..functions.text import tokens

    toks = docs.select(
        *( [F.col(group_col)] if group_col else [] ),
        F.explode(tokens(text_col)).alias("token"),
    )
    agg = (
        F.approx_count_distinct("token", rsd) if approx else F.count_distinct("token")
    ).alias("n_vocab")
    if group_col:
        return toks.groupBy(group_col).agg(agg)
    return toks.agg(agg)


DSIR_BUCKETS = 512  # hashed unigram feature space (paper: 10k buckets)
DSIR_SCALE = 1_000_000  # integer-scaled log-ratios: exact cross-engine sums


def dsir_weights(
    docs: DataFrame,
    target_pred,
    buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169).

    Data Selection via Importance Resampling: score every raw document
    by how target-like its hashed unigram distribution is —
    ``weight = Σ_tokens log p_target(bucket) − log p_raw(bucket)``
    with add-1 smoothing over ``buckets`` hashed features. ``target_pred``
    is a Column predicate choosing the in-domain subset (e.g.
    ``F.col("lang") == "en"``); raw = the whole corpus.

    Log-ratios are rounded to micro units and summed as integers
    (``weight_micro``), so the per-doc sum is exact and identical in
    any engine regardless of float summation order — the same trick as
    the integer-scaled PageRank. Sampling the top of this ranking IS
    the (deterministic flavor of the) paper's resampling step.

    Scale posture: the bucket distribution tables are ``buckets`` rows
    — broadcast; scoring is one explode collapsing into per-doc sums
    with map-side combine; a single scan of the corpus, no self-join.

    Output: (id, n_toks, weight_micro) for docs with >= 1 token.
    """
    from ..functions.hashing import hash64
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col),
        target_pred.alias("_is_target"),
        F.explode(tokens(text_col)).alias("token"),
    ).withColumn("bucket", F.pmod(hash64("token"), F.lit(buckets)))

    counts = toks.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("n_tgt"),
    )
    totals = counts.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_tgt").alias("tot_tgt")
    )
    ratios = counts.join(F.broadcast(totals)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("n_tgt") + 1) / (F.col("tot_tgt") + buckets))
                - F.log((F.col("n_raw") + 1) / (F.col("tot_raw") + buckets))
            )
            * DSIR_SCALE
        )
        .cast("long")
        .alias("lr_micro"),
    )
    return (
        toks.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("lr_micro").alias("weight_micro"),
        )
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    output: position = portable 60-bit hash of (salt, id), shard =
    position mod n_shards.

    Training runs care about data ORDER (curriculum effects, dedup of
    adjacent near-identical examples); a hash position is a full
    deterministic permutation that needs no RNG state, is reproducible
    across engines/runs, and is embarrassingly parallel — pure narrow
    column arithmetic, no shuffle to ASSIGN. Writing then needs exactly
    one `repartition(n_shards, "shard")` + `sortWithinPartitions("pos")`
    — one shuffle to LAY OUT, the minimum any global permutation costs.

    Output: input columns + (pos, shard).
    """
    pos = hash64(
        F.concat(F.lit(salt + "#"), F.col(id_col).cast("string"))
    )
    return docs.withColumn("pos", pos).withColumn(
        "shard", F.pmod(F.col("pos"), F.lit(n_shards)).cast("int")
    )


def shard_stats(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "shard",
) -> DataFrame:
    """Per-shard balance report: (shard, n_docs, n_tokens) — the check
    that hash sharding spread the corpus evenly (skew here means a salt
    or id-distribution problem before any expensive write)."""
    assigned = shard_assign(docs, n_shards=n_shards, id_col=id_col, salt=salt)
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("n_tokens"),
    )


def heavy_hitters(
    docs: DataFrame,
    phi: float = 0.002,
    text_col: str = "text",
) -> DataFrame:
    """Exact phi-heavy hitters via a two-pass Misra-Gries sketch.

    Pass 1 runs a k-counter Misra-Gries summary PER PARTITION
    (mapInPandas; counters persist across the partition's Arrow
    batches) with k = ceil(1/phi). Pigeonhole: any token with global
    frequency > phi*N exceeds n_p/k in at least one partition, so the
    union of per-partition candidates is a SUPERSET of the true heavy
    hitters — the sketch can only over-admit, never miss. Pass 2
    recounts ONLY the candidates exactly (broadcast semi-join) and
    filters on the true threshold, so the output is EXACTLY
    ``GROUP BY token HAVING count >= ceil(phi*N)`` — sketch-accelerated
    but oracle-exact.

    Scale posture: the full-vocabulary shuffle never happens. Pass 1 is
    scan + O(partitions * k) candidate rows; pass 2 shuffles only
    candidate tokens. At 100 TB this is the difference between a
    trillion-row groupBy and a few-thousand-row one.

    Output: (token, n, threshold) for tokens with n >= threshold.
    """
    import math

    from ..functions.text import tokens as _tokens

    k = max(int(math.ceil(1.0 / phi)), 1)
    toks = docs.select(F.explode(_tokens(text_col)).alias("token"))

    def mg(batches):
        # Per-partition EXACT top-k by count — a Misra-Gries-strength
        # superset by the same pigeonhole (at most k tokens can exceed
        # n_p/k in a partition, and any such token is necessarily in the
        # top-k, since k+1 tokens above n_p/k would sum past n_p). Pure
        # vectorized pandas: the row-at-a-time MG loop this replaces ran
        # interpreted Python per token and measured ~4x slower at the
        # 100x probe. Memory is one partition's token column (bounded by
        # the scan split size), counted once in C. A NULL-token row per
        # partition carries the partition's token count, so the global
        # N rides this same pass (round 11 — the standalone
        # toks.count() was a third full tokenize+explode of the
        # corpus).
        import pandas as pd

        parts = [pdf["token"] for pdf in batches]
        if not parts:
            yield pd.DataFrame(
                {"token": pd.Series([], dtype="object"),
                 "cnt": pd.Series([], dtype="int64")}
            )
            return
        col = pd.concat(parts, ignore_index=True)
        counts = col.value_counts()
        cand = counts.nlargest(k).index.to_numpy()
        yield pd.DataFrame(
            {"token": list(cand) + [None],
             "cnt": [0] * len(cand) + [int(len(col))]}
        )

    # tiny (partitions x (k+1) rows): pin it once — candidates AND the
    # total-N both read it, and without the pin each consumer would
    # re-run the corpus sketch pass
    sketch = toks.mapInPandas(mg, "token string, cnt long").localCheckpoint()
    candidates = (
        sketch.filter(F.col("token").isNotNull()).select("token").distinct()
    )
    counted = (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = sketch.filter(F.col("token").isNull()).agg(
        F.sum("cnt").alias("_N")
    )
    return (
        counted.join(F.broadcast(total))
        .withColumn("threshold", F.ceil(F.lit(phi) * F.col("_N")).cast("long"))
        .filter(F.col("n") >= F.col("threshold"))
        .drop("_N")
    )


def semantic_decontaminate(
    emb: DataFrame,
    bench_pred,
    tau: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-tier decontamination: flag corpus vectors whose cosine
    to ANY benchmark vector reaches ``tau`` — catching paraphrased or
    reformatted eval contamination that n-gram decontamination
    (:func:`decontaminate`) misses.

    The benchmark side is an eval suite — thousands of rows, not
    billions — so it BROADCASTS and the check is one scan of the
    corpus with k cosines per row; exact, no ANN recall caveats. The
    n-gram and embedding tiers compose: run both, union the flags.

    Output: (id, max_bench_cos round6, contaminated).
    """
    from ..functions.vector import cosine

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bench = emb.filter(bench_pred).select(
        F.col(id_col).alias("_bid"), v.alias("_bv")
    )
    corpus = emb.filter(~bench_pred).select(F.col(id_col), v.alias("_cv"))
    scored = (
        corpus.join(F.broadcast(bench))
        .groupBy(id_col)
        .agg(F.max(cosine(F.col("_cv"), F.col("_bv"))).alias("_m"))
    )
    return scored.select(
        id_col,
        F.round("_m", 6).alias("max_bench_cos"),
        (F.col("_m") >= tau).alias("contaminated"),
    )


BUDGET_SALT = "strat"  # salt for the stratified-sample hash


def budget_select(
    docs: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select the best documents under a global token budget WITHOUT a
    global sort: the corpus-selection step that turns "we can afford N
    training tokens" into a concrete doc set.

    Semantics (exactly what the oracle's window cumsum computes): order
    docs by (quality desc, id asc), keep the longest prefix whose
    running token total stays <= token_budget. Quality is an integer
    lexical-diversity score, distinct_tokens*1000 div tokens — integer
    division, so every engine agrees bit-for-bit.

    Scale shape: a global ORDER BY + cumulative window would funnel
    100 TB through one reducer. Instead: (1) one scan builds a <=1001-row
    score histogram (map-side combine), (2) the driver finds the
    boundary score b* where the running total first exceeds the budget
    — a broadcast-sized decision, (3) docs scoring above b* pass with a
    filter (no sort anywhere), and only the boundary bucket — ~1/1000 of
    the corpus, set by the score resolution — pays a partitioned window
    to fill the remaining budget. Returns (id, n_toks, score_q).
    """
    from ..functions.text import pin_expr, tokens_pinned

    # one pinned tokenize per row: n_toks and n_uniq read the
    # materialized array (the flat form split twice), and the pinned
    # n_toks keeps the >0 filter from re-inlining the tokenizer
    scored = docs.select(
        F.col(id_col), tokens_pinned(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        pin_expr(F.size(F.col("_toks"))).alias("n_toks"),
        F.size(F.array_distinct(F.col("_toks"))).alias("n_uniq"),
    ).filter(F.col("n_toks") > 0)
    scored = scored.select(
        id_col,
        "n_toks",
        F.expr("n_uniq * 1000 div n_toks").alias("score_q"),
    )
    hist = sorted(
        scored.groupBy("score_q").agg(F.sum("n_toks").alias("tok")).collect(),
        key=lambda r: -r["score_q"],
    )
    cum = 0
    boundary, remaining = None, 0
    for r in hist:
        if cum + r["tok"] > token_budget:
            boundary, remaining = r["score_q"], token_budget - cum
            break
        cum += r["tok"]
    if boundary is None:
        return scored  # everything fits
    full = scored.filter(F.col("score_q") > boundary)
    w = Window.partitionBy("score_q").orderBy(F.asc(id_col))
    partial = (
        scored.filter(F.col("score_q") == boundary)
        .withColumn("run", F.sum("n_toks").over(w))
        .filter(F.col("run") <= remaining)
        .drop("run")
    )
    return full.unionByName(partial)


LM_BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)
LM_SCALE = 1_000_000  # micro-nats: integer log-prob units
NB_BUCKETS = 1024  # hashed feature space of the NB quality classifier
NB_SPLIT_SALT = "nbsplit"  # deterministic train/eval assignment salt


def lm_perplexity(
    docs: DataFrame,
    ref_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    arXiv:1911.00359): train a token-bigram stupid-backoff LM (Brants et
    al. 2007 — "Large Language Models in Machine Translation") on an
    in-domain reference split, score every document by mean log-prob,
    and bucket each ``group_col`` population into head/middle/tail
    terciles — the classic perplexity-filtering signal for pretraining
    corpora.

    Model (reference split only):
      p(w|v) = c2(v,w)/c1ctx(v)                 if the bigram was seen
             = 0.4 * (c1(w)+1)/(T+V)            otherwise (backoff to an
                                                 add-1 unigram, so OOV
                                                 tokens score too)
    Per-bigram log-probs are rounded to integer micro-nats and summed
    as longs — the per-doc total is exact and engine-independent (the
    DSIR trick); the mean (one IEEE division of two exact ints) and the
    tercile ordering on it are therefore bit-portable too.

    Scale posture: the model tables are (distinct reference bigrams) and
    (reference vocab) rows — data-bounded, built with one map-side-
    combinable groupBy each. Scoring is one equi-join of corpus bigrams
    against the model on an engine-internal 64-bit gram hash (8-byte join keys,
    AQE broadcasts the model side when it is small) collapsing straight
    into per-doc sums. Terciles are per-group windows — no global sort.

    Output: (id, group, n_big, lp_sum_micro, avg_lp, bucket) for docs
    with >= 2 tokens; bucket in {'head','middle','tail'}.
    """
    # Bigram construction via arrays_zip of shifted slices stays inside
    # whole-stage codegen (an interpreted zip_with lambda measured 16x
    # slower on the shingle analogue), with both join-key hashes computed
    # once per bigram. Two separate passes, each shaped for its consumer:
    #   - the REF pass carries token strings (the model aggregations
    #     group string-exact, like the oracle) but only over rows where
    #     ref_pred holds — the predicate pushes down to the scan — and is
    #     localCheckpoint-ed because both model tiers read it;
    #   - the CORPUS pass carries only (id, group, bh, wh) and streams
    #     straight into the scoring joins + partial aggregation with no
    #     materialization at all. (A shared string-bearing checkpoint of
    #     the full corpus explode measured 2.4 GB / up to 220 s at the
    #     100x probe — most of it storing strings the scoring side never
    #     reads.)
    toks = tokens(text_col)
    n = F.size(F.col("toks"))
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))).alias("t1"),
    )

    def _bigram_pass(src, *cols, strings: bool):
        # Join-key hashes are xxhash64 (round 11), not the md5-backed
        # portable hash64: bh/wh only ever join Spark-side rows against
        # Spark-side rows (model lookup), the oracle twin joins on its
        # OWN hashes, and no hash reaches the output — so cross-engine
        # replayability buys nothing here while the md5 digest (hex
        # format + string conv, 2 per bigram) dominated the corpus
        # pass's CPU. Tokens are alnum-only (never contain spaces), so
        # hashing the token pair directly preserves exactly the
        # joined-string equality classes the oracle groups on; 64-bit
        # keys also collide less than the 60-bit md5 slice.
        out = [
            F.xxhash64(F.col("z.t0"), F.col("z.t1")).alias("bh"),
            F.xxhash64(F.col("z.t1")).alias("wh"),
        ]
        if strings:
            out = [F.col("z.t0").alias("t0"), F.col("z.t1").alias("t1")] + out
        return (
            src.select(*cols, toks.alias("toks"))
            .select(*cols, F.explode(zipped).alias("z"))
            .filter(F.col("z.t1").isNotNull())
            .select(*cols, *out)
        )

    ref = _bigram_pass(
        docs.filter(ref_pred), F.col(id_col), strings=True
    ).localCheckpoint()
    base = _bigram_pass(docs, F.col(id_col), F.col(group_col), strings=False)
    # bigram tier: c2 per gram + c1ctx per context (sum of c2 over w);
    # grouping on the token pair (string-exact, = the oracle's bg) with
    # the precomputed hash carried through
    c2 = ref.groupBy("t0", "t1", "bh").agg(F.count("*").alias("c2"))
    c1ctx = c2.groupBy(F.col("t0").alias("prev")).agg(F.sum("c2").alias("c1ctx"))
    bg_model = (
        c2.join(c1ctx, c2.t0 == c1ctx.prev)
        .select(
            "bh",
            F.round(F.log(F.col("c2") / F.col("c1ctx")) * LM_SCALE)
            .cast("long")
            .alias("lp2_micro"),
        )
    )
    # unigram tier over reference SECOND tokens (the backoff target is
    # always the continuation word) plus totals for add-1 smoothing
    c1 = ref.groupBy(F.col("t1").alias("w"), F.col("wh").alias("uwh")).agg(
        F.count("*").alias("c1")
    )
    totals = c1.agg(
        F.sum("c1").alias("_T"), F.count("*").alias("_V")
    )
    ug_model = c1.join(F.broadcast(totals)).select(
        F.col("uwh").alias("wh"),
        F.round(
            (F.log(F.lit(LM_BACKOFF))
             + F.log((F.col("c1") + 1) / (F.col("_T") + F.col("_V"))))
            * LM_SCALE
        )
        .cast("long")
        .alias("lp1_micro"),
    )
    scored = (
        base.join(bg_model, "bh", "left")
        .join(ug_model, "wh", "left")
        .join(F.broadcast(totals))
        .withColumn(
            "lp_micro",
            F.coalesce(
                "lp2_micro",
                "lp1_micro",
                F.round(
                    (F.log(F.lit(LM_BACKOFF))
                     - F.log(F.col("_T") + F.col("_V"))) * LM_SCALE
                ).cast("long"),
            ),
        )
        .groupBy(id_col, group_col)
        .agg(
            F.count("*").alias("n_big"),
            F.sum("lp_micro").alias("lp_sum_micro"),
        )
    )
    # mean of two exact longs: one IEEE division — bit-portable; the
    # tercile rank orders on the UNSCALED ratio (the exact expression
    # the oracle sorts on — rescaling could merge ulp-distinct values),
    # ties to id, per group, never globally
    ratio = F.col("lp_sum_micro") / F.col("n_big")
    scored = scored.withColumn("avg_lp", ratio / F.lit(LM_SCALE))
    w = Window.partitionBy(group_col).orderBy(ratio.desc(), F.asc(id_col))
    cnt = Window.partitionBy(group_col)
    rk = F.row_number().over(w)
    n_grp = F.count("*").over(cnt)
    return (
        scored.withColumn("_rk", rk)
        .withColumn("_n", n_grp)
        .select(
            id_col,
            group_col,
            "n_big",
            "lp_sum_micro",
            F.round("avg_lp", 6).alias("avg_lp"),
            F.when(F.col("_rk") * 3 <= F.col("_n"), F.lit("head"))
            .when(F.col("_rk") * 3 <= F.col("_n") * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )


def mixture_weights(
    docs: DataFrame,
    token_budget: int,
    stratum_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled domain-mixture weights — the alpha-sampling
    recipe multilingual/multi-domain pretraining uses (GPT-3 / XLM-R /
    LLaMA data recipes): sampling weight w_d proportional to p_d^alpha
    with alpha=0.5, which up-weights small domains relative to their
    natural share without letting any domain dominate.

    alpha is FIXED at 0.5 so the power is ``sqrt`` — the one libm
    function IEEE-754 requires correctly rounded, hence bit-identical
    across engines (pow(x, 0.5) is not). All derived quantities are
    integer arithmetic over exact micro-unit longs: per-domain raw
    weight rounds to nano units once, the normalization is integer
    division against the exact long total, and the epoch factor
    (how many times the domain's tokens repeat to fill its share of
    ``token_budget``) is integer micro math — no cross-engine float
    summation anywhere.

    Scale posture: one scan with a map-side-combinable groupBy to
    (n_domains) rows; everything after is driver-trivial arithmetic
    kept as column algebra.

    Output: (stratum, n_docs, n_toks, share_ppm, weight_ppm,
    tokens_drawn, epochs_micro).
    """
    per = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens(text_col))).alias("n_toks"),
    )
    tot = per.agg(F.sum("n_toks").alias("_tot"))
    # raw weight: sqrt(p_d) scaled to nano units, rounded ONCE — the
    # only float step, and sqrt of an exact ratio is correctly rounded
    raw = per.join(F.broadcast(tot)).withColumn(
        "_w_nano",
        F.round(F.sqrt(F.col("n_toks") / F.col("_tot")) * 1_000_000_000)
        .cast("long"),
    )
    wtot = raw.agg(F.sum("_w_nano").alias("_wtot"))
    out = raw.join(F.broadcast(wtot)).select(
        "stratum",
        "n_docs",
        "n_toks",
        F.expr("n_toks * 1000000 div _tot").alias("share_ppm"),
        F.expr("_w_nano * 1000000 div _wtot").alias("weight_ppm"),
        F.expr(f"(_w_nano * 1000000 div _wtot) * {token_budget} div 1000000")
        .alias("tokens_drawn"),
    )
    return out.withColumn(
        "epochs_micro", F.expr("tokens_drawn * 1000000 div n_toks")
    )


def nb_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = NB_BUCKETS,
    train_frac_pct: int = 80,
) -> DataFrame:
    """In-engine quality classifier — the fastText-style linear text
    classifier the GPT-3/LLaMA pipelines use for quality filtering,
    as multinomial Naive Bayes over hashed unigram+bigram features.
    NB training is closed-form (count ratios), so unlike SGD models the
    WHOLE pipeline — weak labels, train/eval split, training, scoring —
    is exact relational algebra an independent SQL engine can replay.

    Stages:
      1. weak labels: ``quality_gates`` verdict == 'kept' (label 1/0) —
         classic weak supervision (the gates are the labeling function);
      2. deterministic split: portable hash of the id, ``train`` when
         ``h % 100 < train_frac_pct``;
      3. training (train split only): per hashed feature bucket, add-1
         smoothed log-likelihood ratio in integer micro-nats, plus the
         class-prior logit;
      4. scoring (every doc): prior + sum of bucket LLRs over the doc's
         feature occurrences; predict positive when the logit > 0.

    Features hash through the portable 60-bit md5: unigrams as
    ``u#tok``, bigrams as ``b#prev tok`` — bigrams give the classifier
    word-order signal a bag of words lacks, for free in the same scan.

    Scale posture: the model is <= ``buckets`` rows (broadcast); label
    + split + featurize is one scan that COLLAPSES immediately into a
    per-(doc, bucket) count table (map-side combine), pinned with
    localCheckpoint because training, priors and scoring all read it —
    without the pin the broadcast-model subquery and the scoring pass
    each replay the feature explode + hashing. Labels ride a separate
    per-doc scan joined on the id (an expression dragged through the
    explode re-evaluates per feature occurrence — measured 38 s of a
    0.4 s labeling at sf0.1). Scoring is one broadcast join over the
    compact table collapsing into per-doc sums; evidence =
    sum(n_occ * llr), exact integer arithmetic.

    Output: (id, split, label, n_feats, score_micro, pred).
    """
    from ..functions.text import STOPWORDS

    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(F.col("_toks"))
    # existence, not count: arrays_overlap is the codegen form of
    # size(filter(x -> array_contains(stop, x))) > 0 (round 12)
    label = (
        (n_tok >= GATE_MIN_TOKENS)
        & (n_tok <= GATE_MAX_TOKENS)
        & F.arrays_overlap(F.col("_toks"), stop)
    ).cast("int")
    split = F.when(
        F.pmod(
            hash64(F.concat(F.col(id_col).cast("string"),
                            F.lit(f"#{NB_SPLIT_SALT}"))),
            F.lit(100),
        )
        < train_frac_pct,
        F.lit("train"),
    ).otherwise(F.lit("eval"))
    # The explode carries ONLY the id: any expression referencing the
    # token array that rides through a Generate is re-evaluated per
    # OUTPUT row — the tokenizer + stopword filter behind `label` ran
    # once per feature occurrence instead of once per doc (measured 16 s
    # for a 0.4 s projection at sf0.1). Labels/splits get their own
    # per-doc scan and join back on the id.
    #
    # Feature construction stays in whole-stage codegen: arrays_zip over
    # the token array and its shift-by-one (interpreted transform /
    # zip_with lambdas measured 16x slower at scale). Each zipped row
    # (t0, t1) yields the unigram u#t0 always, plus the bigram b#t0 t1
    # when t1 is non-null (arrays_zip pads the last row with null t1),
    # so one explode produces the exact unigram+bigram multiset.
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice(
            "toks", 2, F.greatest(F.size(F.col("toks")) - 1, F.lit(0))
        ).alias("t1"),
    )
    base = (
        docs.select(F.col(id_col), _tokens_pinned(text_col).alias("toks"))
        .select(F.col(id_col), F.explode(zipped).alias("z"))
        .select(
            F.col(id_col),
            F.explode(
                F.array(
                    F.concat(F.lit("u#"), F.col("z.t0")),
                    F.when(
                        F.col("z.t1").isNotNull(),
                        F.concat(
                            F.lit("b#"), F.col("z.t0"), F.lit(" "), F.col("z.t1")
                        ),
                    ),
                )
            ).alias("feat"),
        )
        .filter(F.col("feat").isNotNull())
        .withColumn("bucket", F.pmod(hash64("feat"), F.lit(buckets)))
    )
    # pinned tokenize: label's three token-array references read one
    # materialized column instead of re-splitting per reference
    meta = docs.withColumn("_toks", _tokens_pinned(text_col)).select(
        F.col(id_col), label.alias("label"), split.alias("split")
    )
    # Collapse the feature stream ONCE to per-(doc, bucket) occurrence
    # counts and pin it: training counts, class priors and corpus scoring
    # all derive from this compact table. Without the checkpoint each of
    # those consumers (including the broadcast-subquery that materializes
    # the model) re-runs the explode + md5 hashing of every feature
    # occurrence.
    fb = (
        base.groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n_occ"))
        .join(meta, id_col)
        .localCheckpoint()
    )

    counts = fb.filter(F.col("split") == "train").groupBy("bucket").agg(
        F.sum(F.when(F.col("label") == 1, F.col("n_occ")).otherwise(0))
        .alias("c_pos"),
        F.sum(F.when(F.col("label") == 0, F.col("n_occ")).otherwise(0))
        .alias("c_neg"),
    )
    feat_tot = counts.agg(
        F.sum("c_pos").alias("_tp"), F.sum("c_neg").alias("_tn")
    )
    llr = counts.join(F.broadcast(feat_tot)).select(
        "bucket",
        F.round(
            (F.log((F.col("c_pos") + 1) / (F.col("_tp") + buckets))
             - F.log((F.col("c_neg") + 1) / (F.col("_tn") + buckets)))
            * LM_SCALE
        )
        .cast("long")
        .alias("llr_micro"),
    )
    # class prior from train-split DOC counts (distinct docs, not tokens);
    # via fb's distinct ids so zero-token docs stay out, as before
    doc_labels = (
        fb.select(id_col, "label", "split").distinct()
    )
    prior = doc_labels.filter(F.col("split") == "train").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("_np"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("_nn"),
    )
    prior_micro = F.round(
        (F.log((F.col("_np") + 1) / (F.col("_np") + F.col("_nn") + 2))
         - F.log((F.col("_nn") + 1) / (F.col("_np") + F.col("_nn") + 2)))
        * LM_SCALE
    ).cast("long")

    scored = (
        fb.join(F.broadcast(llr), "bucket", "left")
        .join(F.broadcast(feat_tot))
        .withColumn(
            "_llr",
            F.coalesce(
                "llr_micro",
                # unseen bucket: add-1 numerators over the same totals
                F.round(
                    (F.log(F.lit(1.0) / (F.col("_tp") + buckets))
                     - F.log(F.lit(1.0) / (F.col("_tn") + buckets)))
                    * LM_SCALE
                ).cast("long"),
            ),
        )
        .groupBy(id_col, "split", "label")
        .agg(
            F.sum("n_occ").alias("n_feats"),
            F.sum(F.col("n_occ") * F.col("_llr")).alias("_evidence"),
        )
    )
    return (
        scored.join(F.broadcast(prior))
        .withColumn("score_micro", F.col("_evidence") + prior_micro)
        .select(
            id_col,
            "split",
            "label",
            "n_feats",
            "score_micro",
            (F.col("score_micro") > 0).cast("int").alias("pred"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = BUDGET_SALT,
) -> DataFrame:
    """Exactly k docs per stratum, chosen by a deterministic pseudo-
    random order (portable md5 hash of the id, ties to the id) — eval
    sets and human-review draws that reproduce across runs, engines and
    cluster sizes, with no RNG state.

    One shuffle by stratum; rank is a per-stratum window, so no global
    sort. A hot stratum is one reducer's sort of that stratum — for
    pathological skew, pre-filter with a hash threshold (keep
    hash % M < c*M*k/stratum_count) before ranking."""
    h = hash64(F.concat(F.col(id_col).cast("string"), F.lit(f"#{salt}")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.asc(id_col))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
