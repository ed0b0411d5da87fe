"""Unified per-frame sketch entries + query-sketch candidate scoring.

The reference's sketch track (src/memvid/sketch.rs:1-260,
src/types/sketch_track.rs:384-548,650-861) stores one fixed-size
micro-index per frame — a 64-bit TF-weighted SimHash, a small Bloom-like
term filter, the hashed top-weight terms, and a length hint — and scores
a query sketch against every entry with
``0.5·term_overlap + 0.4·simhash_sim + 0.1·length_compat``
(sketch_track.rs:823-860) to produce rerank candidates without touching
text.

Spark re-expression: the whole entry table is two map-side-combinable
aggregations over the token postings (one wide groupBy for SimHash votes
+ filter words + token counts, one windowed top-k for the top terms)
joined on the doc id — no Python in the hot path, and every derived
value is md5-arithmetic the DuckDB oracle replays bit-for-bit
(functions/hashing.py rationale). Scoring against a query is a single
scan over the entry table with all query-side values inlined as
literals: at 100 TB the entry table is ~32 bytes/doc and the scan is
embarrassingly parallel, exactly the reference's design goal.

Deviations from the reference, all forced by engine portability and
documented here once: blake3 token hashes → 60-bit md5 hashes (shared
repo convention), so the SimHash is 60-bit and ``sim_score`` divides by
60 (not 64); the term filter is ``words × 60``-bit BIGINT words (120
bits for Small vs the reference's 128) with the same 3-probe scheme
(h, h>>16, h>>32 — sketch_track.rs:607-626). Weights match exactly:
``min(tf,3) * 100`` with default IDF 1.0 (compute_token_weights,
sketch_track.rs:668-698); tokens are lowercased alnum runs of length
≥ 2 (tokenize_for_sketch, sketch_track.rs:650-662).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.hashing import hash64
from ..functions.text import tokens

WORD_BITS = 60  # portable signed-64 bit words (repo-wide convention)
SIMHASH_BITS = 60
TF_CAP = 3
WEIGHT_SCALE = 100
SHORT_TEXT_TOKENS = 50  # sketch_track.rs:758 flags sketches under 50 tokens
MAX_LENGTH_HINT = 255  # token_count/10 bucketed into a byte
MAX_TERM_WEIGHT_SUM = 65_535  # stored as u16 in the reference entry

# variant → (filter words, top-term count, entry bytes for stats parity)
# (sketch_track.rs:109-160: Small 16B filter / 2 terms / 32B entry, ...)
VARIANTS = {
    "small": (2, 2, 32),
    "medium": (4, 4, 64),
    "large": (8, 6, 96),
}

DEFAULT_HAMMING_THRESHOLD = 10  # sketch_track.rs:72
DEFAULT_MAX_CANDIDATES = 2000  # sketch.rs:38
U32_MASK = 0xFFFFFFFF


def _variant(name: str) -> tuple[int, int, int]:
    try:
        return VARIANTS[name]
    except KeyError:
        raise ValueError(f"unknown sketch variant {name!r}; one of {sorted(VARIANTS)}")


def filter_word_cols(variant: str = "small") -> list[str]:
    words, _, _ = _variant(variant)
    return [f"f{i}" for i in range(words)]


def sketch_entries(
    docs: DataFrame,
    variant: str = "small",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc sketch entries (generate_sketch, sketch_track.rs:719-776).

    Output: (id, simhash, f0..f{W-1}, top_terms array<long> in weight
    order, term_weight_sum, token_count, length_hint, short_text).
    Docs with no qualifying token produce no entry, matching
    build_all_sketches' empty-text skip (sketch.rs:124-152).
    """
    words, top_k, _ = _variant(variant)
    filter_bits = words * WORD_BITS

    toks = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).filter(F.length("tok") >= 2)
    # tf counts per (doc, token) with md5 AFTER the aggregation — one
    # hash per distinct pair, not per occurrence. (A hash-keyed
    # groupBy(doc, hash64(tok)) variant measured 4x SLOWER end-to-end at
    # the 100x probe: the dictionary-encoded token strings aggregate
    # cheaper than freshly-computed longs, and the tops window below
    # re-consumes this table.)
    post = (
        toks.groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
        .select(
            F.col(id_col),
            F.col("tf"),
            (F.least(F.col("tf"), F.lit(TF_CAP)) * WEIGHT_SCALE).alias("w"),
            hash64("tok").alias("h"),
        )
        .withColumn(
            "hu32",
            F.expr(f"(h ^ shiftright(h, 32)) & {U32_MASK}"),
        )
        .withColumn("p1", F.expr(f"h % {filter_bits}"))
        .withColumn("p2", F.expr(f"shiftright(h, 16) % {filter_bits}"))
        .withColumn("p3", F.expr(f"shiftright(h, 32) % {filter_bits}"))
    )

    # One wide aggregation: 60 SimHash vote sums + W filter-word bit_ors
    # + the token count — all partial-aggregable (map-side combine).
    # single F.expr strings (round 12): each stacked Column op is a
    # py4j round trip — the 60 vote sums + W word ors measured ~0.5 s
    # of pure construction per call; the strings parse JVM-side into
    # the same trees
    vote_aggs = [
        F.expr(f"sum(w * (((h >> {j}) & 1) * 2 - 1)) AS v{j}")
        for j in range(SIMHASH_BITS)
    ]
    word_aggs = []
    for i in range(words):
        probe_masks = " | ".join(
            f"(CASE WHEN p{p} div {WORD_BITS} = {i} "
            f"THEN shiftleft(1L, cast(p{p} % {WORD_BITS} AS int)) ELSE 0L END)"
            for p in (1, 2, 3)
        )
        word_aggs.append(F.expr(f"bit_or({probe_masks}) AS f{i}"))
    wide = post.groupBy(id_col).agg(
        *vote_aggs, *word_aggs, F.expr("sum(tf) AS token_count")
    )
    sim_sql = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}L ELSE 0L END)"
        for j in range(SIMHASH_BITS)
    )
    base = wide.select(
        F.col(id_col),
        F.expr(f"CAST(({sim_sql}) AS BIGINT)").alias("simhash"),
        *[F.col(f"f{i}") for i in range(words)],
        F.col("token_count"),
        F.least(F.expr("token_count div 10"), F.lit(MAX_LENGTH_HINT).cast("long"))
        .alias("length_hint"),
        (F.col("token_count") < SHORT_TEXT_TOKENS).alias("short_text"),
    )

    # Top terms: weight desc, hash asc tiebreak (compute_token_weights'
    # deterministic sort, sketch_track.rs:695-697), k per variant.
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("w").desc(), F.col("h").asc())
    )
    tops = (
        post.withColumn("rk", rk)
        .filter(F.col("rk") <= top_k)
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "hu32"))),
                lambda s: s["hu32"],
            ).alias("top_terms"),
            F.least(F.sum("w"), F.lit(MAX_TERM_WEIGHT_SUM)).alias("term_weight_sum"),
        )
    )
    # Both sides are hash-partitioned on the id; AQE plans a co-located
    # shuffle join with no extra exchange.
    return base.join(tops, id_col)


_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def _py_hash64(token: str) -> int:
    """Driver-side twin of functions.hashing.hash64 (60-bit md5)."""
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def query_sketch(query: str, variant: str = "small") -> dict:
    """Driver-side query sketch (QuerySketch::from_query,
    sketch_track.rs:795-821): exact integer twin of sketch_entries for
    one short string — the query side is a handful of tokens, never a
    distributed job."""
    words, top_k, _ = _variant(variant)
    filter_bits = words * WORD_BITS
    toks = [t for t in _TOKEN_RE.split(query.lower()) if len(t) >= 2]
    out = {
        "simhash": 0,
        "filter_words": [0] * words,
        "top_terms": [],
        "token_count": len(toks),
    }
    if not toks:
        return out
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    weighted = sorted(
        ((_py_hash64(t), min(c, TF_CAP) * WEIGHT_SCALE) for t, c in tf.items()),
        key=lambda hw: (-hw[1], hw[0]),
    )
    votes = [0] * SIMHASH_BITS
    fwords = [0] * words
    for h, w in weighted:
        for j in range(SIMHASH_BITS):
            votes[j] += w if (h >> j) & 1 else -w
        for p in (h % filter_bits, (h >> 16) % filter_bits, (h >> 32) % filter_bits):
            fwords[p // WORD_BITS] |= 1 << (p % WORD_BITS)
    out["simhash"] = sum(1 << j for j in range(SIMHASH_BITS) if votes[j] > 0)
    out["filter_words"] = fwords
    out["top_terms"] = [(h ^ (h >> 32)) & U32_MASK for h, _ in weighted[:top_k]]
    out["_weighted"] = weighted
    return out


def py_sketch_entry(text: str, variant: str = "small") -> dict:
    """Driver-side generate_sketch twin for a single payload
    (sketch_track.rs:719-776): the facade's insert_sketch path, and the
    parity pin the tests compare sketch_entries against. Same integer
    math as the distributed builder, including the empty-text entry the
    reference flags SHORT_TEXT (the distributed builder skips empty
    docs, matching build_all_sketches' filter)."""
    _, top_k, _ = _variant(variant)
    qs = query_sketch(text, variant)
    weighted = qs.pop("_weighted", [])
    return {
        "simhash": qs["simhash"],
        "filter_words": qs["filter_words"],
        "top_terms": qs["top_terms"],
        "term_weight_sum": min(
            sum(w for _, w in weighted[:top_k]), MAX_TERM_WEIGHT_SUM
        ),
        "token_count": qs["token_count"],
        "length_hint": min(qs["token_count"] // 10, MAX_LENGTH_HINT),
        "short_text": qs["token_count"] < SHORT_TEXT_TOKENS,
    }


def sketch_candidates(
    entries: DataFrame,
    query: str,
    variant: str = "small",
    hamming_threshold: int = DEFAULT_HAMMING_THRESHOLD,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
    min_score: float = 0.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every entry against the query sketch and return the top
    candidates (find_sketch_candidates, sketch.rs:169-206; score_entry,
    sketch_track.rs:823-860).

    Gates exactly as the reference: term-filter overlap first, then the
    Hamming threshold, then ``score ≥ min_score``; score =
    0.5·(top-term overlap / query terms) + 0.4·(1 − hamming/60) +
    0.1·(1 / (1 + 0.1·|length buckets|)), rounded to 6dp for the
    engine-portable compare. One scan, all query values literal, final
    top-k via TakeOrderedAndProject.
    """
    qs = query_sketch(query, variant)
    words, _, _ = _variant(variant)
    overlap = F.lit(False)
    for i in range(words):
        overlap = overlap | (
            F.col(f"f{i}").bitwiseAND(F.lit(qs["filter_words"][i])) != 0
        )
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.lit(qs["simhash"])))
    max_terms = max(len(qs["top_terms"]), 1)
    qterms = (
        F.array(*[F.lit(t).cast("long") for t in qs["top_terms"]])
        if qs["top_terms"]
        else F.array().cast("array<bigint>")
    )
    matching = F.size(
        F.filter(
            "top_terms",
            lambda t: (t != F.lit(0)) & F.array_contains(qterms, t),
        )
    )
    q_bucket = min(qs["token_count"] // 10, MAX_LENGTH_HINT)
    score = F.round(
        0.5 * (matching.cast("double") / F.lit(float(max_terms)))
        + 0.4 * (1.0 - ham.cast("double") / float(SIMHASH_BITS))
        + 0.1
        * (
            1.0
            / (1.0 + 0.1 * F.abs(F.col("length_hint") - F.lit(q_bucket)).cast("double"))
        ),
        6,
    )
    return (
        entries.filter(overlap)
        .filter(ham <= hamming_threshold)
        .select(
            F.col(id_col),
            score.alias("score"),
            ham.cast("long").alias("hamming"),
            matching.cast("long").alias("matching_top_terms"),
        )
        .filter(F.col("score") >= min_score)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(max_candidates)
    )


def sketch_search_stats(
    entries: DataFrame,
    query: str,
    variant: str = "small",
    hamming_threshold: int = DEFAULT_HAMMING_THRESHOLD,
    max_candidates: int = DEFAULT_MAX_CANDIDATES,
    min_score: float = 0.0,
    id_col: str = "doc_id",
) -> dict:
    """Funnel statistics for explain mode (SketchSearchStats,
    sketch.rs:209-281): one aggregation pass counting each gate."""
    qs = query_sketch(query, variant)
    words, _, _ = _variant(variant)
    overlap = F.lit(False)
    for i in range(words):
        overlap = overlap | (
            F.col(f"f{i}").bitwiseAND(F.lit(qs["filter_words"][i])) != 0
        )
    ham = F.bit_count(F.col("simhash").bitwiseXOR(F.lit(qs["simhash"])))
    row = entries.agg(
        F.count("*").alias("frames_scanned"),
        F.sum(overlap.cast("long")).alias("term_filter_hits"),
        F.sum((overlap & (ham <= hamming_threshold)).cast("long")).alias(
            "simhash_hits"
        ),
    ).head()
    returned = sketch_candidates(
        entries, query, variant, hamming_threshold, max_candidates, min_score,
        id_col=id_col,
    ).count()
    return {
        "frames_scanned": row["frames_scanned"],
        "term_filter_hits": int(row["term_filter_hits"] or 0),
        "simhash_hits": int(row["simhash_hits"] or 0),
        "candidates_returned": returned,
    }


def sketch_track_stats(entries: DataFrame, variant: str = "small") -> DataFrame:
    """Track-level stats (sketch_stats, sketch.rs:89-92): entry count,
    short-text count, and the serialized byte size the reference's
    fixed-size entries would occupy."""
    _, _, entry_bytes = _variant(variant)
    return entries.agg(
        F.count("*").alias("total_entries"),
        F.sum(F.col("short_text").cast("long")).alias("short_text_entries"),
        (F.count("*") * entry_bytes).alias("track_bytes"),
        F.round(F.avg("token_count"), 4).alias("avg_token_count"),
    )
