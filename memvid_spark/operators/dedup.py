"""Deduplication operators: exact, SimHash-LSH, MinHash-LSH, Jaccard.

Reference lineage:
- exact content dedup on insert: blake3 hash + skip-if-exists
  (src/memvid/mutation.rs:3302-3316) → hash groupBy / anti-join.
- SimHash sketch track: 64-bit TF-weighted Charikar hash, candidates via
  Hamming ≤ threshold (src/types/sketch_track.rs:549-580,
  src/memvid/sketch.rs:169-281).
- MinHash/Jaccard near-dup is NOT in the reference; it's part of the
  training-data-pipeline surface this engine adds.

Scale design:
- Sketches are computed with hash/bit Column expressions (whole-stage
  codegen, no Python). One shuffle for the per-doc aggregation.
- Candidate pairing is LSH banding — self-join on (band, value), never an
  O(n²) cross join. Band width tunes the recall/candidate-volume knob.
  At 100 TB the band join is the only shuffle and is uniformly keyed; a
  hot band (e.g. boilerplate docs) is handled by AQE skew-join splitting.
- Verification (Hamming / exact Jaccard) runs only on candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import (
    content_sha256,
    hash64,
    hash64_affine,
    hash64_seeded,
)

SIMHASH_BITS = 60  # fits signed-64 in both engines (see functions/hashing.py)
SIMHASH_BAND_BITS = 15
MINHASH_K = 8
MINHASH_BANDS = 4  # rows-per-band = 2
SHINGLE_N = 3


def exact_duplicate_groups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical docs: (sha256, n_docs, min_doc_id keeper)."""
    return (
        docs.select(F.col(id_col), content_sha256(text_col).alias("sha256"))
        .groupBy("sha256")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keeper"))
        .filter(F.col("n_docs") > 1)
    )


def dedup_insert(
    new_docs: DataFrame, existing: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Skip-if-content-exists (mutation.rs:3302-3316): left-anti join on
    content hash against the existing corpus."""
    nh = new_docs.withColumn("_sha", content_sha256(text_col))
    eh = existing.select(content_sha256(text_col).alias("_sha")).distinct()
    return nh.join(eh, "_sha", "left_anti").drop("_sha")


def simhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """(doc_id, simhash) — TF-weighted Charikar SimHash.

    For each token with term frequency tf and 60-bit hash h, every bit
    position j votes tf if bit j of h is set else -tf; simhash bit j is 1
    iff the total vote is > 0 (src/types/sketch_track.rs:549-580).
    """
    from functools import reduce

    from ..functions.text import tokens

    # One wide aggregation instead of exploding a bit-position column
    # (which would multiply shuffle volume by `bits`). Per-OCCURRENCE
    # votes sum to exactly the tf-weighted per-token votes (sum over tf
    # occurrences of ±1 = tf * ±1), so no (doc, token) posting
    # aggregation is needed at all: the exploded token stream collapses
    # map-side straight into the per-doc vote state — the corpus-wide
    # shuffle of token strings the postings groupBy cost is gone.
    #
    # Round 12 — packed dual-lane counters: instead of `bits` sums of
    # ±1, ceil(bits/2)+2 sums of (h >> j) & 0x100000001 accumulate, per
    # doc, lane0 = count of occurrences with bit j set and lane32 = the
    # same for bit j+32 (bits 60..63 of the 60-bit hash are always 0).
    # Lanes cannot carry while a doc has < 2^32 token occurrences. The
    # vote for bit j is 2*cnt_j - n (n = occurrence count), and the
    # simhash bit is 1 iff 2*cnt_j > n — exactly the old sum(±1) > 0.
    # Halves the aggregation state (60 -> 33 longs/doc: shuffle bytes,
    # guide §2.3) and the per-row aggregate expression count; output
    # verified bit-identical over the 500k-doc 100x corpus and q21/q29
    # hash-match (scratch/ab_simhash_packed.py: interleaved cpu
    # 116->108 s at 100x pre-tokenize-fix).
    # Expressions are built as single F.expr strings, not stacked Column
    # operators: each Column op is a py4j round trip, and this plan's
    # ~90 aggregate/CASE expressions measured 0.9 s of pure driver-side
    # construction per call (the one-string forms: 14 ms; values
    # identical — same parsed expression tree).
    ex = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    post = ex.select(F.col(id_col), hash64("token").alias("h"))
    mask = (1 << 32) | 1
    # lane0 of s{j} counts bit j (j in 0..min(bits,32)-1); lane32 of
    # s{j-32} counts bit j for j in 32..bits-1 (so bits <= 64 only)
    assert bits <= 64, "packed dual-lane vote counters assume bits <= 64"
    n_packed = min(bits, 32)
    cnt_aggs = [
        F.expr(f"sum((h >> {j}) & {mask}) AS s{j}") for j in range(n_packed)
    ] + [F.expr("count(1) AS n")]
    per_doc = post.groupBy(id_col).agg(*cnt_aggs)

    def cnt_sql(j: int) -> str:
        if j < n_packed:
            return f"(s{j} & 4294967295)"
        return f"((s{j - 32} >> 32) & 4294967295)"

    sim_sql = " + ".join(
        f"(CASE WHEN {cnt_sql(j)} * 2 > n THEN {1 << j}L ELSE 0L END)"
        for j in range(bits)
    )
    return per_doc.select(
        F.col(id_col), F.expr(f"CAST(({sim_sql}) AS BIGINT) AS simhash")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    band_bits: int = SIMHASH_BAND_BITS,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with hamming(simhash) ≤ threshold,
    candidates generated by LSH banding on the sketch (a pair is a
    candidate iff it collides in ≥1 band — guaranteed for small Hamming
    distances by pigeonhole when max_hamming < n_bands).

    The band self-join consumes the sketch twice (left/right) and Spark
    recomputes identical subtrees per branch, so the sketch is
    materialized once with localCheckpoint (eager, lineage-truncating;
    measured 2.6× faster than recompute and faster than persist(), whose
    60-column cache serialization costs more than it saves). At
    warehouse scale this is the `sketches` derived table written to
    storage — localCheckpoint is the single-job analogue."""
    sh = simhash_table(docs, id_col, text_col, bits).localCheckpoint()
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    bands = sh.select(
        F.col(id_col).alias("id"),
        F.col("simhash"),
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("b"),
    ).withColumn("band_val", F.expr(f"(simhash >> (b * {band_bits})) & {mask}"))
    left = bands.select(
        F.col("b"), F.col("band_val"), F.col("id").alias("a"), F.col("simhash").alias("sh_a")
    )
    right = bands.select(
        F.col("b"), F.col("band_val"), F.col("id").alias("b_id"), F.col("simhash").alias("sh_b")
    )
    cand = (
        left.join(right, ["b", "band_val"])
        .filter(F.col("a") < F.col("b_id"))
        .select("a", F.col("b_id").alias("b"), "sh_a", "sh_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def shingles_with_dups(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE_N
) -> DataFrame:
    """All n-word shingles per doc, one row per POSITION (duplicates kept):
    (doc_id, shingle).

    Built from arrays_zip over shifted slices of the token array, so the
    whole construction stays inside whole-stage codegen — a higher-order
    ``transform`` lambda runs interpreted per element and measured 16x
    slower (65.7s vs 4.0s for 39.6M shingles at the 100x probe)."""
    from ..functions.text import ngram_rows

    return ngram_rows(docs, n, id_col, text_col).withColumnRenamed(
        "gram", "shingle"
    )


def shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = SHINGLE_N
) -> DataFrame:
    """Distinct n-word shingles per doc: (doc_id, shingle)."""
    return shingles_with_dups(docs, id_col, text_col, n).distinct()


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    n: int = SHINGLE_N,
) -> DataFrame:
    """(doc_id, seed, minhash) — k independent min-hashes over the
    doc's shingle set. One md5 per shingle; the k family members are
    affine mixes of that base hash (hash64_affine), so the digest cost
    does not scale with k."""
    sh = shingles(docs, id_col, text_col, n)
    hashed = sh.select(F.col(id_col), hash64(F.col("shingle")).alias("h"))
    seeded = hashed.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[hash64_affine(F.col("h"), s) for s in range(k)])
        ).alias("seed", "hv"),
    )
    return seeded.groupBy(id_col, "seed").agg(F.min("hv").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    n: int = SHINGLE_N,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with exact Jaccard verification.

    Banding: signature split into ``bands`` bands of k/bands rows; a pair
    is a candidate iff some band matches in full. Candidates are then
    verified with exact shingle-set Jaccard (computed relationally — an
    equi-join on shingle, never a cross join).
    Output: (a, b, jaccard round6) for jaccard ≥ min_jaccard.
    """
    rows_per_band = k // bands
    # All k min-hashes in ONE aggregation pass (k min() expressions) —
    # no k× row blowout; md5 runs ONCE per shingle (the k family members
    # are affine mixes of the base hash, hash64_affine), and min()
    # combines map-side, so the only full-corpus exchange is k longs per
    # doc. Duplicate shingles flow straight into min() — min over a
    # multiset equals min over its set, so the signature path needs no
    # corpus-wide distinct shuffle at all (the oracle's DISTINCT shingle
    # CTE is matched exactly).
    # Aggregates and band keys are single F.expr strings (round 12):
    # the stacked-Column forms of the k min-affine aggregates + the
    # band-struct array measured ~0.9 s of py4j-round-trip construction
    # per call; the one-string forms parse JVM-side in ~10 ms and yield
    # the same expression trees (hash64_affine_sql is the shared twin
    # the oracle already replays).
    from ..functions.hashing import hash64_affine_sql

    sh_all = shingles_with_dups(docs, id_col, text_col, n)
    hashed = sh_all.select(F.col(id_col), hash64(F.col("shingle")).alias("h"))
    wide = hashed.groupBy(id_col).agg(
        *[
            F.expr(f"min({hash64_affine_sql('h', s)}) AS mh{s}")
            for s in range(k)
        ]
    )
    # every band key in one projection + inline (no bands× re-scan)
    band_parts = ", ".join(
        "struct({b} AS band, concat_ws(',', {cols}) AS bk)".format(
            b=b,
            cols=", ".join(
                f"CAST(mh{b * rows_per_band + r} AS STRING)"
                for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    band_key = (
        wide.select(
            F.col(id_col), F.expr(f"inline(array({band_parts}))")
        )
        .localCheckpoint()
    )
    left = band_key.select(F.col("band"), F.col("bk"), F.col(id_col).alias("a"))
    right = band_key.select(F.col("band"), F.col("bk"), F.col(id_col).alias("b"))
    cand = (
        left.join(right, ["band", "bk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .localCheckpoint()
    )
    # Exact-Jaccard verification only ever touches docs that appear in a
    # candidate pair — a small set even at warehouse scale. Broadcast the
    # candidate ids and semi-join the corpus BEFORE re-exploding shingles,
    # so set sizes and the intersection join run over O(candidate docs),
    # not O(corpus).
    cand_ids = cand.select(
        F.explode(F.array(F.col("a"), F.col("b"))).alias(id_col)
    ).distinct()
    sh = shingles(
        docs.join(F.broadcast(cand_ids), id_col, "semi"), id_col, text_col, n
    ).localCheckpoint()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        cand.join(sh.select(F.col(id_col).alias("a"), "shingle"), "a")
        .join(sh.select(F.col(id_col).alias("b"), F.col("shingle")), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a", "b", "jaccard")
    )


def token_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.5,
    id_upper: int | None = None,
) -> DataFrame:
    """Exact token-set Jaccard over all pairs, computed via equi-join on
    token (no cross join): the n-gram-Jaccard baseline for near-dup.

    ``id_upper`` optionally bounds the id range (oracle-tier subsetting).
    """
    from ..functions.text import tokens

    d = docs
    if id_upper is not None:
        d = d.filter(F.col(id_col) < id_upper)
    tok = (
        d.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok")).distinct()
    )
    sizes = tok.groupBy(id_col).agg(F.count("*").alias("sz"))
    inter = (
        tok.select(F.col(id_col).alias("a"), "tok")
        .join(tok.select(F.col(id_col).alias("b"), F.col("tok")), "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("a", "b", "jaccard")
    )


def plant_near_dups(
    emb: DataFrame,
    every: int = 10,
    id_offset: int = 1_000_000,
    scale: float = 1.001,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic test corpus for embedding near-dup: every Nth vector
    gets a scaled copy (cosine exactly 1) at id + offset."""
    dup = emb.filter(F.col(id_col) % every == 0).select(
        (F.col(id_col) + id_offset).alias(id_col),
        F.transform(
            F.col(vec_col).cast("array<double>"), lambda x: x * scale
        ).alias(vec_col),
    )
    return emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    ).unionByName(dup)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.999,
    n_sign_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicates via sign-pattern LSH: vectors
    bucket on the sign bits of their first ``n_sign_bits`` dimensions
    (random-hyperplane LSH with axis-aligned planes — deterministic and
    oracle-reproducible), candidate pairs form only inside a bucket, and
    cosine verifies. Near-identical vectors agree on every sign bit, so
    recall at cosine→1 is ~exact while the join never goes O(n²).

    At 100 TB: raise n_sign_bits so bucket cardinality keeps the
    per-bucket self-join small; boilerplate-heavy buckets split via AQE
    skew handling (same posture as the SimHash band join above).

    Output: (a, b, cos) with a < b.
    """
    from ..functions.vector import cosine

    sign = F.concat_ws(
        "",
        *[
            (F.element_at(F.col(vec_col), i + 1) >= 0).cast("int").cast("string")
            for i in range(n_sign_bits)
        ],
    )
    b = emb.select(F.col(id_col), F.col(vec_col), sign.alias("bucket"))
    pairs = (
        b.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket")
        .join(
            b.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"),
            "bucket",
        )
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
    )
    return pairs.select("a", "b", "cos")


def rolling_fingerprints(
    docs: DataFrame,
    k: int = 3,
    p: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document fingerprinting: token k-gram rolling hashes, mod-p
    sampled (Broder's "0 mod p" selection — the content-defined analogue
    of winnowing). Two docs sharing text share fingerprints regardless
    of position, so overlap detection is a fingerprint equi-join instead
    of an O(n²) text compare. Pure column expressions; the only shuffle
    is the final distinct.

    Output: (doc_id, fingerprint) distinct.
    """
    from ..functions.text import ngram_rows

    g = ngram_rows(docs, k, id_col, text_col)
    fp = g.select(F.col(id_col), hash64(F.col("gram")).alias("fingerprint"))
    return fp.filter(F.col("fingerprint") % p == 0).distinct()


# ---------------------------------------------------------------------------
# Term Bloom filter (sketch track, src/types/sketch_track.rs:607-648)
# ---------------------------------------------------------------------------

BLOOM_WORDS = 2  # 2 × 60-bit words = 120-bit filter (portable signed-64 math)
BLOOM_WORD_BITS = 60
BLOOM_PROBES = 2


def term_bloom_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc term Bloom filter: 2 probes per token over a 120-bit
    filter stored as two 60-bit BIGINT words (sketch_track.rs uses
    16-64-byte filters with 2 probes/token). All md5-based column
    arithmetic → reproducible in the oracle; one groupBy with partial
    bit_or aggregation, no Python.

    Output: (doc_id, w0, w1).
    """
    from ..functions.text import tokens

    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    probes = toks.select(
        id_col, "tok", F.explode(F.array(F.lit(0), F.lit(1))).alias("s")
    )
    hv = hash64_seeded(F.col("tok"), F.col("s"))
    sized = probes.select(
        F.col(id_col), (hv % BLOOM_WORDS).alias("word"), hv.alias("hv")
    )
    mask = F.expr(
        f"shiftleft(1L, cast((hv div {BLOOM_WORDS}) % {BLOOM_WORD_BITS} as int))"
    )
    with_mask = sized.withColumn("mask", mask)
    return with_mask.groupBy(id_col).agg(
        F.bit_or(F.when(F.col("word") == 0, F.col("mask")).otherwise(0)).alias("w0"),
        F.bit_or(F.when(F.col("word") == 1, F.col("mask")).otherwise(0)).alias("w1"),
    )


def _bloom_masks(token: str) -> tuple[int, int]:
    """Driver-side twin of the probe arithmetic (md5 is engine-portable):
    returns (w0_mask, w1_mask) for one token."""
    import hashlib

    m0 = m1 = 0
    for s in range(BLOOM_PROBES):
        hv = int(
            hashlib.md5(f"{token}#{s}".encode()).hexdigest()[:15], 16
        )
        bit = 1 << ((hv // BLOOM_WORDS) % BLOOM_WORD_BITS)
        if hv % BLOOM_WORDS == 0:
            m0 |= bit
        else:
            m1 |= bit
    return m0, m1


def bloom_prefilter(
    blooms: DataFrame, query_tokens: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Candidate pruning: keep docs whose filter has every probe bit of
    every query token set (no false negatives; false positives culled by
    the scoring stage — the sketch pre-filter wiring of
    src/memvid/search/mod.rs:189-230). Pure bitwise scan, prunes
    without touching text.
    """
    cond = F.lit(True)
    for t in query_tokens:
        m0, m1 = _bloom_masks(t.lower())
        cond = (
            cond
            & (F.col("w0").bitwiseAND(F.lit(m0)) == F.lit(m0))
            & (F.col("w1").bitwiseAND(F.lit(m1)) == F.lit(m1))
        )
    return blooms.filter(cond).select(id_col, "w0", "w1")


# ---------------------------------------------------------------------------
# Boilerplate line removal (CCNet-style): lines shared by many documents
# (footers, nav, cookie banners) are corpus noise, not content. This is
# the corpus-STATISTICAL half of web text cleaning; the per-document
# structural half is sources/htmltext.py.
# ---------------------------------------------------------------------------


def drop_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 100,
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove every line that appears (verbatim) in ≥ ``min_df``
    distinct documents, preserving the order of surviving lines.

    Scale shape: explode to (doc, line_index, line) — narrow; the
    line-frequency table groups by the LINE (a shuffle over distinct
    lines, map-side combined; at warehouse scale hash the line first so
    the shuffle carries 8-byte keys); removal is a left_anti equi-join
    against that (much smaller) table; reassembly is one groupBy(doc)
    with an array_sort — no window over the corpus.

    Output: (id_col, text, n_lines) with boilerplate removed.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    boiler = (
        lines.filter(F.length("line") >= min_line_chars)
        .groupBy("line")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("line")
    )
    kept = lines.join(boiler, "line", "left_anti")
    return kept.groupBy(id_col).agg(
        F.expr(
            "concat_ws('\n', transform(array_sort(collect_list("
            "struct(idx, line))), s -> s.line))"
        ).alias("text"),
        F.count("*").cast("int").alias("n_lines"),
    )


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Intra-document repetition removal: keep only the FIRST occurrence
    of each repeated paragraph within a document (the Dolma/C4-style
    cleaning step after cross-doc boilerplate removal —
    :func:`drop_boilerplate_lines` handles lines repeated ACROSS docs;
    this handles paragraphs repeated WITHIN one).

    Paragraphs shorter than ``min_chars`` always survive (blank
    separators legitimately repeat). Entirely narrow column algebra —
    split, first-occurrence filter via array_position, re-join — zero
    shuffles, so it composes into any scan: the ideal 100 TB shape.

    Output: (id, text = cleaned, n_paras, n_removed).
    """
    segs = F.split(F.col(text_col), sep)
    kept = F.filter(
        segs,
        lambda x, i: (F.length(x) < min_chars)
        | (F.array_position(segs, x) == i + 1),
    )
    # two selects: aliasing the OUTPUT as text_col in the same select
    # would shadow the input column and re-resolve `segs` against the
    # already-cleaned text (observed: n_removed double-counted)
    staged = docs.select(
        F.col(id_col),
        kept.alias("_kept"),
        F.size(segs).alias("n_paras"),
        (F.size(segs) - F.size(kept)).alias("n_removed"),
    )
    return staged.select(
        id_col,
        F.array_join("_kept", sep).alias(text_col),
        "n_paras",
        "n_removed",
    )
