"""Semantic & passage-level corpus dedup: SemDeDup, fingerprint-overlap
survivor selection, and exact-substring (window-hash) duplicate spans.

These extend the engine's dedup family (operators/dedup.py — the
reference's content-hash dedup, src/memvid/mutation.rs:3302-3316, and
its SimHash sketch, src/search/mod.rs:189-230) with the cluster-level
operations a large-scale training-data pipeline layers on top:

- ``seed_assign`` + ``semdedup``: the SemDeDup recipe (Abbas et al.
  2023, arXiv:2303.09540) — cluster the embedding space, then drop all
  but one member of every within-cluster group whose pairwise cosine
  exceeds a threshold. Clustering here is deterministic seed
  assignment (k lowest-id vectors as seeds, one nearest-seed pass) so
  the DuckDB oracle can replay it exactly; the sample-trained Lloyd's
  kernel (functions/vector.py:63) slots in where replayability is not
  required.
- ``survivor_selection``: after any pairwise dedup produced edges,
  pick WHICH document of each duplicate group to keep — connected
  components (mesh.connected_components) then a deterministic quality
  pick (longest text, then lowest doc_id) per cluster.
- ``passage_dup_stats``: the hashed analogue of exact-substring dedup
  (Lee et al. 2021, arXiv:2107.06499) — hash every w-token sliding
  window, a window whose hash occurs in more than one document is
  duplicated text; per-doc duplicated-window fraction drives the
  filter decision.

Scale posture (100 TB):
- ``seed_assign``: the seed table is k rows — broadcast; assignment is
  a narrow map over the corpus (k cosines per row), no shuffle. At
  warehouse scale k grows with the corpus (SemDeDup uses k≈11k for
  233M docs) and seeds stay a broadcast table.
- ``semdedup``: the pairwise stage is an equi-join on the cluster id —
  pair generation is bounded per cluster, never O(n²) global. Skewed
  (oversized) clusters are the known failure mode; cap members per
  cluster upstream or re-shard hot clusters (AQE skew join handles
  moderate skew).
- ``survivor_selection``: edges come in pre-bucketed (fingerprint
  equi-join with a df ceiling that prunes stop-grams); components via
  min-label propagation with localCheckpoint per round; the final pick
  is one window per cluster — partitioned by cluster, never global.
- ``passage_dup_stats``: one explode (≤ tokens-w+1 rows per doc)
  collapsing into per-hash doc counts with map-side combine, then one
  equi-join back on the 8-byte hash. This is the shuffle-once layout;
  the suffix-array construction of the paper is replaced by hashing,
  which is what production pipelines (e.g. Dolma, RedPajama-2) do.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hash64
from ..functions.text import tokens
from ..functions.vector import dot, norm as vnorm
from .mesh import connected_components

SEM_K = 8  # deterministic seed count at test scale (k ∝ corpus size)
SEM_TAU = 0.999  # within-cluster cosine threshold (paper: eps-dedup)
SEM_TARGET_M = 256  # auto-k: target mean cluster size (k = ceil(n / this))
SEM_EXACT_K_MAX = 64  # join-based exact assignment above this explodes n*k rows
PASSAGE_W = 8  # window width in tokens (paper uses 50; 8 at test scale)
COS_ROUND = 9  # argmax stability: round cosine before comparing seeds


def _unit_base(
    emb: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, v) with v UNIT-normalized double — normalization paid once
    so every downstream cosine (seed assignment, within-cluster pairs)
    is a single dot product. Zero vectors normalize to null and never
    match any threshold."""
    raw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(F.col(id_col), raw.alias("_raw")).select(
        F.col(id_col),
        F.transform(
            F.col("_raw"),
            lambda x: x / F.nullif(vnorm(F.col("_raw")), F.lit(0.0)),
        ).alias("v"),
    )


def seed_assign(
    emb: DataFrame,
    k: int = SEM_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest of k deterministic seeds.

    Seeds are the k lowest-id vectors (replayable by the oracle, unlike
    k-means); nearest = max cosine, ties broken by lowest seed id.
    Returns (id_col, v = UNIT-normalized double vector, cluster).

    This is the EXACT, oracle-replayable path: the broadcast seed join
    materializes n*k scored rows, which is fine at small k but
    quadratic once k scales with the corpus (k = n/target_m ⇒ n²/m
    rows) — ``seed_assign_scaled`` is the large-k path.
    """
    base = _unit_base(emb, id_col, vec_col)
    seeds = (
        base.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("seed_id"), F.col("v").alias("sv"))
    )
    scored = base.join(F.broadcast(seeds)).select(
        id_col,
        "v",
        "seed_id",
        F.round(dot(F.col("v"), F.col("sv")), COS_ROUND).alias("c"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("seed_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "v", F.col("seed_id").alias("cluster"))
    )


def seed_assign_scaled(
    emb: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probes: int = 2,
) -> DataFrame:
    """Nearest-seed assignment for LARGE k: two-level (IVF-style) search
    instead of the n*k join explosion.

    The k seed vectors (k lowest ids, same rule as ``seed_assign``) are
    pulled to the driver via one Arrow transfer (k rows — for
    k = n/256 at a 1e9-row corpus that's ~4M rows × d floats, a few GB
    driver budget; shard the seed table if that ever binds) and
    broadcast. The s = ceil(sqrt(k)) lowest-id seeds double as
    super-seeds; each seed belongs to its nearest super-seed, and every
    corpus vector probes its top-``probes`` super-groups only. Per-row
    work is O((s + probes·k/s)·d) = O(sqrt(k)·d) — the flat matmul the
    SemDeDup paper runs on GPUs is O(k·d) per row, which at k ∝ n is
    quadratic overall. The trade is standard IVF approximation: a
    vector whose true nearest seed lives in an unprobed super-group is
    assigned its best probed seed (raise ``probes`` for recall; the
    clustering is itself a k-means stand-in, so this is noise at the
    level SemDeDup operates).

    Determinism: cosines round to COS_ROUND decimals, argmax takes the
    FIRST max, and seeds sort by id ascending — so ties break to the
    lowest seed id, matching the exact path. All-null/zero vectors
    assign to the lowest seed id, matching the exact path's null-last
    ordering. Returns (id_col, v, cluster) like ``seed_assign``.
    """
    import numpy as np
    import pandas as pd

    base = _unit_base(emb, id_col, vec_col)
    seeds_pdf = base.orderBy(id_col).limit(k).toPandas()  # Arrow, k rows
    seeds_pdf = seeds_pdf.sort_values(id_col).reset_index(drop=True)
    seed_ids = seeds_pdf[id_col].to_numpy(dtype=np.int64)
    kk = len(seed_ids)
    dim = next((len(v) for v in seeds_pdf["v"] if v is not None), 0)
    if kk == 0 or dim == 0:
        # degenerate corpus (empty or all-zero vectors): everything in
        # one cluster under the lowest id present
        first = seed_ids[0] if kk else 0
        return base.withColumn("cluster", F.lit(int(first)))
    S = np.zeros((kk, dim))
    valid = np.zeros(kk, dtype=bool)
    for i, v in enumerate(seeds_pdf["v"]):
        if v is not None:
            S[i] = v
            valid[i] = True
    s = max(1, int(math.ceil(math.sqrt(kk))))
    # seed -> super-group (exact k×s matmul, driver-side, once)
    sup_sim = np.round(S @ S[:s].T, COS_ROUND)
    sup_sim[:, ~valid[:s]] = -np.inf
    seed_sup = np.argmax(sup_sim, axis=1)
    groups = [np.flatnonzero(seed_sup == g) for g in range(s)]
    p = min(max(1, probes), s)

    sc = emb.sparkSession.sparkContext
    bc = sc.broadcast((S, seed_ids, valid, groups, s, p, dim))

    def assign(batches):
        S, seed_ids, valid, groups, s, p, dim = bc.value
        SS = S[:s]
        for pdf in batches:
            b = len(pdf)
            if b == 0:
                continue
            X = np.zeros((b, dim))
            okrow = np.zeros(b, dtype=bool)
            for i, v in enumerate(pdf["v"]):
                if v is not None:
                    X[i] = v
                    okrow[i] = True
            sup = X @ SS.T
            sup[:, ~valid[:s]] = -np.inf
            if p < s:
                top = np.argpartition(-sup, p - 1, axis=1)[:, :p]
            else:
                top = np.broadcast_to(np.arange(s), (b, s))
            best_sim = np.full(b, -np.inf)
            best_idx = np.zeros(b, dtype=np.int64)
            for g in range(s):
                rows = np.flatnonzero((top == g).any(axis=1))
                idx = groups[g]
                if rows.size == 0 or idx.size == 0:
                    continue
                sims = np.round(X[rows] @ S[idx].T, COS_ROUND)
                sims[:, ~valid[idx]] = -np.inf
                j = np.argmax(sims, axis=1)  # first max = lowest seed id
                val = sims[np.arange(rows.size), j]
                cand = idx[j]
                cur_v, cur_i = best_sim[rows], best_idx[rows]
                upd = (val > cur_v) | ((val == cur_v) & (cand < cur_i))
                hit = rows[upd]
                best_sim[hit] = val[upd]
                best_idx[hit] = cand[upd]
            cluster = seed_ids[best_idx]
            cluster[~okrow] = seed_ids[0]  # null v → lowest seed (exact-path rule)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "v": pdf["v"], "cluster": cluster}
            )

    return base.mapInPandas(
        assign, f"{id_col} long, v array<double>, cluster long"
    )


def semdedup(
    emb: DataFrame,
    k: int | None = SEM_K,
    tau: float = SEM_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
    target_m: int = SEM_TARGET_M,
    probes: int = 2,
) -> DataFrame:
    """SemDeDup: cluster, then mark within-cluster near-dups.

    A vector is a duplicate iff an earlier (lower-id) member of its
    cluster has cosine >= tau with it — exactly one survivor per
    cosine-connected chain seed. Returns (id_col, cluster, is_dup).

    ``k=None`` (the scale default) auto-sizes the seed count as
    ceil(n / target_m) from one cheap count — the SemDeDup recipe
    itself scales k with the corpus (k≈11k for 233M docs ≈ n/21k;
    arXiv:2303.09540 §3), and a k that does NOT grow with n makes mean
    cluster size m grow linearly, turning the per-cluster m² kernel
    into n²/k total work. With k = n/target_m the total pairwise work
    is n·target_m — linear in the corpus by design, not bounded only
    by the recall-losing ``max_cluster`` backstop. Explicit k stays
    for the oracle twin and paper-parity runs.

    Assignment picks its physical path by k: at k <= SEM_EXACT_K_MAX
    the exact broadcast-join (``seed_assign``, oracle-replayable);
    above, the two-level matmul path (``seed_assign_scaled``,
    O(sqrt(k)·d) per row) — same rounding and tie rules, IVF-grade
    approximation on the cluster boundary only.

    The pairwise stage runs as ONE vectorized NumPy matmul per cluster
    (applyInPandas, Arrow-batched) — the shape the SemDeDup paper runs
    on GPUs. An expression-level pair join would evaluate an
    interpreted higher-order dot per pair (measured ~2.5× slower at
    sf0.1 and worse with dimension).

    ``max_cluster`` is the mega-cluster guard: a boilerplate-heavy
    corpus can drop a large fraction of all documents into one cluster,
    and an unbounded m² sim matrix then OOMs a single executor task
    (measured: a 33k-row cluster at the 100× probe is an 8.7 GB
    matrix). Clusters above the cap split into ceil(m/max_cluster)
    sub-shards by a deterministic hash of the id; pairs are compared
    within a sub-shard only, so the guard trades a bounded recall loss
    (cross-shard dup pairs are missed — the SemDeDup paper's own k↑
    remedy has the same effect) for a hard per-task memory bound. Set
    ``max_cluster=0`` to disable. At the default 4096 every cluster at
    test scale (max m = 326 at sf0.1) is untouched; with auto-k it
    only fires on pathological skew (one seed attracting >16× target_m).
    """
    import numpy as np
    import pandas as pd

    if k is None:
        n = emb.count()
        k = max(1, math.ceil(n / max(1, target_m)))
    if k <= SEM_EXACT_K_MAX:
        assigned = seed_assign(emb, k=k, id_col=id_col, vec_col=vec_col)
    else:
        assigned = seed_assign_scaled(
            emb, k=k, id_col=id_col, vec_col=vec_col, probes=probes
        )
    if max_cluster and max_cluster > 0:
        sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_m"))
        n_sub = F.greatest(
            F.lit(1), F.ceil(F.col("_m") / F.lit(max_cluster))
        ).cast("long")
        assigned = (
            assigned.join(F.broadcast(sizes), "cluster")  # k rows — broadcast
            .withColumn("_sub", F.pmod(F.xxhash64(F.col(id_col)), n_sub))
            .drop("_m")
        )
    else:
        assigned = assigned.withColumn("_sub", F.lit(0))

    def cluster_dups(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        vs = pdf["v"]
        ok = vs.map(lambda a: a is not None).to_numpy()
        is_dup = np.zeros(len(pdf), dtype=bool)
        if ok.sum() >= 2:
            X = np.stack(vs[ok].to_numpy())  # unit vectors
            sim = X @ X.T
            # dup iff any EARLIER member is >= tau (strict upper triangle)
            dup_ok = (np.triu(sim >= tau, k=1)).any(axis=0)
            is_dup[np.flatnonzero(ok)] = dup_ok
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster": pdf["cluster"],
                "is_dup": is_dup,
            }
        )

    out_schema = f"{id_col} long, cluster long, is_dup boolean"
    return assigned.groupBy("cluster", "_sub").applyInPandas(
        cluster_dups, out_schema
    )


def fingerprint_overlap_edges(
    docs: DataFrame,
    k: int = 3,
    p: int = 4,
    min_shared: int = 3,
    max_df: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup edges: pairs of docs sharing >= min_shared sampled
    rolling fingerprints (token k-gram hashes, 0-mod-p selected).

    ``max_df`` is the stop-gram ceiling: fingerprints present in more
    than max_df docs carry no dedup signal and would otherwise explode
    the self-join — the df-floor trick from the collocation miner, in
    reverse. Returns (a, b) with a < b.
    """
    from ..functions.text import ngram_rows

    # whole-stage-codegen k-gram construction (short docs yield zero
    # rows structurally — see ngram_rows)
    grams = ngram_rows(docs, k, id_col, text_col)
    # checkpoint the sampled fingerprint table once: it feeds the df
    # ceiling AND both sides of the pair join — without this the gram
    # explode + distinct re-executes three times
    fp = (
        grams.select(id_col, hash64(F.col("gram")).alias("fp"))
        .distinct()
        .filter(F.col("fp") % p == 0)
        .localCheckpoint()
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    fp = fp.join(rare, "fp", "left_semi")
    pairs = (
        fp.select(F.col(id_col).alias("a"), "fp")
        .join(fp.select(F.col(id_col).alias("b"), "fp"), "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .select("a", "b")
    )
    return pairs


def survivor_selection(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pick one survivor per duplicate component: longest text wins,
    ties to the lowest doc id. Docs with no edges survive trivially
    (they are not emitted — output covers duplicate groups only).

    Returns (cluster, survivor_doc, n_members, n_removed).
    """
    cc = connected_components(edges)  # (node, cluster)
    members = cc.join(
        docs.select(F.col(id_col).alias("node"), F.length(text_col).alias("n_chars")),
        "node",
    )
    w = Window.partitionBy("cluster").orderBy(F.desc("n_chars"), F.asc("node"))
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("node"))).alias("survivor_doc"),
            F.count("*").alias("n_members"),
            (F.count("*") - 1).alias("n_removed"),
        )
    )


def passage_windows(
    docs: DataFrame,
    w: int = PASSAGE_W,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All w-token sliding-window hashes per doc: (id, pos, whash).

    Docs with fewer than w tokens yield zero rows (pre-filtered —
    Spark's sequence(1, 0) is descending, not empty).
    """
    from ..functions.text import ngram_rows

    return ngram_rows(docs, w, id_col, text_col, with_pos=True).select(
        F.col(id_col), "pos", hash64(F.col("gram")).alias("whash")
    )


def passage_dup_stats(
    docs: DataFrame,
    w: int = PASSAGE_W,
    flag_threshold: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-window fraction (exact-substring dedup stats).

    A window is duplicated iff its hash occurs in >1 distinct doc.
    Returns (id, n_windows, n_dup_windows, dup_fraction, flagged);
    docs with < w tokens yield zero windows and are not emitted.
    """
    win = passage_windows(docs, w=w, id_col=id_col, text_col=text_col)
    shared = (
        win.select(id_col, "whash")
        .distinct()
        .groupBy("whash")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") > 1)
        .select("whash")
    )
    marked = win.join(shared, "whash", "left_semi")
    per_doc = win.groupBy(id_col).agg(F.count("*").alias("n_windows"))
    dup = marked.groupBy(id_col).agg(F.count("*").alias("n_dup_windows"))
    out = (
        per_doc.join(dup, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
        .withColumn("flagged", F.col("dup_fraction") >= F.lit(flag_threshold))
    )
    return out
