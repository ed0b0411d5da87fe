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

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.hashing import hash64
from ..functions.text import tokens
from ..functions.vector import dot, norm as vnorm
from .mesh import connected_components

SEM_K = 8  # deterministic seed count at test scale (k ∝ corpus size)
SEM_TAU = 0.999  # within-cluster cosine threshold (paper: eps-dedup)
PASSAGE_W = 8  # window width in tokens (paper uses 50; 8 at test scale)
COS_ROUND = 9  # argmax stability: round cosine before comparing seeds


def seed_assign(
    emb: DataFrame,
    k: int = SEM_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest of k deterministic seeds.

    Seeds are the k lowest-id vectors (replayable by the oracle, unlike
    k-means); nearest = max cosine, ties broken by lowest seed id.
    Returns (id_col, v = UNIT-normalized double vector, cluster) — the
    normalization is paid once here so every downstream cosine
    (k per row against seeds, then the within-cluster pairs) is a
    single dot product instead of dot + two norms. Zero vectors
    normalize to null and never match any threshold.
    """
    raw = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), raw.alias("_raw")).select(
        F.col(id_col),
        F.transform(
            F.col("_raw"),
            lambda x: x / F.nullif(vnorm(F.col("_raw")), F.lit(0.0)),
        ).alias("v"),
    )
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


def semdedup(
    emb: DataFrame,
    k: int = SEM_K,
    tau: float = SEM_TAU,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
) -> DataFrame:
    """SemDeDup: cluster, then mark within-cluster near-dups.

    A vector is a duplicate iff an earlier (lower-id) member of its
    cluster has cosine >= tau with it — exactly one survivor per
    cosine-connected chain seed. Returns (id_col, cluster, is_dup).

    The pairwise stage runs as ONE vectorized NumPy matmul per cluster
    (applyInPandas, Arrow-batched) — the shape the SemDeDup paper runs
    on GPUs. An expression-level pair join would evaluate an
    interpreted higher-order dot per pair (measured ~2.5× slower at
    sf0.1 and worse with dimension); the kernel is O(m²) per cluster,
    which is exactly the paper's contract — k grows with the corpus so
    cluster size m stays bounded.

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
    test scale (max m = 326 at sf0.1) is untouched.
    """
    import numpy as np
    import pandas as pd

    assigned = seed_assign(emb, k=k, id_col=id_col, vec_col=vec_col)
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
