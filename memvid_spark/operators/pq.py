"""Product Quantization: subspace k-means codebooks + ADC search.

Reference: src/vec_pq.rs:1-175 — 384-d vectors split into 96 × 4-d
subspaces, 256 k-means centroids per subspace, 96-byte codes, queries
scored with an Asymmetric Distance Computation lookup table.

Spark design (SURVEY §2.8):
- train: vectorized Lloyd's over a bounded driver-side sample (the
  corpus never feeds the trainer; the KB-scale codebook broadcasts).
- encode: Arrow-batched NumPy argmin kernel per subspace — the corpus
  is never shuffled and the output code table is ~dims/sub × 1 byte
  per row.
- ADC search: the query's LUT (n_sub × k distances) is computed on the
  driver (tiny), broadcast as a literal array, and the approximate
  distance is a codegen'd sum of LUT lookups — a pure scan, no joins.
- Correctness tier stays exact knn (vec.rs:587-651 treats brute force as
  ground truth); PQ is the compressed scale path with a recall contract.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window, functions as F


@dataclass
class PQModel:
    n_sub: int
    sub_dim: int
    k: int
    # centroids[sub][c] = list[float] of sub_dim
    centroids: list[list[list[float]]]


def train_pq(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    train_sample: int = 65536,
) -> PQModel:
    """Fit one KMeans codebook per subspace (vec_pq.rs trains 96 × 256;
    scaled to the 16-d test vectors).

    Codebooks train on a BOUNDED sample, driver-side, with vectorized
    Lloyd's — the published PQ practice (FAISS-style): at 100 TB the
    corpus never feeds the trainer, a ≤train_sample random sample does,
    and the resulting KB-scale codebook broadcasts to the encoders.
    (Distributed KMeans here cost ~n_sub × max_iter Spark jobs to fit
    kilobytes of centroids — all scheduling overhead, no parallelism
    win at any scale.)"""
    import numpy as np

    dim = len(emb.select(vec_col).head()[0])
    assert dim % n_sub == 0, f"dim {dim} not divisible by {n_sub} subspaces"
    sub_dim = dim // n_sub
    # Bounded sample via limit — one job, no count() pre-scan. limit()
    # drains partitions in order, so the sample is head-of-table; fine for
    # codebook fitting (subspace statistics, not stratification). Callers
    # with pathologically ordered corpora can pre-.sample() themselves.
    # Arrow-batched transfer (toPandas) instead of row collect: the same
    # sample moves several times faster through Arrow batches.
    X = np.asarray(
        list(
            emb.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(train_sample)
            .toPandas()["v"]
        ),
        dtype="float64",
    )
    from ..functions.vector import lloyd_kmeans

    centroids: list[list[list[float]]] = []
    for s in range(n_sub):
        sub = X[:, s * sub_dim : (s + 1) * sub_dim]
        C = lloyd_kmeans(sub, k, seed=seed + s, max_iter=max_iter)
        centroids.append([[float(x) for x in c] for c in C])
    # k from the fitted codebook, not the request — undersized samples
    # yield fewer centroids (see lloyd_kmeans).
    return PQModel(
        n_sub=n_sub, sub_dim=sub_dim, k=len(centroids[0]), centroids=centroids
    )


def encode(
    model: PQModel, emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, code array<int>): argmin centroid per subspace.

    Arrow-batched NumPy kernel: per batch one ||x||²−2xCᵀ+||c||² matrix
    argmin per subspace — the BLAS shape real PQ encoders use. (A pure
    expression encoding needs n_sub × k higher-order-function nodes;
    at 8×64 Catalyst spends ~25 s compiling it — codegen is the wrong
    tool when the 'expression' is a matrix multiply.) Centroids ride the
    task closure (KB-scale broadcast); no shuffle."""
    import numpy as np

    cents = [np.asarray(c, dtype="float64") for c in model.centroids]
    n_sub, sub_dim = model.n_sub, model.sub_dim
    schema = f"{id_col} long, code array<int>"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(
                "float64", copy=False
            )  # stack beats per-row list() 4x; values identical
            codes = np.empty((len(X), n_sub), dtype="int32")
            for s in range(n_sub):
                sub = X[:, s * sub_dim : (s + 1) * sub_dim]
                C = cents[s]
                d2 = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ C.T
                    + (C * C).sum(axis=1)[None, :]
                )
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "code": list(codes)})

    return emb.select(id_col, vec_col).mapInPandas(run, schema)


def adc_topk(
    model: PQModel,
    codes: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search: LUT[s][c] = ||q_s - centroid_sc||²; approx dist =
    Σ_s LUT[s][code_s]. LUT is computed driver-side (n_sub × k floats)
    and inlined as literals — the scan is one projection + top-k."""
    q = [float(x) for x in query_vec]
    lut = [
        [
            sum((q[s * model.sub_dim + i] - c[i]) ** 2 for i in range(model.sub_dim))
            for c in model.centroids[s]
        ]
        for s in range(model.n_sub)
    ]
    lut_col = F.array(*[F.array(*[F.lit(d) for d in row]) for row in lut])
    dist = F.aggregate(
        F.zip_with(
            lut_col,
            F.col("code"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        codes.select(F.col(id_col), F.sqrt(dist).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_recall(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_sub: int = 4,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """recall@k of PQ-ADC vs exact L2 ground truth (the reference's own
    validation method, src/vec.rs:587-651; accuracy claim vec_pq.rs:3-10)."""
    from .knn import knn

    model = train_pq(emb, n_sub=n_sub, k=n_centroids, vec_col=vec_col)
    codes = encode(model, emb, id_col, vec_col)
    approx = {r[id_col] for r in adc_topk(model, codes, query_vec, k, id_col).collect()}
    exact = {
        r[id_col]
        for r in knn(emb, query_vec, k, id_col=id_col, vec_col=vec_col, metric="l2").collect()
    }
    return len(approx & exact) / k


# ---------------------------------------------------------------------------
# SQ8 — scalar (per-dimension affine) quantization, the FAISS SQ8 tier:
# 4x smaller vectors than float32 with near-exact recall; the usual
# middle rung between raw vectors and PQ's 16x codes.
# ---------------------------------------------------------------------------


@dataclass
class SQ8Model:
    mins: list[float]
    scales: list[float]  # (max - min) / 255 per dimension, floored > 0


def train_sq8(
    emb: DataFrame,
    vec_col: str = "embedding",
    train_sample: int = 65536,
) -> SQ8Model:
    """Per-dimension min/scale from a bounded driver-side sample (the
    train_pq pattern — the corpus never feeds the trainer; the model is
    2*dim floats, broadcast to the scan as literals)."""
    import numpy as np

    X = np.array(
        list(
            emb.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(train_sample)
            .toPandas()["v"]
        ),
        dtype="float64",
    )
    if X.size == 0:
        raise ValueError("train_sq8: empty training sample")
    mins = X.min(axis=0)
    scales = np.maximum((X.max(axis=0) - mins) / 255.0, 1e-12)
    return SQ8Model(mins=[float(m) for m in mins],
                    scales=[float(s) for s in scales])


def sq8_encode(
    model: SQ8Model,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """uint8 codes per dimension: round((x - min) / scale) clipped to
    [0, 255] — pure JVM column algebra (no Python in the scan), 4x
    smaller than float32 at rest and in shuffle."""
    mins = F.array(*[F.lit(m) for m in model.mins])
    scales = F.array(*[F.lit(s) for s in model.scales])
    code = F.transform(
        F.col(vec_col),
        lambda x, i: F.least(
            F.greatest(
                F.round(
                    (x.cast("double") - F.element_at(mins, i + 1))
                    / F.element_at(scales, i + 1)
                ).cast("int"),
                F.lit(0),
            ),
            F.lit(255),
        ),
    )
    return emb.select(F.col(id_col), code.alias("code"))


def sq8_topk(
    model: SQ8Model,
    codes: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric scan: approx dist² = Σ_i ((q_i - min_i) - code_i *
    scale_i)² — per-dim (q - min) and scale inlined as literals, one
    projection + TakeOrderedAndProject, zero Python."""
    qm = [float(q) - m for q, m in zip(query_vec, model.mins)]
    qm_col = F.array(*[F.lit(x) for x in qm])
    sc_col = F.array(*[F.lit(s) for s in model.scales])
    term = F.transform(
        F.col("code"),
        lambda c, i: F.pow(
            F.element_at(qm_col, i + 1)
            - c.cast("double") * F.element_at(sc_col, i + 1),
            F.lit(2),
        ),
    )
    dist = F.aggregate(term, F.lit(0.0), lambda acc, x: acc + x)
    return (
        codes.select(F.col(id_col), F.sqrt(dist).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def sq8_recall(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """recall@k of SQ8 vs exact L2 ground truth (src/vec.rs:587-651
    validation method). SQ8 keeps every dimension at 8-bit precision,
    so recall should sit well above PQ's."""
    from .knn import knn

    model = train_sq8(emb, vec_col=vec_col)
    codes = sq8_encode(model, emb, id_col, vec_col)
    approx = {
        r[id_col] for r in sq8_topk(model, codes, query_vec, k, id_col).collect()
    }
    exact = {
        r[id_col]
        for r in knn(
            emb, query_vec, k, id_col=id_col, vec_col=vec_col, metric="l2"
        ).collect()
    }
    return len(approx & exact) / k


# ---------------------------------------------------------------------------
# IVF-PQ — coarse inverted cells + residual product quantization: the
# composed tier that actually runs at extreme scale (FAISS IndexIVFPQ):
# the probe bounds WHICH rows are scanned (n_probe/n_cells of the
# corpus — and the cell id is a partition key, so the scan prunes at
# the file level), PQ bounds HOW MUCH is read per row (n_sub bytes).
# Residual encoding (v − centroid[cell]) is what makes the small
# codebook accurate: residuals are centered near 0 where the subspace
# centroids have resolution.
# ---------------------------------------------------------------------------


@dataclass
class IVFPQModel:
    coarse: list[list[float]]  # n_cells × dim coarse centroids
    pq: PQModel  # subspace codebooks fitted on RESIDUALS


def train_ivfpq(
    emb: DataFrame,
    n_cells: int = 8,
    n_sub: int = 4,
    k: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    train_sample: int = 65536,
) -> IVFPQModel:
    """Fit the coarse quantizer then the per-subspace codebooks on the
    sample's RESIDUALS — bounded driver-side sample, one Spark job, the
    same trainer discipline as train_pq/train_sq8 (no count()
    pre-scan; the KB-scale model broadcasts to encoders)."""
    import numpy as np

    from ..functions.vector import lloyd_kmeans

    dim = len(emb.select(vec_col).head()[0])
    assert dim % n_sub == 0, f"dim {dim} not divisible by {n_sub} subspaces"
    sub_dim = dim // n_sub
    # Arrow-batched transfer (toPandas) instead of row collect: the same
    # sample moves several times faster through Arrow batches.
    X = np.asarray(
        list(
            emb.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(train_sample)
            .toPandas()["v"]
        ),
        dtype="float64",
    )
    C = lloyd_kmeans(X, n_cells, seed=seed, max_iter=max_iter)
    d2 = (
        (X * X).sum(axis=1)[:, None]
        - 2.0 * X @ C.T
        + (C * C).sum(axis=1)[None, :]
    )
    resid = X - C[d2.argmin(axis=1)]
    centroids: list[list[list[float]]] = []
    for s in range(n_sub):
        sub = resid[:, s * sub_dim : (s + 1) * sub_dim]
        cb = lloyd_kmeans(sub, k, seed=seed + 1 + s, max_iter=max_iter)
        centroids.append([[float(x) for x in c] for c in cb])
    pq = PQModel(
        n_sub=n_sub, sub_dim=sub_dim, k=len(centroids[0]), centroids=centroids
    )
    return IVFPQModel(
        coarse=[[float(x) for x in c] for c in C], pq=pq
    )


def ivfpq_encode(
    model: IVFPQModel,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, code array<int>): nearest coarse cell, then argmin
    residual centroid per subspace — one Arrow-batched NumPy kernel,
    no shuffle. At warehouse scale the output is written PARTITIONED
    BY cell, which is what turns the query-time probe into file-level
    partition pruning."""
    import numpy as np

    C = np.asarray(model.coarse, dtype="float64")
    cents = [np.asarray(c, dtype="float64") for c in model.pq.centroids]
    n_sub, sub_dim = model.pq.n_sub, model.pq.sub_dim
    schema = f"{id_col} long, cell int, code array<int>"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(
                "float64", copy=False
            )  # stack beats per-row list() 4x; values identical
            d2 = (
                (X * X).sum(axis=1)[:, None]
                - 2.0 * X @ C.T
                + (C * C).sum(axis=1)[None, :]
            )
            cells = d2.argmin(axis=1)
            R = X - C[cells]
            codes = np.empty((len(X), n_sub), dtype="int32")
            for s in range(n_sub):
                sub = R[:, s * sub_dim : (s + 1) * sub_dim]
                cb = cents[s]
                sd = (
                    (sub * sub).sum(axis=1)[:, None]
                    - 2.0 * sub @ cb.T
                    + (cb * cb).sum(axis=1)[None, :]
                )
                codes[:, s] = sd.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cells.astype("int32"),
                    "code": list(codes),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(run, schema)


def ivfpq_topk(
    model: IVFPQModel,
    codes: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    refine: int = 0,
    emb: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the n_probe cells nearest the query; within each, ADC over
    the RESIDUAL query (q − cell centroid) with that cell's LUT. The
    probe list and per-cell LUTs are driver-side tiny and inline as
    literals; the scan is filter (partition-prunable on cell) +
    projection + top-k — pure JVM, no joins.

    ``refine > 0`` adds the standard two-stage refinement (FAISS
    IndexRefineFlat): the ADC scan shortlists ``refine × k``
    candidates, then the true vectors of JUST that shortlist re-score
    exactly (a broadcast semi-join against ``emb`` — tiny, since the
    shortlist is driver-bounded). This trades one extra narrow join
    for removing the quantization error entirely from the final
    ranking; residual loss is then only the cell-probe ceiling.

    Output is ONE schema regardless of the refine flag:
    ``(id_col, dist, rank)`` — dist is the ADC approximation when
    refine<=0 and the exact re-ranked L2 when refine>0; rank 1 = best,
    ties broken by id ascending."""
    q = [float(x) for x in query_vec]
    cdist = [
        (sum((q[i] - c[i]) ** 2 for i in range(len(q))), ci)
        for ci, c in enumerate(model.coarse)
    ]
    probes = [ci for _, ci in sorted(cdist)[:n_probe]]
    n_sub, sub_dim = model.pq.n_sub, model.pq.sub_dim

    def lut_for(ci: int):
        qr = [q[i] - model.coarse[ci][i] for i in range(len(q))]
        return [
            [
                sum(
                    (qr[s * sub_dim + i] - c[i]) ** 2
                    for i in range(sub_dim)
                )
                for c in model.pq.centroids[s]
            ]
            for s in range(n_sub)
        ]

    lut_cols = {
        ci: F.array(
            *[F.array(*[F.lit(d) for d in row]) for row in lut_for(ci)]
        )
        for ci in probes
    }
    lut_col = F.when(F.col("cell") == probes[0], lut_cols[probes[0]])
    for ci in probes[1:]:
        lut_col = lut_col.when(F.col("cell") == ci, lut_cols[ci])
    dist = F.aggregate(
        F.zip_with(
            lut_col,
            F.col("code"),
            lambda row, c: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    shortlist = (
        codes.filter(F.col("cell").isin(probes))
        .select(F.col(id_col), F.sqrt(dist).alias("dist"))
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k if refine <= 0 else refine * k)
    )
    if refine <= 0:
        # rank over the ≤k already-truncated rows (rank-after-truncate)
        w = Window.orderBy(F.col("dist").asc(), F.col(id_col).asc())
        return shortlist.withColumn("rank", F.row_number().over(w))
    if emb is None:
        raise ValueError("refine > 0 needs the emb DataFrame to re-score")
    from .knn import knn

    cand = emb.join(
        F.broadcast(shortlist.select(id_col)), id_col, "left_semi"
    )
    exact = knn(cand, q, k, id_col=id_col, vec_col=vec_col, metric="l2")
    return exact.select(F.col(id_col), F.col("score").alias("dist"), "rank")


def ivfpq_recall(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 8,
    n_sub: int = 4,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """recall@k of IVF-PQ vs exact L2 ground truth (vec.rs:587-651
    validation method)."""
    from .knn import knn

    model = train_ivfpq(
        emb, n_cells=n_cells, n_sub=n_sub, k=n_centroids, vec_col=vec_col
    )
    codes = ivfpq_encode(model, emb, id_col, vec_col)
    approx = {
        r[id_col]
        for r in ivfpq_topk(
            model, codes, query_vec, k, n_probe, id_col
        ).collect()
    }
    exact = {
        r[id_col]
        for r in knn(
            emb, query_vec, k, id_col=id_col, vec_col=vec_col, metric="l2"
        ).collect()
    }
    return len(approx & exact) / k
