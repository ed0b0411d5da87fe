"""Product Quantization: subspace k-means codebooks + ADC search.

Reference: src/vec_pq.rs:1-175 — 384-d vectors split into 96 × 4-d
subspaces, 256 k-means centroids per subspace, 96-byte codes, queries
scored with an Asymmetric Distance Computation lookup table.

Spark design (SURVEY §2.8):
- train: MLlib KMeans once per subspace over a sample — offline batch.
- encode: one broadcast of the (tiny) codebook; per-row argmin per
  subspace via Column expressions — the corpus is never shuffled and the
  output code table is ~dims/sub × 1 byte per row.
- ADC search: the query's LUT (n_sub × k distances) is computed on the
  driver (tiny), broadcast as a literal array, and the approximate
  distance is a codegen'd sum of LUT lookups — a pure scan, no joins.
- Correctness tier stays exact knn (vec.rs:587-651 treats brute force as
  ground truth); PQ is the compressed scale path with a recall contract.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


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
) -> PQModel:
    """Fit one KMeans codebook per subspace (vec_pq.rs trains 96 × 256;
    scaled to the 16-d test vectors)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    dim = len(emb.select(vec_col).head()[0])
    assert dim % n_sub == 0, f"dim {dim} not divisible by {n_sub} subspaces"
    sub_dim = dim // n_sub
    centroids: list[list[list[float]]] = []
    base = emb.select(F.col(vec_col).cast("array<double>").alias("v"))
    for s in range(n_sub):
        sub = base.select(
            array_to_vector(F.slice("v", s * sub_dim + 1, sub_dim)).alias("features")
        )
        model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(sub)
        centroids.append([[float(x) for x in c] for c in model.clusterCenters()])
    return PQModel(n_sub=n_sub, sub_dim=sub_dim, k=k, centroids=centroids)


def _sub_dist2(sub_vec, centroid: Sequence[float]):
    """Squared L2 between a sliced sub-vector Column and a literal centroid."""
    lit = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(sub_vec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def encode(
    model: PQModel, emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, code array<int>): argmin centroid per subspace, computed with
    codegen'd expressions (no shuffle, no Python)."""
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for s in range(model.n_sub):
        sub = F.slice(v, s * model.sub_dim + 1, model.sub_dim)
        dists = F.array(*[_sub_dist2(sub, c) for c in model.centroids[s]])
        codes.append(F.array_position(dists, F.array_min(dists)).cast("int") - 1)
    return emb.select(F.col(id_col), F.array(*codes).alias("code"))


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
