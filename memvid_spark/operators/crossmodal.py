"""Cross-modal (CLIP-analogue) shared space over REAL decoded pixels.

Reference: image frames carry vectors in a second embedding space and
text→image search embeds the query into that same space, then runs kNN
(src/clip.rs:99-102,297-380; src/memvid/search/api.rs:165-257). The
actual CLIP model is a declared non-goal in this container; what IS
real here is everything around it: pixels decode through the stdlib PNG
codec, image features come from decoded pixel statistics, both
modalities land in one shared d-dim space via deterministic projections,
and retrieval is exact integer arithmetic (hash-verifiable end to end).

Design for scale:
- image → vector runs in mapInPandas (decode is Python); output is a
  small array column, payloads never shuffle.
- text → vector is driver-side (queries are single strings).
- scoring is pure column algebra (zip_with + aggregate — JVM codegen):
  squared-L2 over integer vectors, so Spark and the SQL oracle agree
  bit-for-bit with no float rounding contract.
- top-k is orderBy(dist2, id).limit(k) → TakeOrderedAndProject.

A deployment swaps both projections for real CLIP towers (the
BatchModelEmbedder seam, functions/embed.py) without touching the
retrieval plan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

DIM = 8
N_FEATS = 8


def proj_weight(i: int, j: int) -> int:
    """Deterministic integer projection W[feat i][dim j] — the fixed
    'image tower'. Small signed ints keep dot products exact."""
    return (i * 7 + j * 13) % 11 - 5


def pixel_features(pixels) -> list[int]:
    """Integer feature vector from DECODED pixels (order matters — the
    oracle mirrors this layout):
    [width, height, channels, px_min, px_max, px_sum % 251,
     px_sum // n_px, n_px]."""
    import numpy as np

    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    s = int(px.astype(np.int64).sum())
    n = int(px.size)
    return [w, h, ch, int(px.min()), int(px.max()), s % 251, s // n, n]


def image_vec(feats: list[int]) -> list[int]:
    """Project integer features into the shared DIM-d space."""
    return [
        sum(feats[i] * proj_weight(i, j) for i in range(N_FEATS))
        for j in range(DIM)
    ]


def text_vec(text: str) -> list[int]:
    """Deterministic 'text tower': per-token md5 bytes → signed ints,
    summed per dimension. Same codomain scale as image_vec so L2
    distances are meaningful; swap for a real text encoder in prod."""
    v = [0] * DIM
    for tok in text.lower().split():
        h = hashlib.md5(tok.encode("utf-8")).digest()
        for j in range(DIM):
            v[j] += (h[j] - 128) * 4
    return v


def embed_images(media: DataFrame, payload_col: str = "payload",
                 id_col: str = "media_id") -> DataFrame:
    """(id, emb array<long>) from real image payloads — any stdlib-
    decodable format (PNG/BMP/GIF/baseline JPEG, magic-routed via
    multimodal.decode_image): decode → integer features → projection,
    one Arrow batch per Python call."""

    schema = f"{id_col} long, emb array<long>"

    def run(batches):
        import pandas as pd

        from ..sources.multimodal import decode_image

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_image(bytes(payload), "")
                out.append((int(mid), image_vec(pixel_features(px))))
            yield pd.DataFrame(out, columns=[id_col, "emb"])

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def embed_images_model(
    media: DataFrame,
    tower_factory,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL-model image tower seam (src/clip.rs:99-102's MobileCLIP
    image encoder): ``tower_factory()`` runs ONCE per task
    executor-side (model never pickles through the closure — the
    BatchModelEmbedder convention) and returns
    ``fn(pixels_list) -> 2D float array`` encoding a batch of decoded
    HxWxC uint8 pixel arrays into the shared float space. Decode stays
    the engine's own stdlib codecs; retrieval over the output is the
    ordinary cosine kNN plan (operators/knn.py) — swapping the
    deterministic integer towers for CLIP touches neither. Output:
    (id, embedding array<double>), L2-normalized.
    """
    schema = f"{id_col} long, embedding array<double>"

    def run(batches):
        import numpy as np
        import pandas as pd

        from ..sources.multimodal import decode_image

        tower = tower_factory()
        for pdf in batches:
            ids = [int(x) for x in pdf[id_col]]
            pixels = [
                np.asarray(decode_image(bytes(p), ""), dtype=np.uint8)
                for p in pdf[payload_col]
            ]
            vecs = np.asarray(tower(pixels), dtype=np.float64)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            vecs = vecs / norms
            yield pd.DataFrame({id_col: ids, "embedding": list(vecs)})

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def clip_tower_factories(model: str = "clip-ViT-B-32"):
    """Ready-made REAL CLIP towers for :func:`embed_images_model` and
    the text side of the shared space: returns
    ``(image_tower_factory, text_encoder)`` built on
    sentence-transformers' CLIP checkpoints (the
    src/clip.rs:297-380 text↔image space). Requires
    ``sentence-transformers`` + PIL — callers gate on availability
    (test suite skipifs, mirroring the text-embedder seam)."""

    def image_factory():
        import numpy as np
        from PIL import Image
        from sentence_transformers import SentenceTransformer

        m = SentenceTransformer(model)

        def tower(pixel_arrays):
            imgs = []
            for px in pixel_arrays:
                if px.ndim == 2:
                    px = np.repeat(px[:, :, None], 3, axis=2)
                if px.shape[2] == 4:
                    px = px[:, :, :3]
                imgs.append(Image.fromarray(px, mode="RGB"))
            return m.encode(imgs, normalize_embeddings=False)

        return tower

    def text_encoder(texts: list[str]):
        from sentence_transformers import SentenceTransformer

        m = SentenceTransformer(model)
        return m.encode(list(texts), normalize_embeddings=False)

    return image_factory, text_encoder


def crossmodal_knn_ann(
    index: DataFrame,
    centroids,
    text: str,
    k: int = 10,
    ef_search: int = 50,
    probes: int = 4,
    id_col: str = "media_id",
    exclude_ids=None,
) -> DataFrame:
    """Cell-pruned ANN retrieval in the shared cross-modal space — the
    serving-tier route for text→image search (the reference's second
    ANN space: clip.rs:297-380 runs the same HNSW over image vectors).
    ``index`` is a ``build_nsw_index_ivf`` graph over the integer image
    embeddings (stored as array<double>; values are exact integers).
    The graph walk proposes the top-k CANDIDATES; those k rows then
    join back to their stored embeddings and re-rank by the exact
    integer squared-L2 total order of :func:`crossmodal_knn` — so the
    output schema (id, dist2, rank) and the scoring semantics are
    identical to the exact path, and only the candidate SET is
    approximate (recall governed by ``probes``, bound pinned in
    tests). ``exclude_ids`` drops served hits post-walk (session
    tombstones — a dropped hit may leave fewer than k rows until the
    next index rebuild).

    Round 11: the exact-rescore join reads only the PROBED cells'
    slice of the index — every candidate the walk proposes lives
    there, so the result is unchanged while the per-request scan (and,
    through a :class:`~.hnsw.CellIndexHandle`, the per-request file
    listing) drops from O(index) to O(probes) cells. Previously the
    rescore re-scanned the whole graph per request just to attach k
    embeddings."""
    from .hnsw import _index_cells, nsw_knn, probe_cells_for

    qv = [float(x) for x in text_vec(text)]
    cells = probe_cells_for(centroids, qv, probes)
    sub = _index_cells(index, cells)
    hits = nsw_knn(sub, qv, k=k, ef_search=ef_search)
    cand = sub.select(
        F.col("vec_id").alias(id_col),
        # lossless: the tier stores exact integers in double form
        F.col("embedding").cast("array<long>").alias("emb"),
    ).join(
        F.broadcast(hits.select(F.col("vec_id").alias(id_col))), id_col
    )
    if exclude_ids:
        cand = cand.filter(
            ~F.col(id_col).isin([int(t) for t in exclude_ids])
        )
    return crossmodal_knn(cand, text, k=k, id_col=id_col)


def crossmodal_knn(
    image_vecs: DataFrame, text: str, k: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Text→image kNN in the shared space: exact squared-L2 (integer
    column algebra — no Python in the scoring path), ascending top-k
    with a total order."""
    qv = text_vec(text)
    q = F.array(*[F.lit(int(x)) for x in qv])
    dist2 = F.aggregate(
        F.zip_with(F.col("emb"), q, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    order = [F.col("dist2").asc(), F.col(id_col).asc()]
    w = Window.orderBy(*order)
    return (
        image_vecs.withColumn("dist2", dist2)
        .select(id_col, "dist2")
        .orderBy(*order)
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
    )
