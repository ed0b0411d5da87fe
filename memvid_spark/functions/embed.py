"""Embedding providers: the pluggable VecEmbedder surface.

Reference: the ``VecEmbedder`` trait decouples the engine from any model
(src/lib.rs:211, used src/memvid/ask.rs:23); local ONNX models
(BGE-small-384 etc., src/text_embed.rs:9-12,171-210) and remote API
embeddings (src/api_embed.rs) are providers behind it; dimension is
enforced at write (src/memvid/mutation.rs:3329-3349) and query
(src/memvid/search/api.rs:150-156), with model binding via
``set_vec_model`` (api.rs:110-127).

Here the correctness-tier provider is :class:`HashEmbedder` — a
deterministic token-hash projection (the reference's own tests pin
hash-based embeddings rather than model output; SURVEY non-goals). It is
*portable column algebra*: dimension j of a document is
``Σ_tokens ((hash64(tok ⊕ j) mod 2001) − 1000)/1000``, L2-normalized —
reproducible bit-for-bit in the DuckDB oracle. Model-backed providers
(sentence-transformers / HTTP batch) plug in behind the same protocol
with mapInPandas, gated on their libraries being present.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import Column, DataFrame, functions as F

from .hashing import hash64
from .text import tokens


class VecEmbedder(Protocol):
    """Provider protocol (VecEmbedder trait analogue)."""

    dim: int
    model: str

    def embed_df(self, docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
        """→ (id_col, embedding array<double>)"""
        ...

    def embed_query(self, text: str) -> list[float]:
        ...


def _component(tok_col: Column, j: int) -> Column:
    return (
        (hash64(F.concat(tok_col, F.lit(f"#d{j}"))) % 2001 - 1000) / 1000.0
    )


class HashEmbedder:
    """Deterministic bag-of-tokens hash projection, unit-normalized.
    Same token → same direction in every engine; cosine of overlapping
    texts grows with shared vocabulary, which is all the retrieval
    pipeline needs for correctness testing."""

    def __init__(self, dim: int = 8, model: str = "hash-v1"):
        self.dim = dim
        self.model = model

    def embed_df(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        tok = docs.select(
            F.col(id_col), F.explode(tokens(text_col)).alias("tok")
        )
        sums = tok.groupBy(id_col).agg(
            *[
                F.sum(_component(F.col("tok"), j)).alias(f"c{j}")
                for j in range(self.dim)
            ]
        )
        vec = F.array(*[F.col(f"c{j}") for j in range(self.dim)])
        nrm = F.sqrt(
            F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x)
        )
        unit = F.transform(vec, lambda x: F.round(x / nrm, 6))
        return sums.select(F.col(id_col), unit.alias("embedding"))

    def embed_query(self, text: str) -> list[float]:
        """Driver-side twin of the column arithmetic (md5 is portable)."""
        import hashlib
        import math
        import re

        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
        comps = [0.0] * self.dim
        for t in toks:
            for j in range(self.dim):
                hv = int(
                    hashlib.md5(f"{t}#d{j}".encode()).hexdigest()[:15], 16
                )
                comps[j] += (hv % 2001 - 1000) / 1000.0
        n = math.sqrt(sum(c * c for c in comps)) or 1.0
        return [round(c / n, 6) for c in comps]


def sql_hash_embedding(text_expr: str, dim: int = 8) -> str:
    """DuckDB twin of HashEmbedder.embed_df for oracle assembly."""
    toks = (
        f"list_filter(string_split_regex(lower({text_expr}), '[^a-z0-9]+'),"
        " t -> t <> '')"
    )
    comp = (
        "list_sum(list_transform({toks}, t -> "
        "(('0x' || substr(md5(t || '#d{j}'), 1, 15))::bigint % 2001 - 1000)"
        " / 1000.0))"
    )
    comps = ", ".join(comp.format(toks=toks, j=j) for j in range(dim))
    vec = f"[{comps}]"
    return (
        f"list_transform({vec}, x -> round(x / "
        f"sqrt(list_dot_product({vec}, {vec})), 6))"
    )


def assert_dimension(emb: DataFrame, expected: int, vec_col: str = "embedding"):
    """Write/query-time dimension contract (mutation.rs:3329-3349):
    raises if any row deviates. Runs as one aggregate, no collect of
    data rows."""
    bad = emb.filter(F.size(F.col(vec_col)) != expected).limit(1).count()
    if bad:
        raise ValueError(
            f"embedding dimension contract violated: expected {expected}"
        )
    return True


def model_binding(emb: DataFrame, embedder) -> DataFrame:
    """set_vec_model analogue: stamp provider identity on the table so
    mixed-model spaces are detectable (api.rs:110-127)."""
    return emb.withColumn("model", F.lit(embedder.model))


from ..session import fan_out as _fan_out  # noqa: E402


class BatchModelEmbedder:
    """Local-model batch embedding over mapInPandas — the
    src/text_embed.rs:171-210 batch loop re-expressed for executors.

    Each executor lazily builds ONE encoder per task (``model_factory``
    runs executor-side, so the model never ships through the closure
    pickle) and encodes Arrow batches in ``batch_size`` slices,
    L2-normalizing the output. With sentence-transformers installed the
    default factory loads ``model`` (BGE/nomic/GTE-style ids); in this
    container it isn't available, so `.available()` is False and callers
    fall back — the bench tier injects a NumPy random-projection encoder
    (same batched matrix compute shape, deterministic) to exercise and
    time the full plumbing: Arrow transfer, slicing, normalization,
    dimension contract.
    """

    def __init__(self, dim: int = 384, model: str = "BAAI/bge-small-en-v1.5",
                 model_factory=None, batch_size: int = 64):
        self.dim = dim
        self.model = model
        self.model_factory = model_factory  # () -> Callable[[list[str]], ndarray]
        self.batch_size = batch_size

    @staticmethod
    def available() -> bool:
        try:
            import sentence_transformers  # noqa: F401

            return True
        except ImportError:
            return False

    def _default_factory(self):
        model_name, dim = self.model, self.dim

        def build():
            from sentence_transformers import SentenceTransformer

            m = SentenceTransformer(model_name)

            def encode(texts: list[str]):
                return m.encode(texts, normalize_embeddings=False)

            return encode

        return build

    def embed_df(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        factory = self.model_factory
        if factory is None:
            if not self.available():
                raise NotImplementedError(
                    "BatchModelEmbedder needs sentence-transformers or an "
                    "injected model_factory; use HashEmbedder for the "
                    "correctness tier"
                )
            factory = self._default_factory()
        dim, bs = self.dim, self.batch_size
        schema = f"{id_col} long, embedding array<double>"

        def run(batches):
            import numpy as np
            import pandas as pd

            encode = factory()  # one model per task, built executor-side
            for pdf in batches:
                texts = list(pdf[text_col])
                outs = []
                for i in range(0, len(texts), bs):
                    arr = np.asarray(encode(texts[i : i + bs]), dtype="float64")
                    if arr.ndim != 2 or arr.shape[1] != dim:
                        raise ValueError(
                            "embedding dimension contract violated: "
                            f"got {arr.shape}, want (*, {dim})"
                        )
                    nrm = np.linalg.norm(arr, axis=1, keepdims=True)
                    outs.append(arr / np.where(nrm == 0, 1.0, nrm))
                vecs = np.vstack(outs) if outs else np.empty((0, dim))
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "embedding": list(map(list, vecs))}
                )

        return _fan_out(docs.select(id_col, text_col)).mapInPandas(run, schema)

    def embed_query(self, text: str) -> list[float]:
        factory = self.model_factory or self._default_factory()
        import numpy as np

        arr = np.asarray(factory()([text]), dtype="float64")[0]
        n = float(np.linalg.norm(arr)) or 1.0
        return [float(x) / n for x in arr]


def projection_model_factory(dim: int = 384, vocab_dim: int = 4096, seed: int = 7):
    """Deterministic stand-in encoder: hashed bag-of-words → fixed random
    projection (a real batched matrix multiply, the compute shape of a
    pooling encoder's last layer). Used by the bench tier when no model
    library is installed; NOT a semantic model."""

    def build():
        import numpy as np
        import zlib

        rng = np.random.default_rng(seed)
        proj = rng.standard_normal((vocab_dim, dim)).astype("float64")

        def encode(texts: list[str]):
            bows = np.zeros((len(texts), vocab_dim))
            for r, t in enumerate(texts):
                for w in t.lower().split():
                    bows[r, zlib.crc32(w.encode()) % vocab_dim] += 1.0
            return bows @ proj

        return encode

    return build


def http_transport(
    endpoint: str,
    api_key: str | None = None,
    model: str | None = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff_s: float = 1.0,
    opener=None,
    sleep=None,
):
    """Default urllib-based JSON transport for :class:`ApiEmbedder`,
    mirroring the reference's remote batch loop (src/api_embed.rs:
    batched POSTs, bearer auth, bounded retry with backoff).

    Wire shape is the common embeddings-API contract:
    request  ``{"input": [texts...], "model": "..."}``;
    response ``{"data": [{"embedding": [...]}, ...]}`` in input order.

    ``opener``/``sleep`` are injection points (default
    ``urllib.request.urlopen`` / ``time.sleep``) so tests run the full
    encode/decode/retry path against a fake with zero network."""
    import json as _json
    import time as _time
    import urllib.request

    open_fn = opener or urllib.request.urlopen
    sleep_fn = sleep or _time.sleep

    def transport(texts: list[str]) -> list[list[float]]:
        body: dict = {"input": list(texts)}
        if model is not None:
            body["model"] = model
        payload = _json.dumps(body).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if api_key is not None:
            headers["Authorization"] = f"Bearer {api_key}"
        last_err: Exception | None = None
        for attempt in range(max_retries):
            req = urllib.request.Request(endpoint, data=payload, headers=headers)
            try:
                with open_fn(req, timeout=timeout) as resp:
                    data = _json.loads(resp.read().decode("utf-8"))
                rows = data["data"]
                if len(rows) != len(texts):
                    raise ValueError(
                        f"embedding count mismatch: sent {len(texts)}, "
                        f"got {len(rows)}"
                    )
                return [[float(x) for x in r["embedding"]] for r in rows]
            except Exception as e:  # noqa: BLE001 — retry then surface
                last_err = e
                if attempt + 1 < max_retries:
                    sleep_fn(backoff_s * (2 ** attempt))
        raise RuntimeError(
            f"embedding endpoint failed after {max_retries} attempts"
        ) from last_err

    return transport


class ApiEmbedder:
    """Remote batch-embedding provider (src/api_embed.rs, 596 LoC):
    mapInPandas with one HTTP batch per Arrow batch. Pass ``endpoint``
    (+ optional ``api_key``) to use the default urllib JSON transport
    (:func:`http_transport`), or inject a ``transport`` callable
    directly. With neither, this raises rather than silently producing
    fake vectors — remote embeddings stay out of the correctness tier
    (tests pin HashEmbedder / a fake opener instead, SURVEY non-goals)."""

    def __init__(self, dim: int = 384, model: str = "api-remote",
                 transport=None, batch_size: int = 128,
                 endpoint: str | None = None, api_key: str | None = None):
        self.dim = dim
        self.model = model
        if transport is None and endpoint is not None:
            transport = http_transport(endpoint, api_key=api_key, model=model)
        self.transport = transport  # Callable[[list[str]], list[list[float]]]
        self.batch_size = batch_size

    def embed_df(
        self, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
    ) -> DataFrame:
        if self.transport is None:
            raise NotImplementedError(
                "ApiEmbedder needs a transport callable (no network "
                "access assumed); inject one or use HashEmbedder"
            )
        transport, dim, bs = self.transport, self.dim, self.batch_size
        schema = f"{id_col} long, embedding array<double>"

        def run(batches):
            import pandas as pd

            for pdf in batches:
                texts = list(pdf[text_col])
                vecs: list[list[float]] = []
                for i in range(0, len(texts), bs):
                    out = transport(texts[i : i + bs])
                    if any(len(v) != dim for v in out):
                        raise ValueError("embedding dimension contract violated")
                    vecs.extend(out)
                yield pd.DataFrame({id_col: pdf[id_col], "embedding": vecs})

        return _fan_out(docs.select(id_col, text_col)).mapInPandas(run, schema)

    def embed_query(self, text: str) -> list[float]:
        if self.transport is None:
            raise NotImplementedError("ApiEmbedder needs a transport callable")
        return self.transport([text])[0]
