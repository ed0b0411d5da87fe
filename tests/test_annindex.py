"""ANN artifact persistence pins: save→load round trips must preserve
search behavior exactly (same codes, same top-k), and the envelope
rejects kind/version mismatches before they can silently degrade
recall."""

from __future__ import annotations

import pytest

from memvid_spark.operators import annindex, knn, pq


@pytest.fixture(scope="module")
def emb(spark):
    from tests.conftest import SF_DIR

    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_pq_roundtrip_search_parity(spark, emb, tmp_path):
    model = pq.train_pq(emb, n_sub=4, k=8)
    path = str(tmp_path / "pq.json")
    annindex.save_pq(model, path)
    loaded = annindex.load_pq(path)
    assert (loaded.n_sub, loaded.sub_dim, loaded.k) == (
        model.n_sub, model.sub_dim, model.k,
    )
    assert loaded.centroids == model.centroids
    qvec = [float(x) for x in emb.filter("vec_id = 1").head().embedding]
    codes_a = pq.encode(model, emb)
    codes_b = pq.encode(loaded, emb)
    a = [(r.vec_id, r.approx_dist) for r in pq.adc_topk(model, codes_a, qvec, k=5).collect()]
    b = [(r.vec_id, r.approx_dist) for r in pq.adc_topk(loaded, codes_b, qvec, k=5).collect()]
    assert a == b and len(a) == 5


def test_ivf_centroids_roundtrip(spark, emb, tmp_path):
    cents = knn.train_centroids(emb, n_cells=8)
    path = str(tmp_path / "ivf.json")
    annindex.save_centroids(cents, path)
    loaded = annindex.load_centroids(spark, path)
    want = sorted((r.centroid_id, list(r.centroid)) for r in cents.collect())
    got = sorted((r.centroid_id, list(r.centroid)) for r in loaded.collect())
    assert got == want


def test_hyperplanes_roundtrip(tmp_path):
    planes = knn.srp_hyperplanes(dim=16, n_planes=8)
    path = str(tmp_path / "srp.json")
    annindex.save_hyperplanes(planes, path)
    assert annindex.load_hyperplanes(path) == planes


def test_envelope_rejects_mismatches(tmp_path):
    planes = knn.srp_hyperplanes(dim=4, n_planes=2)
    path = str(tmp_path / "srp.json")
    annindex.save_hyperplanes(planes, path)
    with pytest.raises(ValueError, match="expected 'pq'"):
        annindex.load_pq(path)
    import json

    env = json.load(open(path))
    env["version"] = 99
    json.dump(env, open(path, "w"))
    with pytest.raises(ValueError, match="version"):
        annindex.load_hyperplanes(path)


def test_sq8_recall_and_persistence(spark, tmp_path):
    """SQ8 keeps all 64 dims at 8-bit precision, so recall@10 vs exact
    must sit near 1.0 (well above the PQ bound); the model persists
    through the versioned artifact envelope."""
    from memvid_spark.operators.annindex import load_sq8, save_sq8
    from memvid_spark.operators.pq import (
        sq8_encode,
        sq8_recall,
        sq8_topk,
        train_sq8,
    )

    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = [float(x) for x in emb.filter("vec_id = 5").head().embedding]
    r = sq8_recall(emb, qvec, k=10)
    assert r >= 0.9, r

    model = train_sq8(emb)
    p = str(tmp_path / "sq8.json")
    save_sq8(model, p)
    loaded = load_sq8(p)
    assert loaded.mins == model.mins and loaded.scales == model.scales
    codes = sq8_encode(loaded, emb)
    row = codes.head()
    assert all(0 <= c <= 255 for c in row.code) and len(row.code) == 64
    top = sq8_topk(loaded, codes, qvec, k=5).collect()
    assert len(top) == 5
    assert top[0].approx_dist <= top[-1].approx_dist


def test_ivfpq_recall_and_residual_advantage(spark):
    """IVF-PQ (coarse cells + residual PQ): recall@10 vs exact ground
    truth clears the contract, probing touches only n_probe cells, and
    ivfpq_topk's id set matches a driver-side NumPy replay of the same
    model (encode + per-cell ADC are deterministic)."""
    import numpy as np

    from memvid_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_recall,
        ivfpq_topk,
        train_ivfpq,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = [float(x) for x in emb.filter("vec_id = 3").head().embedding]

    r = ivfpq_recall(
        emb, q, k=10, n_cells=8, n_sub=8, n_centroids=32, n_probe=3
    )
    assert r >= 0.5  # unrefined compressed-code tier

    # refined contract (q175): ADC shortlist -> exact re-rank must beat
    # the plain-PQ tier's 0.4 on this data
    from memvid_spark.operators.pq import ivfpq_topk as _topk
    from memvid_spark.operators.knn import knn as _knn
    m2 = train_ivfpq(emb, n_cells=8, n_sub=8, k=64)
    c2 = ivfpq_encode(m2, emb)
    ref = {
        r.vec_id
        for r in _topk(
            m2, c2, q, k=10, n_probe=4, refine=20, emb=emb
        ).collect()
    }
    ex = {r.vec_id for r in _knn(emb, q, 10, metric="l2").collect()}
    assert len(ref & ex) / 10 >= 0.7

    # deterministic replay: Spark scan == NumPy over collected codes
    model = train_ivfpq(emb, n_cells=8, n_sub=8, k=32)
    codes = ivfpq_encode(model, emb)
    got = [
        r.vec_id
        for r in ivfpq_topk(model, codes, q, k=10, n_probe=3).collect()
    ]
    rows = codes.collect()
    C = np.asarray(model.coarse)
    cd = ((C - np.asarray(q)) ** 2).sum(axis=1)
    probes = set(np.argsort(cd, kind="stable")[:3].tolist())
    n_sub, sub_dim = model.pq.n_sub, model.pq.sub_dim
    luts = {}
    for ci in probes:
        qr = np.asarray(q) - C[ci]
        luts[ci] = [
            ((np.asarray(model.pq.centroids[s])
              - qr[s * sub_dim : (s + 1) * sub_dim]) ** 2).sum(axis=1)
            for s in range(n_sub)
        ]
    scored = []
    for row in rows:
        if row.cell not in probes:
            continue
        d = sum(luts[row.cell][s][row.code[s]] for s in range(n_sub))
        scored.append((float(np.sqrt(d)), row.vec_id))
    expect = [v for _, v in sorted(scored)[:10]]
    assert got == expect
