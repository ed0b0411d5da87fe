"""Pins for the web-text cleaning + training-output layout tier:
mojibake catalog integrity and repair round-trips (Spark vs the Python
twin), and deterministic shard assignment invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from memvid_spark.functions.text import (
    MOJIBAKE_MAP,
    mojibake_count,
    repair_mojibake,
    repair_mojibake_py,
)
from memvid_spark.operators import traindata


def test_mojibake_catalog_nonoverlapping():
    pats = [b for b, _ in MOJIBAKE_MAP]
    assert len(pats) == len(set(pats))
    for i, p in enumerate(pats):
        for j, q in enumerate(pats):
            assert i == j or p not in q, (p, q)


def test_mojibake_roundtrip_restores_original(spark):
    originals = [
        "café déjà vu — “smart” quotes… naïve son’s résumé",
        "Größe müsste schön sein – ça c’est ça",
        "plain ascii stays untouched",
    ]
    corrupted = []
    for s in originals:
        bad = s
        for artifact, good in MOJIBAKE_MAP:
            bad = bad.replace(good, artifact)
        corrupted.append(bad)
    df = spark.createDataFrame(
        list(enumerate(corrupted)), "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.fixed, r.n)
        for r in df.select(
            "doc_id",
            repair_mojibake(F.col("text")).alias("fixed"),
            mojibake_count(F.col("text")).alias("n"),
        ).collect()
    }
    for i, orig in enumerate(originals):
        assert out[i][0] == orig
        # python twin agrees with the Spark chain
        assert repair_mojibake_py(corrupted[i]) == orig
    assert out[2][1] == 0  # clean text: zero artifacts
    assert out[0][1] > 0 and out[1][1] > 0


def test_mojibake_count_exact(spark):
    art_e = "é".encode("utf-8").decode("latin-1")  # 2-char artifact
    art_q = "".join(
        chr(b) if b in (0x80, 0x99) else bytes([b]).decode("cp1252")
        for b in "’".encode("utf-8")
    )
    # build via the catalog so the test can't drift from it
    art_q = next(b for b, g in MOJIBAKE_MAP if g == "’")
    text = f"caf{art_e} caf{art_e} don{art_q}t"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = df.select(mojibake_count(F.col("text")).alias("n")).head().n
    assert n == 3


def test_shard_assign_covers_each_doc_once(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(200)], "doc_id long, text string"
    )
    out = traindata.shard_assign(docs, n_shards=8).collect()
    assert len(out) == 200
    assert {r.doc_id for r in out} == set(range(200))
    assert all(0 <= r.shard < 8 for r in out)
    # deterministic: same assignment on re-run
    again = traindata.shard_assign(docs, n_shards=8).collect()
    assert sorted((r.doc_id, r.shard, r.pos) for r in out) == sorted(
        (r.doc_id, r.shard, r.pos) for r in again
    )


def test_shard_assign_balanced(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(2000)], "doc_id long, text string"
    )
    sizes = [
        r.n_docs
        for r in traindata.shard_stats(docs, n_shards=8).collect()
    ]
    assert len(sizes) == 8
    # hash sharding: no shard further than 30% from the mean at n=2000
    mean = sum(sizes) / 8
    assert all(abs(s - mean) / mean < 0.3 for s in sizes)
