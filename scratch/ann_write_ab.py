"""A/B evidence for the round-8 continuation claims:

A. Streaming sink write cost at scale: a tiny CDC delta against a
   100x-scale persisted IVF index — partition-level dynamic overwrite
   (shipped) vs full tmp+swap rewrite (the first-half behavior).
B. Entry-cover build overhead: _build_shard + _entry_cover wall at a
   full 25k-node shard, cover share reported.

Run STANDALONE (never beside bench/pytest)."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def exp_b():
    from memvid_spark.operators.hnsw import _build_shard, _entry_cover

    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 1, (25000, 64))
    t0 = time.perf_counter()
    adj = _build_shard(vecs, 16, 100)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    entries = _entry_cover(adj)
    t_cover = time.perf_counter() - t0
    print(f"B: build 25k-node shard {t_build:.2f}s, entry cover "
          f"{t_cover:.3f}s ({100*t_cover/t_build:.1f}% of build), "
          f"{len(entries)} entries")


def exp_a():
    from memvid_spark.session import get_spark
    from memvid_spark.operators.hnsw import (
        build_nsw_index_ivf, train_cell_centroids,
    )
    from memvid_spark.streaming.annsink import (
        ANN_CDC_SCHEMA, StreamingAnnMaintainer,
    )
    from pyspark.sql import functions as F

    spark = get_spark("ann-write-ab")
    src = "/root/repo/scratch/probe100x/embeddings.parquet"
    emb = spark.read.parquet(src).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.count()
    cents = [
        [float(x) for x in c]
        for c in train_cell_centroids(emb, n_cells=32)
    ]
    work = tempfile.mkdtemp(prefix="ann_ab_")
    mt = StreamingAnnMaintainer(os.path.join(work, "a"), cents, m=16)
    t0 = time.perf_counter()
    mt.apply_batch(
        emb.select("vec_id", "embedding",
                   F.lit(False).alias("deleted"),
                   F.lit(0).cast("long").alias("seq")),
        0,
    )
    t_boot = time.perf_counter() - t0
    print(f"A: bootstrap build+persist over {n} rows: {t_boot:.1f}s")
    delta = spark.createDataFrame(
        [(10_000_000 + i, [float((i * 7 + d) % 13) for d in range(64)],
          False, 1) for i in range(100)],
        ANN_CDC_SCHEMA,
    )
    for tag in ("warm", "timed"):
        t0 = time.perf_counter()
        mt.apply_batch(delta, 1)
        print(f"A: partition-overwrite delta (100 rows, {tag}): "
              f"{time.perf_counter() - t0:.2f}s")
    # the first-half behavior: full read -> apply -> tmp+swap rewrite
    from memvid_spark.operators.hnsw import apply_delta_ivf

    for tag in ("warm", "timed"):
        t0 = time.perf_counter()
        new_index = apply_delta_ivf(mt.index(spark), delta, cents, m=16)
        mt._swap(spark, new_index)
        print(f"A: full tmp+swap delta (100 rows, {tag}): "
              f"{time.perf_counter() - t0:.2f}s")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    exp_b()
    exp_a()
