#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE compact JSON line (the driver contract — it must fit the
driver's stdout-tail capture window):
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "sf": ..., "detail_file": "BENCH_DETAIL.json"}
and writes the full record (scale probes, spreads, per-probe executor
CPU-seconds) to BENCH_DETAIL.json at the repo root.

Each query is materialized through the noop sink (full compute, no
driver collect) and timed wall-clock. A warmup action runs first so JVM
/ codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_star_join_revenue",
    "q04_topk_per_group",
    "q12_bm25_topk",
    "q16_rrf_fusion",
    "q21_simhash_near_dups",
    "q22_minhash_lsh",
    "q30_knn_cosine",
    "q31_knn_join",
    "q33_knn_pandas_kernel",
    "q51_hourly_rollup",
    "q52_current_state",
    "q54_sessionize",
    "q66_semantic_rerank",
    "q81_structure_blocks",
    "q84_sheet_tables",
    "q94_decontamination",
    "q97_event_pair_rangejoin",
    "q109_clean_corpus_pipeline",
]


TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "embeddings",
)


def _ensure_blowup(spark, sf_dir: str, out_dir: str, factor: int = 10) -> None:
    """Materialize a factor-x documents blowup (cached on disk): each
    copy gets a distinct doc_id band AND per-copy marker tokens woven
    in every 2 tokens, so copies are genuinely distinct documents —
    near-dup miners (SimHash/MinHash shingles) must see a 10x corpus,
    not a corpus where every doc has 9 planted near-duplicates (a
    suffix-only perturbation keeps Jaccard≈1 and makes candidate pairs
    grow quadratically in the copy count, measuring output blowup
    instead of scaling). Every-2 weaving (not every-3) is load-bearing:
    with a marker every 3rd token, 25% of trigram shingles are
    marker-free, cross-copy Jaccard lands at ~0.14, and with 2-row LSH
    bands ~8% of the C(copies,2)-scaled quasi-dup pairs become false
    candidates — measured 2.4M candidates for 26.5k true pairs at 100x,
    quadratic in the copy count. With a marker every 2nd token every
    trigram contains a copy-specific marker, cross-copy Jaccard is 0,
    and candidate growth is linear (within-copy pairs only). All other
    tables symlink to the source sf dir."""
    from pyspark.sql import functions as F

    docs_path = os.path.join(out_dir, "documents.parquet")
    if not os.path.exists(docs_path):
        os.makedirs(out_dir, exist_ok=True)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.selectExpr("max(doc_id) + 1 AS n").head()[0]
        copies = spark.range(factor).withColumnRenamed("id", "copy")
        toks = F.split(F.col("text"), " ")
        marker = lambda i: F.concat(  # noqa: E731 — per-copy, per-slot token
            F.lit("c"), F.col("copy").cast("string"),
            F.lit("m"), i.cast("string"),
        )
        woven = F.array_join(
            F.flatten(
                F.transform(
                    toks,
                    lambda x, i: F.when(
                        (i % 2 == 0) & (F.col("copy") > 0),
                        F.array(marker(i), x),
                    ).otherwise(F.array(x)),
                )
            ),
            " ",
        )
        blown = (
            docs.crossJoin(copies)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * F.lit(n))
            .withColumn("text", woven)
            .drop("copy")
        )
        # Write many files: a single sub-128MB parquet file is ONE scan
        # split, so every probe query would read the whole corpus text on
        # one task (measured: the 100x q22 signature pass spent ~90s in a
        # single-threaded scan+explode). 64 files keeps all 32 cores on
        # the scan, matching how a real warehouse table is laid out.
        blown.repartition(64).write.mode("overwrite").parquet(docs_path)
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        # embeddings blowup for the ANN probes: each copy's vectors get a
        # deterministic per-copy, per-dimension offset then re-normalize,
        # so the 10x index holds genuinely distinct points (a pure copy
        # would give every query 10 coincident neighbors and measure tie
        # handling, not scaling)
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        m = emb.selectExpr("max(vec_id) + 1 AS n").head()[0]
        copies = spark.range(factor).withColumnRenamed("id", "copy")
        jitter = F.transform(
            F.col("embedding"),
            lambda x, i: x
            + F.when(F.col("copy") > 0,
                     ((F.xxhash64(F.col("copy"), i) % 1000) / 5000.0)
                     .cast("float")).otherwise(F.lit(0.0)),
        )
        nrm = F.sqrt(F.aggregate(jitter, F.lit(0.0), lambda a, x: a + x * x))
        blown_e = (
            emb.crossJoin(copies)
            .withColumn("vec_id", F.col("vec_id") + F.col("copy") * F.lit(m))
            .withColumn("embedding",
                        F.transform(jitter, lambda x: (x / nrm).cast("float")))
            .drop("copy")
        )
        # many files for scan parallelism (see the documents write above)
        blown_e.repartition(64).write.mode("overwrite").parquet(emb_path)
    for name in TABLES:
        dst = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{sf_dir}/{name}.parquet", dst)


def _spark_cpu_s() -> float:
    """CPU-seconds consumed so far by every local Spark process: the
    driver-launched JVM (SparkSubmit) plus the pyspark daemon/worker
    fleet — utime+stime of each live process PLUS cutime+cstime so a
    worker that exited between two samples still counts through its
    reaper. This is the 100-TB currency the wall numbers keep hiding
    on this shared VM: host load inflates WALL 2-4x run to run
    (q161@100x: 16.7-43.8 s, identical code, three rounds of verdict
    back-and-forth) — so probes record cpu_s alongside wall. Measured
    caveat (r9 runs A/B): co-tenant contention inflates CPU-time too
    on this box (SMT siblings / frequency throttling: q161@100x burned
    468 vs 1794 cpu_s on identical code), so cpu_s is a BAND narrower
    than wall, not a constant — compare MIN across runs for both. A
    probe during which a worker daemon dies records no cpu_s (the
    /proc delta would go negative; see _timed_probe). Local-mode only
    by construction (on a real cluster read the same number from the
    stage metrics API); /proc scan, no py4j."""
    tck = os.sysconf("SC_CLK_TCK")
    tot = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if (
                b"SparkSubmit" not in cmd
                and b"pyspark.daemon" not in cmd
                and b"pyspark.worker" not in cmd
            ):
                continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            tot += (
                int(parts[11]) + int(parts[12])     # utime + stime
                + int(parts[13]) + int(parts[14])   # reaped children
            ) / tck
        except (OSError, IndexError, ValueError):
            continue
    return tot


def _timed_probe(extras, key, fn, spark, data_dir, samples: int = 2) -> None:
    """Probe runs must never cost the bench its one JSON output line: a
    failure (OOM on an undersized heap, a flaky executor) records -1.0
    for that probe entry and the bench carries on.

    min-of-n samples: host load on this VM is one-sided noise that can
    inflate a single probe 3-12x (measured: probe10x q12 16.5s in the
    r6 driver run vs 1.44s same-code standalone; q152 43.4s in-bench vs
    12.7s standalone) — the MIN of back-to-back runs is the honest
    capability number, and later samples also absorb first-run codegen
    compile. The {key}:spread entry is (max-min)/min, so a reader of
    the JSON alone can see when a probe family was noise-inflated
    instead of concluding the plan is super-linear; a 1s cooldown
    between samples lets a transient host stall drain rather than
    bleed into the next sample."""
    best = worst = best_cpu = None
    for i in range(samples):
        if i:
            time.sleep(1.0)
        c0 = _spark_cpu_s()
        t0 = time.perf_counter()
        try:
            fn(spark, data_dir).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            dc = _spark_cpu_s() - c0
            best = dt if best is None else min(best, dt)
            worst = dt if worst is None else max(worst, dt)
            # a NEGATIVE delta means a worker daemon died mid-probe and
            # its accumulated /proc time vanished with it (the reaper
            # chain only preserves cutime while the reaper lives) —
            # drop the sample rather than record an impossible number
            if dc >= 0:
                best_cpu = dc if best_cpu is None else min(best_cpu, dc)
        except Exception:
            if best is None:
                best = -1.0
            break
        finally:
            _release_checkpoints(spark)
    extras[key] = round(best, 3)
    if worst is not None and best > 0:
        extras[f"{key}:spread"] = round((worst - best) / best, 3)
    if best_cpu is not None and best > 0:
        extras[f"{key}:cpu_s"] = round(best_cpu, 1)


# ANN probe knobs; encoded in the cached artifact names together with a
# format version, so a later round changing the build params or the
# graph/search semantics can NEVER silently time a stale index from a
# previous run (the cache is keyed, not best-effort). v2 = round 8:
# multi-seeded beam search + seeded centroid training sample; v3:
# graph rows carry the build-time entry cover.
HNSW_FMT = "v4"  # v4: IVF probes size n_cells from the corpus
HNSW_SHARDS = 32
# Corpus-sized cells (auto_n_cells): the r8 probes pinned n_cells=32,
# so cell size — and with it per-query probed CPU and per-delta
# rebuild work — grew 10x per decade (hnsw_delta 3.6 -> 6.9 -> 11.2 s
# for the SAME 10-row upsert; VERDICT r8 #1). The target is 2000 rows
# per cell so the sizing BINDS inside the probe corpus band (2k / 20k
# / 200k vectors — production default 25000 would leave every probe
# corpus under the min-cells clamp and measure nothing); what the flat
# 10x -> 100x numbers then certify is the mechanism: cell count grows
# with the corpus, cell size and per-request work do not.
HNSW_TARGET_CELL_ROWS = 2000
HNSW_PROBES = 4


def _hnsw_split_probe(extras, prefix, spark, data_dir, cache_dir=None) -> None:
    """Time HNSW index BUILD and persisted-graph QUERY separately.

    Build: sharded NSW construction over the embeddings at data_dir,
    materialized through noop (what an ingest/finalize pass pays, once
    per corpus). The graph then persists to parquet under cache_dir
    (default: next to the data — cached across bench runs, like the
    blowup itself, keyed by params+format version). Query: beam search
    over the PERSISTED graph — scan + per-shard search + global top-k,
    zero build cost — the per-request wall a serving tier pays.
    Failures record -1.0 like every probe."""
    from memvid_spark.operators.hnsw import build_nsw_index, nsw_knn

    cache_dir = cache_dir or data_dir
    os.makedirs(cache_dir, exist_ok=True)
    emb_path = os.path.join(data_dir, "embeddings.parquet")
    idx_path = os.path.join(
        cache_dir, f"hnsw_index_{HNSW_FMT}_s{HNSW_SHARDS}.parquet"
    )

    def build(spark, d):
        return build_nsw_index(
            spark.read.parquet(emb_path), n_shards=HNSW_SHARDS
        )

    _timed_probe(extras, f"{prefix}:hnsw_build", build, spark, data_dir)
    try:
        if not os.path.exists(idx_path):
            build(spark, data_dir).write.mode("overwrite").parquet(idx_path)
        qvec = (
            spark.read.parquet(emb_path)
            .orderBy("vec_id").select("embedding").head()[0]
        )
    except Exception:
        extras[f"{prefix}:hnsw_query"] = -1.0
        return

    def query(spark, d):
        return nsw_knn(spark.read.parquet(idx_path), qvec, k=10, ef_search=50)

    _timed_probe(extras, f"{prefix}:hnsw_query", query, spark, data_dir)

    # cell-pruned variant (round 7): centroid-sharded graph persisted
    # partitionBy("cell") — the query beam-searches only the 4 nearest
    # cells of 32, and against the hive layout the isin(cells) filter is
    # a planning-time PartitionFilter, so a request reads ~1/8 of the
    # index instead of all of it. THIS is the per-request number a
    # 1000-executor serving tier pays; hnsw_query above is the
    # un-pruned control on the same corpus.
    from memvid_spark.operators.hnsw import (
        auto_n_cells,
        build_nsw_index_ivf,
        nsw_knn_pruned,
        train_cell_centroids,
    )

    try:
        emb = spark.read.parquet(emb_path)
        n_cells = auto_n_cells(
            emb.count(), target_cell_rows=HNSW_TARGET_CELL_ROWS
        )
        key = f"{HNSW_FMT}_t{HNSW_TARGET_CELL_ROWS}_c{n_cells}"
        ivf_path = os.path.join(cache_dir, f"hnsw_ivf_index_{key}.parquet")
        cents_path = os.path.join(
            cache_dir, f"hnsw_ivf_centroids_{key}.json"
        )
        if not os.path.exists(cents_path):
            cents = train_cell_centroids(emb, n_cells=n_cells)
            build_nsw_index_ivf(emb, cents).write.mode(
                "overwrite"
            ).partitionBy("cell").parquet(ivf_path)
            with open(cents_path, "w") as f:
                json.dump([[float(x) for x in c] for c in cents], f)
        with open(cents_path) as f:
            cents = json.load(f)
        extras[f"{prefix}:hnsw_n_cells"] = float(len(cents))
    except Exception:
        extras[f"{prefix}:hnsw_query_pruned"] = -1.0
        return

    def query_pruned(spark, d):
        return nsw_knn_pruned(
            spark.read.parquet(ivf_path), cents, qvec,
            k=10, ef_search=50, probes=HNSW_PROBES,
        )

    _timed_probe(
        extras, f"{prefix}:hnsw_query_pruned", query_pruned, spark, data_dir
    )

    # incremental maintenance (round 8): a 10-row upsert against the
    # persisted IVF graph via sub-shard-granular delta-apply — the
    # per-commit cost of keeping the serving index fresh. Times what a
    # partition-overwrite sink pays: the parts() rebuilt side (cell-
    # complete touched cells — only changed sub-shards re-kernel), NOT
    # keep ∪ rebuilt, whose noop write would add a full passthrough
    # scan of the untouched index. The cache itself is not disturbed.
    from memvid_spark.operators.hnsw import apply_delta_ivf_parts

    def delta(spark, d):
        import pandas as pd

        dim = len(qvec)
        # Arrow-path createDataFrame (pandas input): a plain python-list
        # createDataFrame parallelizes across 32 PYTHON slices and every
        # action on the frame re-pays ~5 cpu_s of worker roundtrips
        # (measured round 10); the Arrow form is one JVM-side batch
        dd = spark.createDataFrame(
            pd.DataFrame(
                {
                    "vec_id": [900_000_000 + i for i in range(10)],
                    "embedding": [
                        [float((i * 7 + j) % 13) for j in range(dim)]
                        for i in range(10)
                    ],
                }
            ),
            "vec_id long, embedding array<double>",
        ).coalesce(1)  # Arrow slices 10 rows into 10 partitions; one
        # python task beats ten (JVM-side narrow coalesce, no shuffle)
        return apply_delta_ivf_parts(
            spark.read.parquet(ivf_path), dd, cents
        )[0]

    _timed_probe(extras, f"{prefix}:hnsw_delta", delta, spark, data_dir)


def _hnsw_scaled_train_probe(extras, prefix, spark, data_dir) -> None:
    """Time the DISTRIBUTED coarse-quantizer trainer (round 10: the
    max_cells=4096 lift) at a raised clamp: n_cells=8192 over this
    corpus forces train_cell_centroids past SCALED_TRAIN_MIN_CELLS, so
    the number records what the per-super-group cogroup path costs —
    driver flops stay O(√k) while the 8192 sub-models train in
    parallel. The model is training-only (nothing cached): the probe
    certifies the TRAINER scales, the serving numbers stay the
    _hnsw_split_probe entries at the auto-sized cell count."""
    import numpy as np

    from memvid_spark.operators.hnsw import train_cell_centroids

    emb_path = os.path.join(data_dir, "embeddings.parquet")

    def train(spark, d):
        emb = spark.read.parquet(emb_path)
        C = train_cell_centroids(emb, n_cells=8192, n_hint=emb.count())
        extras[f"{prefix}:hnsw_train_scaled_cells"] = float(len(C))
        # a 1-row frame so _timed_probe's noop write has a plan to run
        return spark.createDataFrame(
            [(int(np.asarray(C).shape[0]),)], "n int"
        )

    _timed_probe(extras, f"{prefix}:hnsw_train_scaled", train, spark, data_dir)


def _hnsw_frame_probe(extras, prefix, spark, data_dir) -> None:
    """Time coarse ASSIGNMENT against the DataFrame-resident model
    (round 11: CentroidFrame through the serving stack). The model is
    trained once at the raised clamp (8192 cells — past the frame
    engage bound), persisted via save_centroid_frame, and RELOADED from
    parquet before timing, exactly what a serving/ingest pass sees: the
    probe's samples run off the persisted model (a lazy k-row parquet
    read), never the trainer's checkpoint blocks (which _timed_probe's
    checkpoint release would evict between samples). What the number
    certifies: routing the corpus into cells with the model as a
    DataFrame — no O(n_cells·dim) collect or broadcast anywhere in the
    plan — costs about what the broadcast-ndarray assignment does."""
    from memvid_spark.operators.hnsw import (
        assign_cells,
        load_centroid_frame,
        save_centroid_frame,
        train_cell_centroids_frame,
    )

    emb_path = os.path.join(data_dir, "embeddings.parquet")
    model_path = os.path.join(
        data_dir, f"hnsw_frame_model_{HNSW_FMT}_c8192"
    )
    try:
        emb = spark.read.parquet(emb_path)
        n = emb.count()
        if not os.path.exists(os.path.join(model_path, "manifest.json")):
            cf = train_cell_centroids_frame(emb, n_cells=8192, n_hint=n)
            save_centroid_frame(cf, model_path)
        cf = load_centroid_frame(spark, model_path)
        extras[f"{prefix}:hnsw_frame_cells"] = float(cf.n_cells)
    except Exception:
        extras[f"{prefix}:hnsw_frame_assign"] = -1.0
        return

    def assign(spark, d):
        return assign_cells(
            spark.read.parquet(emb_path), cf, n_hint=n
        )

    _timed_probe(extras, f"{prefix}:hnsw_frame_assign", assign, spark, data_dir)

    # query through the frame model: cell-pruned search over a
    # PERSISTED frame-built graph, probing via the exact radius
    # branch-and-bound (round 11) — the per-request wall the serving
    # stack pays when the model is too big to broadcast. The graph
    # builds once and caches like every other ANN probe artifact.
    from memvid_spark.operators.hnsw import (
        build_nsw_index_ivf,
        nsw_knn_pruned,
    )

    idx_path = os.path.join(
        data_dir, f"hnsw_frame_index_{HNSW_FMT}_c8192.parquet"
    )
    try:
        if not os.path.exists(idx_path):
            build_nsw_index_ivf(
                spark.read.parquet(emb_path), cf, n_hint=n
            ).write.mode("overwrite").partitionBy("cell").parquet(idx_path)
        qvec = (
            spark.read.parquet(emb_path)
            .orderBy("vec_id").select("embedding").head()[0]
        )
        # open ONCE like the facade does: an 8192-dir cell layout costs
        # ~16 s of file listing on first plan (measured) — a serving
        # tier pays that at open(), not per request, so the probe must
        # not re-read per sample. (The listing cost itself is the
        # documented metadata residual of cell-partitioned layouts at
        # 10^5+ cells; see SWEEP_r11.)
        idx_df = spark.read.parquet(idx_path)
        idx_df.select("cell").head()  # materialize the file listing
    except Exception:
        extras[f"{prefix}:hnsw_frame_query"] = -1.0
        return

    def query(spark, d):
        return nsw_knn_pruned(
            idx_df, cf, qvec, k=10, ef_search=50, probes=HNSW_PROBES,
        )

    _timed_probe(extras, f"{prefix}:hnsw_frame_query", query, spark, data_dir)

    # round 11 (opt): the same request routed through CellIndexHandle —
    # the serving stack's directory-pruned read. Lists only the probed
    # cells' directories per request (O(probes) driver metadata instead
    # of O(n_cells)); the cold-open decomposition (first-plan listing
    # 22.2 s via the root read vs 5.4 s via the handle at 8192 cells,
    # fresh sessions) lives in scratch/cold_open_probe.py — inside this
    # long-lived bench session the root listing above is already
    # cached, so this entry rows the WARM per-request cost of the
    # handle path for round-over-round comparison.
    from memvid_spark.operators.hnsw import CellIndexHandle

    handle = CellIndexHandle(spark, idx_path)

    def query_handle(spark, d):
        return nsw_knn_pruned(
            handle, cf, qvec, k=10, ef_search=50, probes=HNSW_PROBES,
        )

    _timed_probe(
        extras, f"{prefix}:hnsw_frame_query_handle", query_handle, spark,
        data_dir,
    )


def _timed_median(run, spark, n: int = 3) -> float:
    """Median-of-n wall time with checkpoint release between samples —
    the same treatment the headline gets. Single samples on this VM
    swing ±30% (SWEEP_r04) and late-session samples read 1.1-3.5×
    hot (SWEEP_r05 aging table); the median of three back-to-back runs
    is reproducible enough to compare round over round."""
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
        _release_checkpoints(spark)
    return round(sorted(samples)[n // 2], 3)


def _release_checkpoints(spark) -> None:
    """Unpersist every pinned RDD (localCheckpoint blocks) between
    queries: checkpoint storage is NOT LRU-evictable, so 40+ queries of
    accumulated checkpoints shrink execution memory and the tail of the
    bench pays in spills (measured: the 10x q22 probe ran 3.4x slower
    at the end of a full bench than standalone). A long-lived service
    does the same after each request."""
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from memvid_spark.session import get_spark
    from memvid_spark import registry

    spark = get_spark("memvid-spark-bench")
    qs = {s.name: s.fn for s in registry.SPECS}

    # warmup: JVM, codegen, parquet footer reads
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # Pre-warm the Python worker fleet: the first 32-task Arrow stage in
    # a session pays a per-worker interpreter + pandas/pyspark import
    # storm (~8-10 s wall) that a long-running executor pays exactly
    # once. Run one trivial mapInPandas over every core so the timed
    # numbers below measure steady-state compute, not daemon spin-up.
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()

    # median-of-3 per headline query: single-sample wall times on this
    # VM swing ±30% run to run (SWEEP_r04), which masks real
    # regressions; the median of three back-to-back runs is stable
    # enough to compare round over round
    times: dict[str, float] = {}
    cpu_times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        samples = []
        cpus = []
        for _ in range(3):
            c0 = _spark_cpu_s()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            cpus.append(_spark_cpu_s() - c0)
            _release_checkpoints(spark)
        times[name] = round(sorted(samples)[1], 3)
        # min across samples: CPU is stable under host load (the point
        # of recording it); the first sample can carry one-time codegen.
        # NEGATIVE deltas (a worker daemon died mid-sample and took its
        # /proc-accumulated time with it) are dropped, mirroring
        # _timed_probe — a query whose every sample died records no
        # cpu_s rather than an impossible number
        valid_cpus = [c for c in cpus if c >= 0]
        if valid_cpus:
            cpu_times[name] = round(min(valid_cpus), 1)

    total = round(sum(times.values()), 3)
    total_cpu = round(sum(cpu_times.values()), 1)

    # bench-only extras (kept OUT of the headline set/total so
    # round-over-round comparison of the 19 stays apples-to-apples),
    # median-of-3 like the headline:
    # - ANN wall-time entries (index build + search included)
    # - multimodal codec throughput (real encode+decode of PNG pixels /
    #   PCM samples / MP4 demux / JPEG entropy decode per doc)
    # - cluster-level dedup tier (SemDeDup, window-hash passage dedup,
    #   fingerprint-CC survivor pick, DSIR importance weights)
    # - round-4 quality tier (bigram-LM perplexity, NB classifier)
    # - round-5 sketch track (entry generation + query-sketch scoring)
    extras: dict[str, float] = {}
    for name in (
        "q34_pq_recall", "q35_ivf_knn",
        "q168_sq8_knn", "q175_ivfpq",
        "q121_image_features", "q124_audio_features",
        "q126_video_manifest", "q128_jpeg_pixels",
        "q163_flac_roundtrip", "q166_tiff_pixels", "q172_tar_ingest",
        "q173_pdf_table_extract",
        "q144_semdedup", "q179_semdedup_autok",
        "q184_semdedup_scaled_agreement", "q145_passage_dedup",
        "q146_dedup_survivors", "q147_dsir_weights",
        "q148_shard_assign", "q149_length_quantiles",
        "q150_mojibake_repair", "q151_xls_extract", "q152_heavy_hitters",
        "q156_budget_select", "q157_stratified_sample",
        "q158_lm_perplexity", "q161_quality_classifier",
        "q176_sketch_entries", "q177_sketch_candidates",
        "q183_streaming_ann_maintenance",
        "q185_hnsw_scaled_train", "q186_crossmodal_ann_route",
        "q187_hnsw_centroid_frame",
    ):
        fn = qs[name]
        extras[name] = _timed_median(
            lambda: fn(spark, sf_dir).write.mode("overwrite")
            .format("noop").save(),
            spark,
        )

    # batch-model embedding path (src/text_embed.rs batch loop): real
    # mapInPandas plumbing; the encoder is sentence-transformers when
    # installed, else the deterministic projection stand-in
    from memvid_spark.functions.embed import (
        BatchModelEmbedder,
        projection_model_factory,
    )

    emb = BatchModelEmbedder(
        dim=384,
        model_factory=None if BatchModelEmbedder.available()
        else projection_model_factory(384),
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extras["batch_embed_docs"] = _timed_median(
        lambda: emb.embed_df(docs).write.mode("overwrite")
        .format("noop").save(),
        spark,
    )

    # HNSW build/query split at BASE scale (round 8, VERDICT r7 #5):
    # this replaces the retired q115 extras entry, whose single number
    # folded index construction AND brute-force ground truth into every
    # sample. The registry keeps q115 for the recall pin; the bench
    # reports what a store actually pays — construction once
    # (base:hnsw_build) and the per-request beam search against the
    # persisted graph (base:hnsw_query / base:hnsw_query_pruned).
    base_ann_cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scratch", "base_ann"
    )
    _hnsw_split_probe(extras, "base", spark, sf_dir, cache_dir=base_ann_cache)

    # ---- 10x scale probe (the 100-TB-posture empirical check) ----------
    # The 5 most expensive headline queries re-run once against a 10x
    # blowup of documents (text perturbed per copy so the corpus is not
    # just duplicates). Wall-times land in extras as probe10x:* — at
    # sf0.1 every query is scheduling-floor-bound, so sub-10x growth
    # here is the evidence the plans scale with data, not with overhead.
    probe_queries = [
        "q12_bm25_topk",
        "q21_simhash_near_dups",
        "q22_minhash_lsh",
        "q66_semantic_rerank",
        "q145_passage_dedup",
        "q152_heavy_hitters",
        "q109_clean_corpus_pipeline",
        "q158_lm_perplexity",
        "q161_quality_classifier",
        # ANN family: codebook/centroid training is bounded-sample, the
        # scans are probe-only — the 10x wall should grow well under 10x
        # (the NSW tier's honest numbers are the _hnsw_split_probe
        # entries; conflated q115 retired from the bench in round 8)
        "q34_pq_recall",
        "q35_ivf_knn",
        # auto-k SemDeDup: k = ceil(n/256) crosses into the two-level
        # matmul band at this scale — the probe that shows cluster size
        # stays bounded when k scales with the corpus
        "q179_semdedup_autok",
        # ingest tier (the one family with no scale probe until r7):
        # synthesize-and-parse mapInPandas byte kernels — XLSX sheet
        # detection + type vote, PDF positional table extraction, WARC
        # strict-framing parse. Embarrassingly parallel per document;
        # the probe shows wall growth tracks document COUNT with no
        # driver bottleneck (payload bytes never visit the driver)
        "q84_sheet_tables",
        "q135_warc_records",
        "q173_pdf_table_extract",
    ]
    probe_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scratch", "probe10x"
    )
    # Probes run in a FRESH session: ~70 queries of session aging
    # inflate probe samples 1.1-3.5× (worst for Arrow/Python-worker
    # paths — SWEEP_r05 aging table measured it; r5's batch_embed
    # "+249% regression" was exactly this artifact). Restarting the JVM
    # costs ~15 s once and makes the growth factors comparable to the
    # standalone runs the scale claims are judged against.
    spark.stop()
    spark = get_spark("memvid-spark-bench-probes")
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    _ensure_blowup(spark, sf_dir, probe_dir, factor=10)
    extras["probe10x_factor"] = 10.0
    # NO base-scale warmup of probe plans — this was tried both ways in
    # round 7 (four committed runs, scratch/bench_r07{a..d}.out) and
    # warming measurably POISONS the checkpoint-heavy probes: with
    # warmup (runs c/d) q22/q66/q145 read 29-79 s at 10x in BOTH
    # samples, vs a mutually-consistent ~2-5 s in both no-warmup runs
    # (a/b); warming any single query standalone costs nothing, so the
    # interaction is cumulative session state (checkpoint/broadcast
    # churn), not the plan. The converse artifact — a probe's first
    # sample carrying one-time codegen compile in this fresh JVM — is
    # bounded (~2-25 s once) and already visible as that entry's
    # :spread; min-of-2 keeps it out of the recorded number unless the
    # host window is ALSO loaded, which no fixed sample count fixes.
    for name in probe_queries:
        _timed_probe(extras, f"probe10x:{name}", qs[name], spark, probe_dir)

    # HNSW build/query split (probe framing, VERDICT r6): q115's single
    # number folds index CONSTRUCTION and the exact-ground-truth brute
    # force into every sample, so its 100x wall reads as "queries got
    # 32x slower" when a store builds once and serves many. Here the
    # sharded graph is built (timed), persisted to parquet — the store
    # layout — and the query probe beam-searches the persisted graph
    # only: the number a serving tier actually pays per request.
    _hnsw_split_probe(extras, "probe10x", spark, probe_dir)

    # ---- 100x scale probe (one decade further than probe10x) -----------
    # The 5 heaviest linear-claimed queries against a 100x doc blowup:
    # sub-100x growth with no OOM is the evidence the 10x linearity
    # extrapolates another decade (measured full set: q22 58x, q145
    # 46x, q66 81x, q161 87x, q158 55x — SWEEP_r05). The section is
    # TIME-BUDGETED so a slow VM can't starve the rest of the bench of
    # its one JSON output line: queries run most-diagnostic-first and
    # stop once the budget is spent (blowup generation counts; it is
    # disk-cached after the first run). SPARK_GRAFT_PROBE100X=0
    # disables; SPARK_GRAFT_PROBE100X_BUDGET tunes (seconds).
    if os.environ.get("SPARK_GRAFT_PROBE100X", "1") != "0":
        # 1800s: the r6 1300s budget plus headroom for the r7 additions
        # (WARC ingest rep + the HNSW build/query split probes)
        budget = float(os.environ.get("SPARK_GRAFT_PROBE100X_BUDGET", "1800"))
        probe100_queries = [
            # q66 first: cheap since the hit-list prune (~8x at 100x, was
            # 81x) and the most diagnostic single number in the section
            "q66_semantic_rerank",
            "q22_minhash_lsh",
            "q161_quality_classifier",
            "q145_passage_dedup",
            "q158_lm_perplexity",
            # round 6: two more families under the 100x lens — the
            # connected-components survivor pass and token-level SimHash
            # (whose TRUE output grows superlinearly on the blowup: same-
            # doc cross-copy pairs share all word tokens, so near-dup
            # pairs are ~4x the linear extrapolation — that is answer
            # growth, not candidate blowup; r6 standalone: 126s / 63s)
            "q146_dedup_survivors",
            "q21_simhash_near_dups",
            # the composed end-to-end corpus-cleaning pipeline (gates ->
            # exact dedup -> decontamination -> split): the most
            # user-shaped single number (r6 standalone: 73s = 33x)
            "q109_clean_corpus_pipeline",
            # the ANN scale path: coarse cells -> residual ADC shortlist
            # -> exact refine (r6 standalone: 18.3s = ~6x on 100x vectors)
            "q175_ivfpq",
            # round 7: auto-k SemDeDup — fixed-k q144 grew ~65x at 100x
            # (the last linear-band family, VERDICT r6); k = ceil(n/256)
            # bounds per-cluster work by design, this entry is the proof
            "q179_semdedup_autok",
            # ingest-tier representative at a full 100x of document
            # count: WARC synthesize+strict-parse is pure per-document
            # byte work, so ~linear growth here certifies the whole
            # mapInPandas ingest family (XLSX/PDF share the pattern)
            "q135_warc_records",
        ]
        probe100_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scratch", "probe100x"
        )
        section0 = time.perf_counter()
        _ensure_blowup(spark, sf_dir, probe100_dir, factor=100)
        extras["probe100x_factor"] = 100.0
        for name in probe100_queries:
            if time.perf_counter() - section0 > budget:
                extras["probe100x_budget_hit"] = 1.0
                break
            _timed_probe(
                extras, f"probe100x:{name}", qs[name], spark, probe100_dir
            )
        # HNSW split at 100x vectors: the build-once / query-many
        # decomposition of q115's 100x wall (see the 10x section)
        if time.perf_counter() - section0 <= budget:
            _hnsw_split_probe(extras, "probe100x", spark, probe100_dir)
            # round 10: the distributed coarse-trainer at a raised
            # clamp (8192 cells > SCALED_TRAIN_MIN_CELLS) over the
            # 200k-vector corpus — the trained-distributed path's cost
            _hnsw_scaled_train_probe(extras, "probe100x", spark, probe100_dir)
            # round 11: assignment against the persisted DataFrame-
            # resident model at the same raised clamp — the serving
            # stack's frame path rowed at 100x vectors
            _hnsw_frame_probe(extras, "probe100x", spark, probe100_dir)
        else:
            extras["probe100x_budget_hit"] = 1.0

    # Output discipline (VERDICT r8 #2): the driver captures only a
    # TAIL of stdout and parses the last JSON line — r5-r8's single
    # line (headline + ~120 extras entries) outgrew that window and
    # every BENCH_r{N}.json landed "parsed": null. The LAST line is
    # now the compact contract object (headline + per-query medians,
    # well under the tail window); the full per-probe detail (extras:
    # scale probes, spreads, cpu_s) goes to BENCH_DETAIL.json next to
    # this script and is committed with the round's evidence.
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "cpu_s": total_cpu,
                "queries": times,
                "queries_cpu_s": cpu_times,
                "extras": extras,
                "sf": sf,
                "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
            },
            f,
            indent=1,
        )
        f.write("\n")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "cpu_s": total_cpu,
                "queries": times,
                "sf": sf,
                "detail_file": "BENCH_DETAIL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
