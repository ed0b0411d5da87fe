"""Profile apply_delta_ivf_parts orchestration at base scale (sf0.1
embeddings, the bench hnsw_delta probe's exact shape): wall, cpu_s,
and SPARK JOB COUNT per delta — the r9 verdict's 'fixed ~15-job
orchestration constant'."""
import os, sys, time

sys.path.insert(0, "/root/repo")
from bench import _spark_cpu_s, _release_checkpoints, HNSW_TARGET_CELL_ROWS
from memvid_spark.session import get_spark
from memvid_spark.operators.hnsw import (
    apply_delta_ivf_parts, auto_n_cells, build_nsw_index_ivf,
    train_cell_centroids,
)

spark = get_spark("delta-prof")
sf_dir = "/root/testdata/sf0.1"
emb_path = f"{sf_dir}/embeddings.parquet"
cache = "/root/repo/scratch/base_ann"
emb = spark.read.parquet(emb_path)
n = emb.count()
n_cells = auto_n_cells(n, target_cell_rows=HNSW_TARGET_CELL_ROWS)
key = f"v4_t{HNSW_TARGET_CELL_ROWS}_c{n_cells}"
ivf_path = os.path.join(cache, f"hnsw_ivf_index_{key}.parquet")
cents_path = os.path.join(cache, f"hnsw_ivf_centroids_{key}.json")
import json
if not os.path.exists(cents_path):
    cents = train_cell_centroids(emb, n_cells=n_cells)
    build_nsw_index_ivf(emb, cents).write.mode("overwrite").partitionBy(
        "cell").parquet(ivf_path)
    with open(cents_path, "w") as f:
        json.dump([[float(x) for x in c] for c in cents], f)
with open(cents_path) as f:
    cents = json.load(f)
qvec = emb.orderBy("vec_id").select("embedding").head()[0]
dim = len(qvec)

# warm workers
spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

tracker = spark.sparkContext._jsc.sc().statusTracker()

def delta_once():
    import pandas as pd
    dd = spark.createDataFrame(pd.DataFrame({
        "vec_id": [900_000_000 + i for i in range(10)],
        "embedding": [[float((i * 7 + j) % 13) for j in range(dim)] for i in range(10)],
    }), "vec_id long, embedding array<double>").coalesce(1)
    return apply_delta_ivf_parts(spark.read.parquet(ivf_path), dd, cents)[0]

for s in range(4):
    j0 = len(tracker.getJobIdsForGroup(None))
    c0 = _spark_cpu_s(); t0 = time.perf_counter()
    delta_once().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0; dc = _spark_cpu_s() - c0
    j1 = len(tracker.getJobIdsForGroup(None))
    print(f"sample {s}: wall={dt:.2f}s cpu={dc:.1f}s jobs={j1-j0}", flush=True)
    _release_checkpoints(spark)
spark.stop()
