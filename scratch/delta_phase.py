import os, sys, time, json
sys.path.insert(0, "/root/repo")
from bench import _spark_cpu_s, _release_checkpoints, HNSW_TARGET_CELL_ROWS
from memvid_spark.session import get_spark
from memvid_spark.operators.hnsw import auto_n_cells
from pyspark.sql import functions as F

spark = get_spark("delta-phase")
sf_dir = "/root/testdata/sf0.1"
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
n = emb.count()
n_cells = auto_n_cells(n, target_cell_rows=HNSW_TARGET_CELL_ROWS)
key = f"v4_t{HNSW_TARGET_CELL_ROWS}_c{n_cells}"
ivf_path = f"/root/repo/scratch/base_ann/hnsw_ivf_index_{key}.parquet"
with open(f"/root/repo/scratch/base_ann/hnsw_ivf_centroids_{key}.json") as f:
    cents = json.load(f)
qvec = emb.orderBy("vec_id").select("embedding").head()[0]
dim = len(qvec)
spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()

import memvid_spark.operators.hnsw as H

def phase(label, f):
    c0 = _spark_cpu_s(); t0 = time.perf_counter()
    r = f()
    print(f"  {label}: wall={time.perf_counter()-t0:.2f} cpu={_spark_cpu_s()-c0:.1f}", flush=True)
    return r

for s in range(2):
    print(f"run {s}:", flush=True)
    rows = [(900_000_000 + i, [float((i * 7 + j) % 13) for j in range(dim)]) for i in range(10)]
    dd = spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(1)
    index = spark.read.parquet(ivf_path)
    index = phase("ensure_entry(noop)", lambda: H._ensure_entry(index))
    new_assigned = phase("assign+ckpt", lambda: H._with_cell(dd, cents, "vec_id", "embedding").localCheckpoint())
    new_ids = new_assigned.select("vec_id").distinct()
    gone_ids = new_ids.distinct()
    both = phase("corpus agg", lambda: index.join(F.broadcast(gone_ids.withColumn("_g", F.lit(1))), "vec_id", "left").groupBy("cell").agg(F.count("*").alias("c"), F.sum(F.coalesce(F.col("_g"), F.lit(0))).alias("g"), F.max("vec_id").alias("mx")).collect())
    adds = phase("add agg", lambda: new_assigned.groupBy("cell").agg(F.count("*").alias("c"), F.min("vec_id").alias("mn")).collect())
    touched = sorted({int(r["cell"]) for r in adds})
    touched_rows = phase("touched_rows ckpt", lambda: index.filter(F.col("cell").isin(touched)).localCheckpoint())
    elig = {c: 1 for c in touched}
    probe_df = spark.createDataFrame(sorted(elig.items()), "cell int, nsubs int")
    phase("regime probe", lambda: touched_rows.join(F.broadcast(probe_df), "cell").filter(F.col("shard") != (F.col("cell").cast("long") * F.lit(1024) + F.pmod(F.hash(F.col("vec_id")), F.col("nsubs"))).cast("int")).select("cell").distinct().collect())
    # full parts call end-to-end for the remainder
    out = phase("full parts+write", lambda: H.apply_delta_ivf_parts(spark.read.parquet(ivf_path), dd, cents)[0].write.mode("overwrite").format("noop").save())
    _release_checkpoints(spark)
spark.stop()
