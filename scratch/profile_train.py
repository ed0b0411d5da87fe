import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark import catalog
from memvid_spark.functions.vector import lloyd_kmeans

spark = get_spark("profile-train")
t = catalog.load(spark, "scratch/probe10x")
emb = t.embeddings

t0=time.perf_counter()
dim = len(emb.select("embedding").head()[0])
print(f"head_dim: {time.perf_counter()-t0:.1f}s dim={dim}", flush=True)

t0=time.perf_counter()
rows = emb.select(F.col("embedding").cast("array<double>").alias("v")).limit(65536).collect()
print(f"collect: {time.perf_counter()-t0:.1f}s n={len(rows)}", flush=True)

t0=time.perf_counter()
X = np.asarray([r.v for r in rows], dtype="float64")
print(f"to_numpy: {time.perf_counter()-t0:.1f}s shape={X.shape}", flush=True)

t0=time.perf_counter()
for s in range(8):
    sub = X[:, s*2:(s+1)*2]
    lloyd_kmeans(sub, 64, seed=42+s, max_iter=10)
print(f"kmeans8: {time.perf_counter()-t0:.1f}s", flush=True)
spark.stop()
