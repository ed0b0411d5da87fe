import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.operators import pq
from memvid_spark.operators.knn import knn
from memvid_spark import catalog

spark = get_spark("profile-q34")
t = catalog.load(spark, "scratch/probe10x")
emb = t.embeddings

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s", flush=True)
    return r

qvec = [float(x) for x in emb.filter(F.col("vec_id") == 1).head().embedding]
for rnd in range(2):
    model = timed(f"train_r{rnd}", lambda: pq.train_pq(emb, n_sub=8, k=64))
    codes = pq.encode(model, emb)
    timed(f"encode_count_r{rnd}", lambda: codes.count())
    timed(f"adc_r{rnd}", lambda: pq.adc_topk(model, codes, qvec, 10).collect())
    timed(f"exact_r{rnd}", lambda: knn(emb, qvec, 10, metric="l2").collect())
spark.stop()
