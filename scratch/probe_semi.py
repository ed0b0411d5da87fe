import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.operators import dedup
from memvid_spark import catalog

spark = get_spark("probe-semi")
t = catalog.load(spark, "scratch/probe100x")
docs = t.documents

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

# fixed fake candidate ids: every 75th doc (~80k of 6M)
ids = spark.range(0, 6_000_000, 75).withColumnRenamed("id", "doc_id")
timed("docs_count", lambda: docs.count())
timed("semi_count", lambda: docs.join(F.broadcast(ids), "doc_id", "semi").count())
sh = dedup.shingles(docs.join(F.broadcast(ids), "doc_id", "semi"))
timed("semi_shingle_count", lambda: sh.count())
timed("semi_shingle_checkpoint", lambda: sh.localCheckpoint())
