import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("probe-conv")

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

N = 8_000_000
par = spark.range(0, N, 1, 32).select(F.col("id").cast("string").alias("s"))
timed("md5_substr_32t", lambda: par.select(F.count(F.substring(F.md5("s"), 1, 15))).head()[0])
timed("conv_32t", lambda: par.select(F.sum(F.conv(F.substring(F.md5("s"), 1, 15), 16, 10).cast("long"))).head()[0])
