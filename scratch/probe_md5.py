import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("probe-md5")

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

N = 8_000_000
one = spark.range(0, N, 1, 1).select(F.col("id").cast("string").alias("s"))
timed("md5_1thread", lambda: one.select(F.count(F.md5("s"))).head()[0])
par = spark.range(0, N, 1, 32).select(F.col("id").cast("string").alias("s"))
timed("md5_32threads", lambda: par.select(F.count(F.md5("s"))).head()[0])
timed("xxhash_32threads", lambda: par.select(F.count(F.xxhash64("s"))).head()[0])
timed("crc32_32threads", lambda: par.select(F.count(F.crc32("s"))).head()[0])
timed("sha1_32threads", lambda: par.select(F.count(F.sha1("s"))).head()[0])
