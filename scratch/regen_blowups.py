import sys, time
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
import bench

spark = get_spark("regen-blowups")
t0 = time.perf_counter()
bench._ensure_blowup(spark, "/root/testdata/sf0.1", "/root/repo/scratch/probe10x", factor=10)
print(f"10x: {time.perf_counter()-t0:.0f}s", flush=True)
t0 = time.perf_counter()
bench._ensure_blowup(spark, "/root/testdata/sf0.1", "/root/repo/scratch/probe100x", factor=100)
print(f"100x: {time.perf_counter()-t0:.0f}s", flush=True)
spark.stop()
