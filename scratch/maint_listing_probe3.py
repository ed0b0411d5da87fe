"""Is the 14 s file-index construct the parallel-partition-discovery
JOB (one tiny task per directory)? Raise the threshold to force
driver-side sequential listing and compare. Fresh session per mode."""

import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1]  # "job" (default discovery) | "driver" (sequential)
IDX = "/root/repo/scratch/probe100x/hnsw_frame_index_v4_c8192.parquet"

from memvid_spark.session import get_spark  # noqa: E402

spark = get_spark(f"maint-disc-{MODE}")
if MODE == "driver":
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "1000000"
    )
spark.read.parquet(
    "/root/repo/scratch/probe100x/orders.parquet"
).count()

for i in range(3):
    t0 = time.perf_counter()
    df = spark.read.parquet(IDX)
    t1 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t2 = time.perf_counter()
    print(
        f"MODE={MODE} iter={i} construct={t1-t0:6.2f}s noop={t2-t1:6.2f}s",
        flush=True,
    )
spark.stop()
