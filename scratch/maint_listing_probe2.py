"""Break down the full-read cost over the 8192-cell index: reader
construction (listing/file-index) vs action, split count, and the
effect of split packing (openCostInBytes) and the partition-discovery
job. Fresh session."""

import sys
import time

sys.path.insert(0, "/root/repo")

IDX = "/root/repo/scratch/probe100x/hnsw_frame_index_v4_c8192.parquet"

from memvid_spark.session import get_spark  # noqa: E402

spark = get_spark("maint-breakdown")
spark.read.parquet(
    "/root/repo/scratch/probe100x/orders.parquet"
).count()

for label, conf in [
    ("default", {}),
    ("opencost0", {"spark.sql.files.openCostInBytes": "0"}),
    ("maxpb1g+opencost4k", {
        "spark.sql.files.maxPartitionBytes": "1g",
        "spark.sql.files.openCostInBytes": "4096",
    }),
]:
    for k, v in conf.items():
        spark.conf.set(k, v)
    t0 = time.perf_counter()
    df = spark.read.parquet(IDX)
    t1 = time.perf_counter()
    nparts = df.rdd.getNumPartitions()
    t2 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t3 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t4 = time.perf_counter()
    print(
        f"{label:20s} construct={t1-t0:6.2f}s splits={nparts:5d} "
        f"(getNumPartitions={t2-t1:5.2f}s) noop1={t3-t2:6.2f}s "
        f"noop2={t4-t3:6.2f}s",
        flush=True,
    )
    for k in conf:
        spark.conf.unset(k)
spark.stop()
