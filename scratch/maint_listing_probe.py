"""Maintenance-path listing probe (round 11, 'Not yet optimized' #2).

Doctor/retrain/stats read the FULL cell-partitioned index. Question:
would an Iceberg-style manifest (cell -> leaf files, known at write
time) actually remove the O(n_cells) driver listing bound in pure
PySpark, where readers can only hand Spark a path list?

mode=root  : spark.read.parquet(root) — full directory discovery
mode=files : simulate the manifest: leaf files enumerated OUTSIDE
             Spark (os.scandir, stands in for reading a manifest
             file), then spark.read.option(basePath).parquet(*files)
mode=count : like root, but .count() instead of noop (what stats pays)

Run each mode in its own process so the FileStatusCache is cold.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "root"
IDX = "/root/repo/scratch/probe100x/hnsw_frame_index_v4_c8192.parquet"

from memvid_spark.session import get_spark  # noqa: E402

spark = get_spark(f"maint-listing-{MODE}")
spark.read.parquet(
    "/root/repo/scratch/probe100x/orders.parquet"
).count()  # warm JVM

t_list = 0.0
t0 = time.perf_counter()
if MODE == "files":
    ts = time.perf_counter()
    files = []
    with os.scandir(IDX) as it:
        for d in it:
            if d.is_dir() and d.name.startswith("cell="):
                with os.scandir(d.path) as it2:
                    files.extend(
                        f.path for f in it2
                        if f.name.endswith(".parquet")
                    )
    t_list = time.perf_counter() - ts
    df = spark.read.option("basePath", IDX).parquet(*files)
else:
    df = spark.read.parquet(IDX)
if MODE == "count":
    n = df.count()
else:
    df.write.mode("overwrite").format("noop").save()
    n = -1
t1 = time.perf_counter()
# second full read, warm FileStatusCache within the session
df2 = (
    spark.read.option("basePath", IDX).parquet(*files)
    if MODE == "files" else spark.read.parquet(IDX)
)
df2.write.mode("overwrite").format("noop").save()
t2 = time.perf_counter()
print(
    f"MODE={MODE} enumerate={t_list:.2f}s first_full={t1 - t0:.2f}s "
    f"second_full={t2 - t1:.2f}s rows={n}",
    flush=True,
)
spark.stop()
