"""Cold-open serving probe: time the FIRST cell-pruned query against the
persisted 8192-cell frame-built index in a FRESH session.

mode=df     : the r10 path — spark.read.parquet(root), isin-pruned
              (pays the full 8192-directory listing on first plan)
mode=handle : the round-11 CellIndexHandle — lists only probed dirs

Run each mode in its own process so the FileStatusCache is cold.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

MODE = sys.argv[1] if len(sys.argv) > 1 else "handle"
DATA = "/root/repo/scratch/probe100x"
IDX = f"{DATA}/hnsw_frame_index_v4_c8192.parquet"
MODEL = f"{DATA}/hnsw_frame_model_v4_c8192"

from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark.operators.hnsw import (  # noqa: E402
    CellIndexHandle,
    load_centroid_frame,
    nsw_knn_pruned,
)

spark = get_spark(f"cold-open-{MODE}")
# warm the JVM + python workers on an unrelated table so the timed
# number is listing+query, not session spin-up
spark.read.parquet(f"{DATA}/orders.parquet").count()
cf = load_centroid_frame(spark, MODEL)
qvec = (
    spark.read.parquet(f"{DATA}/embeddings.parquet")
    .orderBy("vec_id").select("embedding").head()[0]
)

t0 = time.perf_counter()
if MODE == "df":
    idx = spark.read.parquet(IDX)
else:
    idx = CellIndexHandle(spark, IDX)
nsw_knn_pruned(idx, cf, qvec, k=10, ef_search=50, probes=4).write.mode(
    "overwrite"
).format("noop").save()
t1 = time.perf_counter()
# second request (warm cache within the session)
nsw_knn_pruned(idx, cf, qvec, k=10, ef_search=50, probes=4).write.mode(
    "overwrite"
).format("noop").save()
t2 = time.perf_counter()
print(f"MODE={MODE} first_query={t1 - t0:.2f}s second_query={t2 - t1:.2f}s",
      flush=True)
spark.stop()
