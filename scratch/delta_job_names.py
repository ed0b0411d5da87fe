import json, os, sys, time
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark

DATA = "/root/testdata/sf0.1"
spark = get_spark("delta-jobs2")
sc = spark.sparkContext
from memvid_spark.operators.hnsw import apply_delta_ivf_parts, auto_n_cells
emb = spark.read.parquet(os.path.join(DATA, "embeddings.parquet"))
n_cells = auto_n_cells(emb.count(), target_cell_rows=2000)
key = f"v4_t2000_c{n_cells}"
ivf_path = os.path.join(DATA, f"hnsw_ivf_index_{key}.parquet")
with open(os.path.join(DATA, f"hnsw_ivf_centroids_{key}.json")) as f:
    cents = json.load(f)
dim = len(cents[0])
import pandas as pd
def mk():
    return spark.createDataFrame(
        pd.DataFrame({
            "vec_id": [900_000_000 + i for i in range(10)],
            "embedding": [[float((i*7+j) % 13) for j in range(dim)] for i in range(10)],
        }), "vec_id long, embedding array<double>").coalesce(1)
# warm
r, _, _ = apply_delta_ivf_parts(spark.read.parquet(ivf_path), mk(), cents, n_hint=10)
r.write.format("noop").mode("overwrite").save()
sc.setJobGroup("m", "m")
r, _, _ = apply_delta_ivf_parts(spark.read.parquet(ivf_path), mk(), cents, n_hint=10)
r.write.format("noop").mode("overwrite").save()
st = sc.statusTracker()
for jid in sorted(st.getJobIdsForGroup("m")):
    info = st.getJobInfo(jid)
    stages = info.stageIds if info else []
    descs = []
    for sid in stages:
        si = st.getStageInfo(sid)
        if si:
            descs.append(f"{si.name}(tasks={si.numTasks})")
    print(jid, " | ".join(descs))
spark.stop()
