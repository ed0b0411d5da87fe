"""Round-11 item 3: count Spark JOBS + cpu_s of one 10-row hnsw_delta
against the sf0.1 IVF index (the bench probe's exact shape), before/
after the planning fold. Run standalone (quiet window, no other Spark
session)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CACHE = DATA


def cpu_s():
    total = 0.0
    hz = os.sysconf("SC_CLK_TCK")
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace")
            if not ("SparkSubmit" in cmd or "pyspark.daemon" in cmd
                    or "pyspark.worker" in cmd):
                continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])
                      + int(parts[13]) + int(parts[14])) / hz
        except Exception:
            continue
    return total


def main():
    from memvid_spark.operators.hnsw import (
        apply_delta_ivf_parts,
        auto_n_cells,
    )

    spark = get_spark("delta-jobs")
    sc = spark.sparkContext
    emb_path = os.path.join(DATA, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    n_cells = auto_n_cells(emb.count(), target_cell_rows=2000)
    key = f"v4_t2000_c{n_cells}"
    ivf_path = os.path.join(CACHE, f"hnsw_ivf_index_{key}.parquet")
    cents_path = os.path.join(CACHE, f"hnsw_ivf_centroids_{key}.json")
    if not os.path.exists(cents_path):
        from memvid_spark.operators.hnsw import (
            build_nsw_index_ivf,
            train_cell_centroids,
        )
        cents = train_cell_centroids(emb, n_cells=n_cells)
        build_nsw_index_ivf(emb, cents).write.mode("overwrite").partitionBy(
            "cell").parquet(ivf_path)
        with open(cents_path, "w") as f:
            json.dump([[float(x) for x in c] for c in cents], f)
    with open(cents_path) as f:
        cents = json.load(f)
    dim = len(cents[0])

    import pandas as pd

    def one_delta(tag):
        dd = spark.createDataFrame(
            pd.DataFrame({
                "vec_id": [900_000_000 + i for i in range(10)],
                "embedding": [
                    [float((i * 7 + j) % 13) for j in range(dim)]
                    for i in range(10)
                ],
            }),
            "vec_id long, embedding array<double>",
        ).coalesce(1)
        sc.setJobGroup(tag, tag)
        t0, c0 = time.time(), cpu_s()
        rebuilt, touched, built = apply_delta_ivf_parts(
            spark.read.parquet(ivf_path), dd, cents, n_hint=10
        )
        rebuilt.write.format("noop").mode("overwrite").save()
        wall, dc = time.time() - t0, cpu_s() - c0
        jobs = sc.statusTracker().getJobIdsForGroup(tag)
        sc.setJobGroup("", "")
        return len(jobs), wall, dc

    # warm the worker fleet once (python import storm) then measure
    one_delta("warm")
    for i in range(3):
        j, w, c = one_delta(f"m{i}")
        print(json.dumps({"run": i, "jobs": j, "wall_s": round(w, 2),
                          "cpu_s": round(c, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
