"""Decompose headline per-sample wall: catalog/table load (py4j +
parquet footer), DataFrame construction, and execution (noop action).

Run in a quiet window. Prints per-query breakdown over 3 samples.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from memvid_spark.session import get_spark
from memvid_spark import registry

QUERIES = [
    "q51_hourly_rollup", "q04_topk_per_group", "q52_current_state",
    "q54_sessionize", "q33_knn_pandas_kernel", "q97_event_pair_rangejoin",
    "q01_pricing_summary", "q30_knn_cosine", "q03_star_join_revenue",
    "q16_rrf_fusion", "q12_bm25_topk", "q66_semantic_rerank",
    "q21_simhash_near_dups", "q22_minhash_lsh",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-overhead")
    qs = {s.name: s.fn for s in registry.SPECS}
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()

    # raw table-read cost (schema inference per read.parquet call)
    for t in ("events", "documents", "lineitem"):
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/{t}.parquet")
        print(f"read.parquet({t}): {(time.perf_counter()-t0)*1000:.0f} ms",
              flush=True)

    for name in QUERIES:
        fn = qs[name]
        for i in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)        # construction (catalog + plan)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
            print(
                f"{name} s{i}: construct {(t1-t0)*1000:6.0f} ms  "
                f"exec {(t2-t1)*1000:6.0f} ms", flush=True,
            )


if __name__ == "__main__":
    main()
