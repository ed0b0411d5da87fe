"""Headline-only bench: the exact median-of-3 methodology of bench.py
main() for the 19 headline queries, nothing else. Used for fast
window checks and same-window A/Bs in round 12; the full bench.py
remains the driver-facing artifact.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _release_checkpoints, _spark_cpu_s
from memvid_spark.session import get_spark
from memvid_spark import registry


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("headline-only-r12")
    qs = {s.name: s.fn for s in registry.SPECS}
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()

    times, cpu_times = {}, {}
    for name in HEADLINE:
        fn = qs[name]
        samples, cpus = [], []
        for _ in range(3):
            c0 = _spark_cpu_s()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            cpus.append(_spark_cpu_s() - c0)
            _release_checkpoints(spark)
        times[name] = round(sorted(samples)[1], 3)
        valid = [c for c in cpus if c >= 0]
        if valid:
            cpu_times[name] = round(min(valid), 1)
    out = {
        "metric": "headline_only",
        "value": round(sum(times.values()), 3),
        "cpu_s": round(sum(cpu_times.values()), 1),
        "queries": times,
        "queries_cpu_s": cpu_times,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
