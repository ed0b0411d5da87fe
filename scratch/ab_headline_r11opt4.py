"""Headline-only A/B probe: times the 19 headline queries exactly like
bench.py (noop sink, median-of-3 wall, min cpu_s) against the repo
checkout given as argv[1]. Prints one JSON line."""
import json
import sys
import time

repo = sys.argv[1]
sys.path.insert(0, repo)

import bench  # noqa: E402  (the checkout's own bench.py)
from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark import registry  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("ab-headline")
qs = {s.name: s.fn for s in registry.SPECS}

spark.read.parquet(f"{sf_dir}/documents.parquet").count()
spark.range(32, numPartitions=32).mapInPandas(
    lambda it: it, "id long"
).write.mode("overwrite").format("noop").save()

times = {}
cpu_times = {}
for name in bench.HEADLINE:
    fn = qs[name]
    samples, cpus = [], []
    for _ in range(3):
        c0 = bench._spark_cpu_s()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        samples.append(time.perf_counter() - t0)
        cpus.append(bench._spark_cpu_s() - c0)
        bench._release_checkpoints(spark)
    times[name] = round(sorted(samples)[1], 3)
    valid = [c for c in cpus if c >= 0]
    if valid:
        cpu_times[name] = round(min(valid), 1)

print(json.dumps({
    "repo": repo,
    "total": round(sum(times.values()), 3),
    "cpu_s": round(sum(cpu_times.values()), 1),
    "queries": times,
}))
