import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
import __spark_entry__ as e

spark = get_spark("time2")
sf_dir = sys.argv[1]
qs = e.queries()
def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
for name in sys.argv[2].split(","):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        release()
    print(f"{name}: min2={best:.1f}s rows={n}", flush=True)
spark.stop()
