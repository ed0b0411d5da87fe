import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
import __spark_entry__ as e

spark = get_spark("time-q22")
sf_dir = sys.argv[1]
qs = e.queries()
for name in sys.argv[2].split(","):
    t0 = time.perf_counter()
    n = qs[name](spark, sf_dir).count()
    print(f"{name}: {time.perf_counter()-t0:.1f}s rows={n}", flush=True)
spark.stop()
