import time, sys
from pyspark.sql import SparkSession, functions as F

ansi = sys.argv[1] if len(sys.argv) > 1 else "true"
spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.sql.ansi.enabled", ansi)
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "8g")
         .appName("probe-conv3").getOrCreate())

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

N = 4_000_000
par = spark.range(0, N, 1, 32).select(F.md5(F.col("id").cast("string")).alias("m"))
timed(f"conv15_ansi={ansi}", lambda: par.select(F.count(F.conv(F.substring("m",1,15), 16, 10).cast("long"))).head()[0])
timed(f"conv7_ansi={ansi}", lambda: par.select(F.count(F.conv(F.substring("m",1,7), 16, 10).cast("long"))).head()[0])
spark.stop()
