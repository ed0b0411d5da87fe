import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark import catalog

spark = get_spark("probe-conv2")

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

def ascii_poly(m):
    h = F.lit(0).cast("long")
    mult = 1
    for i in range(1, 10):
        h = h + F.ascii(F.substring(m, i, 1)).cast("long") * F.lit(mult)
        mult *= 103
    return h

N = 8_000_000
par = spark.range(0, N, 1, 32).select(F.col("id").cast("string").alias("s"))
timed("ascii_poly_32t", lambda: par.select(F.max(ascii_poly(F.md5("s")))).head()[0])

t = catalog.load(spark, "scratch/probe100x")
docs = t.documents
toks = tokens("text")
base = docs.select(F.col("doc_id"), toks.alias("toks"))
# codegen shingle build: arrays_zip of shifted slices -> explode -> concat_ws on columns
sz = F.size("toks")
zipped = F.arrays_zip(
    F.col("toks").alias("t0"),
    F.slice("toks", 2, F.greatest(sz - 1, F.lit(0))).alias("t1"),
    F.slice("toks", 3, F.greatest(sz - 2, F.lit(0))).alias("t2"),
)
ex = (base.select("doc_id", F.explode(zipped).alias("z"))
      .filter(F.col("z.t2").isNotNull())
      .select("doc_id", F.concat_ws(" ", "z.t0", "z.t1", "z.t2").alias("shingle")))
timed("zip_shingle_count", lambda: ex.count())
timed("zip_shingle_md5_poly", lambda: ex.select(F.max(ascii_poly(F.md5("shingle")))).head()[0])
