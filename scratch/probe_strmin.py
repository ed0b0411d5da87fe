import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark import catalog

spark = get_spark("probe-strmin")

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

t = catalog.load(spark, "scratch/probe100x")
docs = t.documents
toks = tokens("text")
base = docs.select(F.col("doc_id"), toks.alias("toks"))
sz = F.size("toks")
zipped = F.arrays_zip(
    F.col("toks").alias("t0"),
    F.slice("toks", 2, F.greatest(sz - 1, F.lit(0))).alias("t1"),
    F.slice("toks", 3, F.greatest(sz - 2, F.lit(0))).alias("t2"),
)
ex = (base.select("doc_id", F.explode(zipped).alias("z"))
      .filter(F.col("z.t2").isNotNull())
      .select("doc_id", F.concat_ws(" ", "z.t0", "z.t1", "z.t2").alias("shingle")))

m1 = F.md5("shingle")
m2 = F.md5(F.concat(F.col("shingle"), F.lit("#")))
timed("two_md5_count", lambda: ex.select(F.count(m1), F.count(m2)).head())
wide = ex.groupBy("doc_id").agg(
    *[F.min(F.substring(m1, 8*i+1, 8)).alias(f"mh{i}") for i in range(4)],
    *[F.min(F.substring(m2, 8*i+1, 8)).alias(f"mh{4+i}") for i in range(4)],
)
timed("wide_strmin_8", lambda: wide.count())
