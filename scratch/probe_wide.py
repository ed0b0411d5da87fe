import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64, hash64_affine
from memvid_spark import catalog

spark = get_spark("probe-wide")
t = catalog.load(spark, "scratch/probe100x")
docs = t.documents
print("partitions:", docs.rdd.getNumPartitions(), flush=True)

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

n = 3
toks = tokens("text")
sh_expr = F.expr(
    f"transform(sequence(1, greatest(size(toks) - {n-1}, 0)), "
    f"i -> concat_ws(' ', {', '.join(f'element_at(toks, i + {d})' for d in range(n))}))"
)
base = docs.select(F.col("doc_id"), toks.alias("toks"))
timed("tokenize_only", lambda: base.select(F.sum(F.size("toks"))).head()[0])
shed = base.select(F.col("doc_id"), sh_expr.alias("sh"))
timed("shingle_arrays", lambda: shed.select(F.sum(F.size("sh"))).head()[0])
dis = base.select(F.col("doc_id"), F.array_distinct(sh_expr).alias("sh"))
timed("shingle_distinct_arrays", lambda: dis.select(F.sum(F.size("sh"))).head()[0])
ex = dis.select(F.col("doc_id"), F.explode("sh").alias("shingle"))
timed("explode_count", lambda: ex.count())
h = ex.select("doc_id", hash64(F.col("shingle")).alias("h"))
timed("md5_sum", lambda: h.select(F.sum("h")).head()[0])
wide = h.groupBy("doc_id").agg(*[F.min(hash64_affine(F.col("h"), s)).alias(f"mh{s}") for s in range(8)])
timed("wide_agg_count", lambda: wide.count())
spark.stop()
