import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64
from memvid_spark import catalog

spark = get_spark("probe-wide2")
t = catalog.load(spark, "scratch/probe100x")
docs = t.documents

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

toks = tokens("text")
base = docs.select(F.col("doc_id"), toks.alias("toks"))
# per-token md5 over exploded tokens (no shingle strings at all)
ex_tok = base.select("doc_id", F.explode("toks").alias("tok"))
timed("explode_tokens", lambda: ex_tok.count())
timed("md5_per_token", lambda: ex_tok.select(F.sum(hash64(F.col("tok")))).head()[0])
# in-row per-token md5 via transform (HOF) then sum
harr = base.select(F.aggregate(F.transform("toks", lambda x: hash64(x)), F.lit(0).cast("long"), lambda a, x: a + x).alias("s"))
timed("md5_transform_inrow", lambda: harr.select(F.sum("s")).head()[0])
