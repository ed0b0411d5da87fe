import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64
from memvid_spark import catalog

spark = get_spark("ab-q176")
t = catalog.load(spark, "scratch/probe100x")
docs = t.documents

def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

toks = docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("tok")).filter(F.length("tok") >= 2)

def post_old():
    return (toks.groupBy("doc_id","tok").agg(F.count("*").alias("tf"))
            .select("doc_id","tf", hash64("tok").alias("h")))

def post_new():
    return (toks.select("doc_id", hash64("tok").alias("h"))
            .groupBy("doc_id","h").agg(F.count("*").alias("tf")))

SIMHASH_BITS=60
def wide(post):
    vote_aggs = [F.sum(F.expr(f"tf * (((h >> {j}) & 1) * 2 - 1)")).alias(f"v{j}") for j in range(SIMHASH_BITS)]
    return post.groupBy("doc_id").agg(*vote_aggs, F.sum("tf").alias("tc"))

for rnd in range(2):
    timed(f"post_old_count_r{rnd}", lambda: post_old().count()); release()
    timed(f"post_new_count_r{rnd}", lambda: post_new().count()); release()
    timed(f"wide_old_r{rnd}", lambda: wide(post_old()).count()); release()
    timed(f"wide_new_r{rnd}", lambda: wide(post_new()).count()); release()
spark.stop()
