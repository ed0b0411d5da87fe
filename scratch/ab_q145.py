import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens, ngram_rows
from memvid_spark.functions.hashing import hash64
from memvid_spark import catalog

spark = get_spark("ab-q145")
t = catalog.load(spark, sys.argv[1] if len(sys.argv) > 1 else "scratch/probe100x")
docs = t.documents
w = 8

def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

def win_old():
    toked = docs.select(F.col("doc_id"), tokens(F.col("text")).alias("_t")).filter(F.size("_t") >= w)
    tc = F.col("_t")
    win = toked.select(F.col("doc_id"), F.posexplode(
        F.transform(F.sequence(F.lit(1), F.size(tc) - w + 1),
                    lambda i: hash64(F.concat_ws(" ", F.slice(tc, i, w))))).alias("pos","whash"))
    return win.groupBy("doc_id").agg(F.count("*").alias("n")).count()

def win_new():
    win = ngram_rows(docs, w, "doc_id", "text", with_pos=True).select(
        F.col("doc_id"), "pos", hash64(F.col("gram")).alias("whash"))
    return win.groupBy("doc_id").agg(F.count("*").alias("n")).count()

def win_new_nopos():
    win = ngram_rows(docs, w, "doc_id", "text").select(
        F.col("doc_id"), hash64(F.col("gram")).alias("whash"))
    return win.groupBy("doc_id").agg(F.count("*").alias("n")).count()

for rnd in range(2):
    timed(f"old_r{rnd}", win_old); release()
    timed(f"new_r{rnd}", win_new); release()
    timed(f"new_nopos_r{rnd}", win_new_nopos); release()
spark.stop()
