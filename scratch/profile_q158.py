import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64
from memvid_spark import catalog

spark = get_spark("profile-q158")
t = catalog.load(spark, "scratch/probe100x")
docs = t.documents

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)
    return r

toks = tokens("text")
n = F.size(F.col("toks"))
zipped = F.arrays_zip(
    F.col("toks").alias("t0"),
    F.slice("toks", 2, F.greatest(n - 1, F.lit(0))).alias("t1"),
)
base = (docs.select(F.col("doc_id"), F.col("lang"), (F.col("lang")=="en").alias("_ref"), toks.alias("toks"))
        .select("doc_id", "lang", "_ref", F.explode(zipped).alias("z"))
        .filter(F.col("z.t1").isNotNull())
        .select("doc_id", "lang", "_ref",
                F.col("z.t0").alias("t0"), F.col("z.t1").alias("t1"),
                hash64(F.concat(F.col("z.t0"), F.lit(" "), F.col("z.t1"))).alias("bh"),
                hash64(F.col("z.t1")).alias("wh")))
base = timed("base_checkpoint", lambda: base.localCheckpoint())
timed("base_count", lambda: base.count())
ref = base.filter("_ref")
c2 = ref.groupBy("t0","t1","bh").agg(F.count("*").alias("c2"))
c2 = timed("c2_checkpoint", lambda: c2.localCheckpoint())
timed("c2_count", lambda: c2.count())
c1ctx = c2.groupBy(F.col("t0").alias("prev")).agg(F.sum("c2").alias("c1ctx"))
bg_model = c2.join(c1ctx, c2.t0 == c1ctx.prev).select("bh", F.round(F.log(F.col("c2")/F.col("c1ctx"))*1000000).cast("long").alias("lp2_micro"))
bg_model = timed("bg_model_checkpoint", lambda: bg_model.localCheckpoint())
c1 = ref.groupBy(F.col("t1").alias("w"), F.col("wh").alias("uwh")).agg(F.count("*").alias("c1"))
totals = c1.agg(F.sum("c1").alias("_T"), F.count("*").alias("_V"))
ug_model = c1.join(F.broadcast(totals)).select(F.col("uwh").alias("wh"), F.round((F.log(F.lit(0.4))+F.log((F.col("c1")+1)/(F.col("_T")+F.col("_V"))))*1000000).cast("long").alias("lp1_micro"))
ug_model = timed("ug_model_checkpoint", lambda: ug_model.localCheckpoint())
scored = (base.select("doc_id","lang","bh","wh")
          .join(bg_model, "bh", "left")
          .join(ug_model, "wh", "left")
          .join(F.broadcast(totals))
          .withColumn("lp", F.coalesce("lp2_micro","lp1_micro", F.round((F.log(F.lit(0.4))-F.log(F.col("_T")+F.col("_V")))*1000000).cast("long")))
          .groupBy("doc_id","lang").agg(F.count("*").alias("n_big"), F.sum("lp").alias("s")))
timed("scored_count", lambda: scored.count())
spark.stop()
