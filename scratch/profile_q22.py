import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.operators import dedup
from memvid_spark.functions.hashing import hash64, hash64_affine
from memvid_spark import catalog

spark = get_spark("profile-q22")
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "scratch/probe100x"
t = catalog.load(spark, sf_dir)
docs = t.documents

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)
    return r

k, bands, rows_per_band = 8, 4, 2
sh_all = dedup.shingles(docs)
hashed = sh_all.select("doc_id", hash64(F.col("shingle")).alias("h"))
wide = hashed.groupBy("doc_id").agg(*[F.min(hash64_affine(F.col("h"), s)).alias(f"mh{s}") for s in range(k)])
wide = timed("wide_agg_checkpoint", lambda: wide.localCheckpoint())

band_structs = F.array(*[
    F.struct(F.lit(b).alias("band"),
             F.concat_ws(",", *[F.col(f"mh{b*rows_per_band+r}").cast("string") for r in range(rows_per_band)]).alias("bk"))
    for b in range(bands)])
band_key = wide.select(F.col("doc_id"), F.explode(band_structs).alias("x")).select("doc_id","x.band","x.bk")
band_key = timed("band_key_checkpoint", lambda: band_key.localCheckpoint())

left = band_key.select("band","bk",F.col("doc_id").alias("a"))
right = band_key.select("band","bk",F.col("doc_id").alias("b"))
cand = left.join(right, ["band","bk"]).filter(F.col("a")<F.col("b")).select("a","b").distinct()
cand = timed("cand_checkpoint", lambda: cand.localCheckpoint())
timed("cand_count", lambda: cand.count())

cand_ids = cand.select(F.explode(F.array("a","b")).alias("doc_id")).distinct()
sh = dedup.shingles(docs.join(F.broadcast(cand_ids), "doc_id", "semi"))
sh = timed("sh_cand_checkpoint", lambda: sh.localCheckpoint())
sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
inter = (cand.join(sh.select(F.col("doc_id").alias("a"),"shingle"),"a")
             .join(sh.select(F.col("doc_id").alias("b"),F.col("shingle")),["b","shingle"])
             .groupBy("a","b").agg(F.count("*").alias("inter")))
res = (inter.join(sizes.select(F.col("doc_id").alias("a"),F.col("sz").alias("sz_a")),"a")
            .join(sizes.select(F.col("doc_id").alias("b"),F.col("sz").alias("sz_b")),"b")
            .withColumn("jaccard", F.round(F.col("inter")/(F.col("sz_a")+F.col("sz_b")-F.col("inter")).cast("double"),6))
            .filter(F.col("jaccard")>=0.2).select("a","b","jaccard"))
timed("verify_count", lambda: res.count())
spark.stop()
