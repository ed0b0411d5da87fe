import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from memvid_spark.session import get_spark
from memvid_spark import catalog, registry
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/probe100x"
spark = get_spark("ab-q158-int")
t = catalog.load(spark, DATA)
QS = {s.name: s.fn for s in registry.SPECS}

def q158_old_hashes():
    from memvid_spark.operators.traindata import LM_BACKOFF, LM_SCALE
    id_col, group_col = "doc_id", "lang"
    src = t.documents
    toks = tokens("text")
    n = F.size(F.col("toks"))
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))).alias("t1"))
    def _bigram_pass(s, *cols, strings: bool):
        out = [hash64(F.concat(F.col("z.t0"), F.lit(" "), F.col("z.t1"))).alias("bh"),
               hash64(F.col("z.t1")).alias("wh")]
        if strings:
            out = [F.col("z.t0").alias("t0"), F.col("z.t1").alias("t1")] + out
        return (s.select(*cols, toks.alias("toks"))
                .select(*cols, F.explode(zipped).alias("z"))
                .filter(F.col("z.t1").isNotNull())
                .select(*cols, *out))
    ref = _bigram_pass(src.filter(F.col("lang") == "en"), F.col(id_col), strings=True).localCheckpoint()
    base = _bigram_pass(src, F.col(id_col), F.col(group_col), strings=False)
    c2 = ref.groupBy("t0", "t1", "bh").agg(F.count("*").alias("c2"))
    c1ctx = c2.groupBy(F.col("t0").alias("prev")).agg(F.sum("c2").alias("c1ctx"))
    bg_model = c2.join(c1ctx, c2.t0 == c1ctx.prev).select(
        "bh", F.round(F.log(F.col("c2") / F.col("c1ctx")) * LM_SCALE).cast("long").alias("lp2_micro"))
    c1 = ref.groupBy(F.col("t1").alias("w"), F.col("wh").alias("uwh")).agg(F.count("*").alias("c1"))
    totals = c1.agg(F.sum("c1").alias("_T"), F.count("*").alias("_V"))
    ug_model = c1.join(F.broadcast(totals)).select(
        F.col("uwh").alias("wh"),
        F.round((F.log(F.lit(LM_BACKOFF)) + F.log((F.col("c1") + 1) / (F.col("_T") + F.col("_V")))) * LM_SCALE).cast("long").alias("lp1_micro"))
    scored = (base.join(bg_model, "bh", "left").join(ug_model, "wh", "left")
              .join(F.broadcast(totals))
              .withColumn("lp_micro", F.coalesce("lp2_micro", "lp1_micro",
                  F.round((F.log(F.lit(LM_BACKOFF)) - F.log(F.col("_T") + F.col("_V"))) * LM_SCALE).cast("long")))
              .groupBy(id_col, group_col)
              .agg(F.count("*").alias("n_big"), F.sum("lp_micro").alias("lp_sum_micro")))
    ratio = F.col("lp_sum_micro") / F.col("n_big")
    scored = scored.withColumn("avg_lp", ratio / F.lit(LM_SCALE))
    w = Window.partitionBy(group_col).orderBy(ratio.desc(), F.asc(id_col))
    cnt = Window.partitionBy(group_col)
    return (scored.withColumn("_rk", F.row_number().over(w))
            .withColumn("_n", F.count("*").over(cnt))
            .select(id_col, group_col, "n_big", "lp_sum_micro",
                    F.round("avg_lp", 6).alias("avg_lp"),
                    F.when(F.col("_rk") * 3 <= F.col("_n"), F.lit("head"))
                    .when(F.col("_rk") * 3 <= F.col("_n") * 2, F.lit("middle"))
                    .otherwise(F.lit("tail")).alias("bucket")))

def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
def cpu():
    tck = os.sysconf("SC_CLK_TCK"); tot = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit(): continue
        try:
            with open(f"/proc/{pid}/cmdline","rb") as f: cmd=f.read()
            if (b"SparkSubmit" not in cmd and b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd): continue
            with open(f"/proc/{pid}/stat") as f: parts=f.read().rsplit(")",1)[1].split()
            tot += (int(parts[11])+int(parts[12])+int(parts[13])+int(parts[14]))/tck
        except (OSError,IndexError,ValueError): continue
    return tot
def sample(label, mk):
    c0,t0 = cpu(), time.perf_counter()
    mk().write.mode("overwrite").format("noop").save()
    print(f"{label}: wall {time.perf_counter()-t0:6.1f}s cpu {cpu()-c0:7.1f}s", flush=True)
    release()
new = lambda: QS["q158_lm_perplexity"](spark, DATA)
for rnd in range(3):
    sample(f"old_r{rnd}", q158_old_hashes)
    sample(f"new_r{rnd}", new)
spark.stop()
