import time, sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from pyspark.sql import functions as F
from memvid_spark.operators import traindata
from memvid_spark.operators.traindata import GATE_MIN_TOKENS, GATE_MAX_TOKENS, NB_SPLIT_SALT
from memvid_spark.functions.hashing import hash64
from memvid_spark.functions.text import tokens, STOPWORDS
from memvid_spark import catalog

spark = get_spark("ab-q161")
t = catalog.load(spark, sys.argv[1] if len(sys.argv) > 1 else "scratch/probe100x")
docs = t.documents

def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)

def timed(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter()-t0:.1f}s -> {r}", flush=True)

# variant A = current (zip + double explode), via the library
def run_new():
    return traindata.nb_quality_classifier(docs).count()

# variant B = old HOF featurize feeding the same downstream;
# measure ONLY the feature-count collapse (the part that differs)
def feat_counts_old():
    toks = tokens("text")
    n_tok = F.size(toks)
    unis = F.transform(toks, lambda x: F.concat(F.lit("u#"), x))
    bis = F.zip_with(
        F.slice(toks, 1, F.greatest(n_tok - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_tok - 1, F.lit(0))),
        lambda a, b: F.concat(F.lit("b#"), a, F.lit(" "), b),
    )
    base = (docs.select(F.col("doc_id"), F.explode(F.concat(unis, bis)).alias("feat"))
            .withColumn("bucket", F.pmod(hash64("feat"), F.lit(1024))))
    return base.groupBy("doc_id", "bucket").agg(F.count("*").alias("n_occ")).count()

def feat_counts_new():
    toks = tokens("text")
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(F.size(F.col("toks")) - 1, F.lit(0))).alias("t1"),
    )
    base = (docs.select(F.col("doc_id"), toks.alias("toks"))
            .select(F.col("doc_id"), F.explode(zipped).alias("z"))
            .select(F.col("doc_id"), F.explode(F.array(
                F.concat(F.lit("u#"), F.col("z.t0")),
                F.when(F.col("z.t1").isNotNull(),
                       F.concat(F.lit("b#"), F.col("z.t0"), F.lit(" "), F.col("z.t1"))),
            )).alias("feat"))
            .filter(F.col("feat").isNotNull())
            .withColumn("bucket", F.pmod(hash64("feat"), F.lit(1024))))
    return base.groupBy("doc_id", "bucket").agg(F.count("*").alias("n_occ")).count()

for rnd in range(2):
    timed(f"old_feat_r{rnd}", feat_counts_old); release()
    timed(f"new_feat_r{rnd}", feat_counts_new); release()
spark.stop()
