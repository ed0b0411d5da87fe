import sys
from pyspark.sql import functions as F
from memvid_spark.session import get_spark
from memvid_spark import catalog
from memvid_spark.operators import dedup
from memvid_spark.operators import semdedup as sd

spark = get_spark("q184probe")
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    t = catalog.load(spark, sf)
    planted = dedup.plant_near_dups(t.embeddings, every=10).localCheckpoint()
    k = 64
    exact = sd.seed_assign(planted, k=k).localCheckpoint()
    scaled = sd.seed_assign_scaled(planted, k=k, probes=2).localCheckpoint()
    j = exact.select("vec_id", F.col("cluster").alias("ce")).join(
        scaled.select("vec_id", F.col("cluster").alias("cs")), "vec_id")
    row = j.agg(F.count("*").alias("n"),
                F.sum((F.col("ce") == F.col("cs")).cast("int")).alias("agree")).head()
    de = sd.mark_cluster_dups(exact).filter("is_dup").count()
    ds = sd.mark_cluster_dups(scaled).filter("is_dup").count()
    print(sf, "n=", row.n, "agree=", row.agree, "frac=", row.agree/row.n,
          "dups_exact=", de, "dups_scaled=", ds)
spark.stop()
