from pyspark.sql import functions as F
from memvid_spark.session import get_spark
from memvid_spark import catalog
from memvid_spark.operators import dedup
from memvid_spark.operators import semdedup as sd

spark = get_spark("q184probe2")
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    t = catalog.load(spark, sf)
    clustered = t.embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + F.when(
                i == (F.col("vec_id") % 8).cast("int"), F.lit(8.0)
            ).otherwise(F.lit(0.0)),
        ).alias("embedding"),
    )
    planted = dedup.plant_near_dups(clustered, every=10).localCheckpoint()
    k = 64
    exact = sd.seed_assign(planted, k=k).localCheckpoint()
    scaled = sd.seed_assign_scaled(planted, k=k, probes=2).localCheckpoint()
    j = exact.select("vec_id", F.col("cluster").alias("ce")).join(
        scaled.select("vec_id", F.col("cluster").alias("cs")), "vec_id")
    row = j.agg(F.count("*").alias("n"),
                F.sum((F.col("ce") == F.col("cs")).cast("int")).alias("agree")).head()
    de = sd.mark_cluster_dups(exact).filter("is_dup").count()
    ds = sd.mark_cluster_dups(scaled).filter("is_dup").count()
    print(sf, "n=", row.n, "agree=", row.agree, "frac=", round(row.agree/row.n,4),
          "dups_exact=", de, "dups_scaled=", ds)
spark.stop()
