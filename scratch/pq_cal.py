import sys; sys.path.insert(0,"/root/repo")
from pyspark.sql import functions as F
from memvid_spark.session import get_spark
from memvid_spark.operators.pq import pq_recall
import os
os.environ.setdefault("SPARK_GRAFT_CPUS","4"); os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS","4")
spark = get_spark("pqcal")
emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
q = [float(x) for x in emb.filter(F.col("vec_id")==1).head().embedding]
for n_sub, k in [(4,64),(8,32),(8,64),(2,128)]:
    print(n_sub, k, pq_recall(emb, q, k=10, n_sub=n_sub, n_centroids=k))
spark.stop()
