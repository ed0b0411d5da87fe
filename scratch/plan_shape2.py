import sys

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402

spark = get_spark("plan-shape2")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
TERMS = ["table", "window", "merge"]


def guard(pred):
    return F.when(F.rand() >= F.lit(-1.0), pred).otherwise(F.lit(False))


toks = tokens("text")
pre = docs.select("doc_id", toks.alias("_toks"))
lvl2 = pre.select(
    "doc_id", F.size("_toks").alias("dl"),
    *[F.size(F.filter(F.col("_toks"), lambda x, tt=t: x == F.lit(tt))).alias(f"_tf{i}")
      for i, t in enumerate(TERMS)],
)
any_match = None
for i in range(len(TERMS)):
    hit = F.col(f"_tf{i}") > 0
    any_match = hit if any_match is None else (any_match | hit)

gf = lvl2.filter(guard(any_match))
print(gf._jdf.queryExecution().optimizedPlan().toString())
print("=======================")
print(gf._jdf.queryExecution().executedPlan().toString())
spark.stop()
