import sys

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402

spark = get_spark("plan-shape4")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
TERMS = ["table", "window", "merge"]


def eq(term):
    return lambda x: x == F.lit(term)


def show(label, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("split(")
    print(f"{label:52s} split={n}")


def build_filtered(pre, tokref):
    lvl2 = pre.select(
        "doc_id", F.size(tokref).alias("dl"),
        *[F.size(F.filter(tokref, eq(t))).alias(f"_tf{i}")
          for i, t in enumerate(TERMS)],
    )
    any_match = None
    for i in range(len(TERMS)):
        hit = F.col(f"_tf{i}") > 0
        any_match = hit if any_match is None else (any_match | hit)
    return lvl2.filter(any_match)


toks = tokens("text")

taints = {
    "mono_id": F.when(F.monotonically_increasing_id() >= F.lit(-1), toks),
    "part_id": F.when(F.spark_partition_id() >= F.lit(-1), toks),
    "rand_arith": F.when(F.rand() + F.lit(2.0) >= F.lit(1.0), toks),
    "shuffle_slice": F.when(
        F.size(F.shuffle(F.array(F.lit(1)))) > 0, toks
    ),
}
for name, texpr in taints.items():
    pre = docs.select("doc_id", texpr.alias("_toks"))
    f = build_filtered(pre, F.col("_toks"))
    show(f"taint {name} + filter", f)

# reference values
ref = {r["doc_id"]: (r["dl"], r["_tf0"], r["_tf1"], r["_tf2"])
       for r in build_filtered(
           docs.select("doc_id", toks.alias("_toks")), F.col("_toks")
       ).collect()}
for name, texpr in taints.items():
    pre = docs.select("doc_id", texpr.alias("_toks"))
    f = build_filtered(pre, F.col("_toks"))
    got = {r["doc_id"]: (r["dl"], r["_tf0"], r["_tf1"], r["_tf2"])
           for r in f.collect()}
    print(f"{name}: values match = {got == ref}")
spark.stop()
