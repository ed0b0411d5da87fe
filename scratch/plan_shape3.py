import sys

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402

spark = get_spark("plan-shape3")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
TERMS = ["table", "window", "merge"]


def eq(term):
    return lambda x: x == F.lit(term)


def show(label, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("split(")
    nr = plan.count("rand(")
    print(f"{label:48s} split={n} rand={nr}")


def pinned(col):
    return F.when(F.rand() >= F.lit(-1.0), tokens(col))


def build(tokcol_df, tokref):
    lvl2 = tokcol_df.select(
        "doc_id", F.size(tokref).alias("dl"),
        *[F.size(F.filter(tokref, eq(t))).alias(f"_tf{i}")
          for i, t in enumerate(TERMS)],
    )
    any_match = None
    for i in range(len(TERMS)):
        hit = F.col(f"_tf{i}") > 0
        any_match = hit if any_match is None else (any_match | hit)
    return lvl2, lvl2.filter(any_match)


# A: current flat shape (toks expr inline) + filter
toks = tokens("text")
flatlvl, flatfilt = build(docs, toks)
show("A flat + filter (current bm25 'per')", flatfilt)

# B: two-level plain + filter (pushdown expected to re-inline)
pre_plain = docs.select("doc_id", toks.alias("_toks"))
plvl, pfilt = build(pre_plain, F.col("_toks"))
show("B two-level plain + filter", pfilt)

# C: two-level pinned + filter
pre_pin = docs.select("doc_id", pinned("text").alias("_toks"))
clvl, cfilt = build(pre_pin, F.col("_toks"))
show("C two-level PINNED + filter", cfilt)
show("C' two-level PINNED no filter", clvl)

# stats branch over pinned
agg = clvl.agg(
    F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
    *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"df{i}")
      for i in range(len(TERMS))],
)
show("C'' pinned -> stats agg", agg)

# value equality A vs C
ares = {r["doc_id"]: (r["dl"], r["_tf0"], r["_tf1"], r["_tf2"])
        for r in flatfilt.collect()}
cres = {r["doc_id"]: (r["dl"], r["_tf0"], r["_tf1"], r["_tf2"])
        for r in cfilt.collect()}
print("A == C rows:", ares == cres, " nrows:", len(ares))

# explode over pinned (Generate with nondeterministic child — allowed?)
try:
    ex = pre_pin.select("doc_id", F.explode("_toks").alias("tok"))
    ex.limit(3).collect()
    print("explode over pinned attr: OK")
except Exception as e:
    print("explode over pinned attr FAILED:", str(e)[:200])

spark.stop()
