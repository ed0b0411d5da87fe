"""Plan-shape check (tiny data): how many times does split( appear in
optimized plans for various layerings of tokens()?"""
import sys

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402

spark = get_spark("plan-shape-tokenize")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
TERMS = ["table", "window", "merge"]


def show(label, df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    n = plan.count("split(")
    nfil = plan.count("Filter")
    print(f"{label:45s} split-occurrences={n}  (Filter nodes={nfil})")


toks = tokens("text")

# 1. flat bm25-per shape
flat = docs.select(
    "doc_id", F.size(toks).alias("dl"),
    *[F.size(F.filter(toks, lambda x, tt=t: x == F.lit(tt))).alias(f"_tf{i}")
      for i, t in enumerate(TERMS)],
)
show("flat per (4 refs)", flat)

# 2. two-level
pre = docs.select("doc_id", toks.alias("_toks"))
lvl2 = pre.select(
    "doc_id", F.size("_toks").alias("dl"),
    *[F.size(F.filter(F.col("_toks"), lambda x, tt=t: x == F.lit(tt))).alias(f"_tf{i}")
      for i, t in enumerate(TERMS)],
)
show("two-level (toks once)", lvl2)

# 3. two-level + filter(any tf>0) on top  — does pushdown re-inline?
any_match = None
for i in range(len(TERMS)):
    hit = F.col(f"_tf{i}") > 0
    any_match = hit if any_match is None else (any_match | hit)
filt = lvl2.filter(any_match)
show("two-level + filter(tf>0)", filt)

# 4. three-level: _hit computed as column, filter on _hit attr
lvl3 = lvl2.select("*", any_match.alias("_hit")).filter("_hit").drop("_hit")
show("three-level _hit col + filter", lvl3)

# 5. single-term lex shape (1 ref) — collapse expected, 1 split fine
lex1 = pre.select(
    "doc_id",
    F.size(F.filter(F.col("_toks"), lambda x: x == F.lit("table"))).alias("s"),
).filter("s > 0")
show("single-ref + filter", lex1)

# 6. gates shape: withColumn over full docs
n_tok = F.size(F.col("_toks"))
n_stop = F.size(F.filter(F.col("_toks"), lambda x: x == F.lit("the")))
g1 = docs.withColumn("_toks", toks)
g2 = g1.withColumn("n_tok", n_tok).withColumn("_stop", n_stop)
g3 = g2.withColumn(
    "verdict",
    F.when(F.col("n_tok") < 10, F.lit("short"))
    .when(F.col("n_tok") > 100, F.lit("long"))
    .when(F.col("_stop") == 0, F.lit("nostop"))
    .otherwise(F.lit("kept")),
).drop("_toks", "_stop")
show("gates layered", g3)
g4 = g3.filter(F.col("verdict") == "kept")
show("gates layered + verdict filter", g4)

# 7. aggregation consumer: does agg over two-level keep 1 split?
agg = lvl2.agg(
    F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
    *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"df{i}")
      for i in range(len(TERMS))],
)
show("two-level -> agg (stats shape)", agg)

spark.stop()

# ---- part 2: nondeterministic pushdown guard ----
spark = get_spark("plan-shape-tokenize-2")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


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
show("two-level + GUARDED filter", gf)

# row equality vs unguarded
a = sorted(lvl2.filter(any_match).collect())
b = sorted(gf.collect())
print("guarded == unguarded rows:", a == b)

# guarded single-ref
lex1g = pre.select(
    "doc_id",
    F.size(F.filter(F.col("_toks"), lambda x: x == F.lit("table"))).alias("s"),
).filter(guard(F.col("s") > 0))
show("single-ref + GUARDED filter", lex1g)

# gates + guarded verdict filter
n_tok = F.size(F.col("_toks"))
n_stop = F.size(F.filter(F.col("_toks"), lambda x: x == F.lit("the")))
g1 = docs.withColumn("_toks", toks)
g2 = g1.withColumn("n_tok", n_tok).withColumn("_stop", n_stop)
g3 = g2.withColumn(
    "verdict",
    F.when(F.col("n_tok") < 10, F.lit("short"))
    .when(F.col("n_tok") > 100, F.lit("long"))
    .when(F.col("_stop") == 0, F.lit("nostop"))
    .otherwise(F.lit("kept")),
).drop("_toks", "_stop")
g4 = g3.filter(guard(F.col("verdict") == "kept"))
show("gates layered + GUARDED filter", g4)
spark.stop()
