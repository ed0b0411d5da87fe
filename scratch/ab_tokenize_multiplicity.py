"""Hypothesis probe: does a multi-referenced higher-order tokens()
expression recompute the regex split per reference?

Times, at the 100x blowup, a narrow select computing
  (a) size(toks) alone                         — 1 reference
  (b) size(toks) + 3 per-term size(filter(..)) — 4 references (bm25 'per' shape)
  (c) two-level: toks materialized once, then the same 4 consumers
and prints each plan's count of `split(` occurrences.

Run AFTER the sweep finishes (timing probe).
"""
import os, sys, time

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402

PROBE = "/root/repo/scratch/probe100x"

spark = get_spark("ab-tokenize-multiplicity")
docs = spark.read.parquet(f"{PROBE}/documents.parquet")

TERMS = ["table", "window", "merge"]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, df, n=3):
    noop(df)  # warm codegen
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        noop(df)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    plan = df._jdf.queryExecution().executedPlan().toString()
    nsplit = plan.count("split(")
    print(f"{label:28s} min={best:7.3f}s  split-occurrences-in-plan={nsplit}")
    return best


toks = tokens("text")

a = docs.select("doc_id", F.size(toks).alias("dl"))

b = docs.select(
    "doc_id",
    F.size(toks).alias("dl"),
    *[
        F.size(F.filter(toks, lambda x, tt=t: x == F.lit(tt))).alias(f"_tf{i}")
        for i, t in enumerate(TERMS)
    ],
)

pre = docs.select("doc_id", toks.alias("_toks"))
c = pre.select(
    "doc_id",
    F.size("_toks").alias("dl"),
    *[
        F.size(F.filter(F.col("_toks"), lambda x, tt=t: x == F.lit(tt))).alias(f"_tf{i}")
        for i, t in enumerate(TERMS)
    ],
)

timeit("size only (1 ref)", a)
timeit("bm25-per shape (4 refs)", b)
timeit("two-level (toks once)", c)

# equality check b == c
import pandas as pd  # noqa: E402

pb = b.orderBy("doc_id").limit(2000).toPandas()
pc = c.orderBy("doc_id").limit(2000).toPandas()
print("b == c:", pb.equals(pc))
spark.stop()
