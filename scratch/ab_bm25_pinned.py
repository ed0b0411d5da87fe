"""A/B: current bm25_topk vs pinned-token two-level variant, at the
100x blowup, interleaved x3, noop-sink. Also the gates shape."""
import sys, time

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402
from memvid_spark.operators import search  # noqa: E402

PROBE = "/root/repo/scratch/probe100x"
spark = get_spark("ab-bm25-pinned")
sc = spark.sparkContext
docs = spark.read.parquet(f"{PROBE}/documents.parquet")
TERMS = ["table", "window", "merge"]
K = 20


from bench import _spark_cpu_s as jvm_cpu  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def eq(term):
    return lambda x: x == F.lit(term)


PIN = lambda c: F.when(F.spark_partition_id() >= F.lit(-1), tokens(c))  # noqa


def bm25_pinned(docs, terms, k=10, id_col="doc_id", text_col="text",
                k1=search.BM25_K1, b=search.BM25_B):
    terms_lc = sorted({t.lower() for t in terms})
    pre = docs.select(F.col(id_col), PIN(text_col).alias("_toks"))
    per = pre.select(
        F.col(id_col),
        F.size("_toks").alias("dl"),
        *[F.size(F.filter(F.col("_toks"), eq(tt))).alias(f"_tf{i}")
          for i, tt in enumerate(terms_lc)],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(terms_lc))],
    )
    score = None
    any_match = None
    for i in range(len(terms_lc)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5)
        )
        wi = F.when(
            F.col(f"_tf{i}") > 0,
            idf * (F.col(f"_tf{i}") * (k1 + 1))
            / (F.col(f"_tf{i}") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        score = wi if score is None else score + wi
        hit = F.col(f"_tf{i}") > 0
        any_match = hit if any_match is None else (any_match | hit)
    scored = (
        per.filter(any_match)
        .crossJoin(F.broadcast(stats))
        .withColumn("score", F.round(score, 6))
        .select(F.col(id_col), F.col("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def timed(label, mk):
    df = mk()
    t0w, t0c = time.perf_counter(), jvm_cpu()
    noop(df)
    return time.perf_counter() - t0w, jvm_cpu() - t0c


# warm both plans once
noop(search.bm25_topk(docs, TERMS, k=K))
noop(bm25_pinned(docs, TERMS, k=K))

for rnd in range(3):
    wo, co = timed("old", lambda: search.bm25_topk(docs, TERMS, k=K))
    wn, cn = timed("new", lambda: bm25_pinned(docs, TERMS, k=K))
    print(f"round {rnd}: old {wo:6.2f}s/{co:7.1f}cpu   new {wn:6.2f}s/{cn:7.1f}cpu")

# equality of outputs
a = search.bm25_topk(docs, TERMS, k=K).collect()
b = bm25_pinned(docs, TERMS, k=K).collect()
print("rows equal:", a == b)

# plan split counts
for lbl, df in [("old", search.bm25_topk(docs, TERMS, k=K)),
                ("new", bm25_pinned(docs, TERMS, k=K))]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    print(lbl, "split-occurrences:", plan.count("split("))
spark.stop()
