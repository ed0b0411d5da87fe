"""Same-session interleaved A/B at the 100x blowup: pre-pin (old, inlined
here) vs pinned (repo HEAD) for bm25_topk, bm25f_topk and the
quality-gates labeling pass. Run in a QUIET window (no other Spark)."""
import sys, time

sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from memvid_spark.functions.text import tokens, STOPWORDS  # noqa: E402
from memvid_spark.operators import search, traindata  # noqa: E402
from bench import _spark_cpu_s as cpu  # noqa: E402

PROBE = "/root/repo/scratch/probe100x"
spark = get_spark("ab-tokenize-r11b")
docs = spark.read.parquet(f"{PROBE}/documents.parquet")
TERMS = ["table", "window", "merge"]
K1, B = search.BM25_K1, search.BM25_B


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# ---------- OLD implementations (pre-pin, verbatim shapes) ----------

def old_bm25(docs, terms, k=10, id_col="doc_id", text_col="text"):
    terms_lc = sorted({t.lower() for t in terms})
    toks = tokens(text_col)

    def _count_of(term):
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    per = docs.select(
        F.col(id_col), F.size(toks).alias("dl"),
        *[_count_of(tt).alias(f"_tf{i}") for i, tt in enumerate(terms_lc)],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(terms_lc))],
    )
    score = None
    any_match = None
    for i in range(len(terms_lc)):
        idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col(f"_df{i}") + 0.5)
                    / (F.col(f"_df{i}") + 0.5))
        wi = F.when(
            F.col(f"_tf{i}") > 0,
            idf * (F.col(f"_tf{i}") * (K1 + 1))
            / (F.col(f"_tf{i}") + K1 * (1 - B + B * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        score = wi if score is None else score + wi
        hit = F.col(f"_tf{i}") > 0
        any_match = hit if any_match is None else (any_match | hit)
    scored = (per.filter(any_match).crossJoin(F.broadcast(stats))
              .withColumn("score", F.round(score, 6))
              .select(F.col(id_col), F.col("score")))
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def old_gates(docs, text_col="text"):
    toks = tokens(text_col)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop, x)))
    verdict = (
        F.when(n_tok < traindata.GATE_MIN_TOKENS, F.lit("too_short"))
        .when(n_tok > traindata.GATE_MAX_TOKENS, F.lit("too_long"))
        .when(n_stop == 0, F.lit("no_stopwords"))
        .otherwise(F.lit("kept"))
    )
    return docs.withColumn("n_tok", n_tok).withColumn("verdict", verdict)


def gates_kept_count(g):
    # the q109 consumption shape: filter kept, narrow agg
    return g.filter(F.col("verdict") == "kept").select("doc_id", "n_tok")


cases = {
    "bm25": (lambda: old_bm25(docs, TERMS, k=20),
             lambda: search.bm25_topk(docs, TERMS, k=20)),
    "bm25f": (None,  # old form not re-inlined (2-level already); skip old
              lambda: search.bm25f_topk(docs, TERMS, k=15)),
    "gates+filter": (lambda: gates_kept_count(old_gates(docs)),
                     lambda: gates_kept_count(traindata.quality_gates(docs))),
}

# warm both plans
for name, (old, new) in cases.items():
    if old:
        noop(old())
    noop(new())

for rnd in range(3):
    for name, (old, new) in cases.items():
        line = f"round {rnd} {name:14s}"
        if old:
            w0, c0 = time.perf_counter(), cpu()
            noop(old())
            line += f" old {time.perf_counter()-w0:6.2f}s/{cpu()-c0:7.1f}cpu"
        w0, c0 = time.perf_counter(), cpu()
        noop(new())
        line += f"  new {time.perf_counter()-w0:6.2f}s/{cpu()-c0:7.1f}cpu"
        print(line, flush=True)

# row equality old vs new
print("bm25 rows equal:",
      old_bm25(docs, TERMS, k=20).collect()
      == search.bm25_topk(docs, TERMS, k=20).collect())
a = old_gates(docs).groupBy("verdict").count().collect()
b = traindata.quality_gates(docs).groupBy("verdict").count().collect()
print("gates verdicts equal:", sorted(map(tuple, a)) == sorted(map(tuple, b)))
spark.stop()
