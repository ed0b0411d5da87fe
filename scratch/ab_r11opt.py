"""Round-11-opt A/B probes, run against a blowup dir (default probe100x).

Usage: python scratch/ab_r11opt.py [data_dir] [which,which,...]

Each experiment times CURRENT vs CANDIDATE through the noop sink and
reports wall + spark cpu_s (min of 2), plus a row-level equivalence
check at the end (sorted collect compare on the small dir).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window  # noqa: E402

from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark import catalog  # noqa: E402
from memvid_spark.functions.text import tokens, ngram_rows  # noqa: E402
from memvid_spark.functions.hashing import hash64  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/probe100x"
WHICH = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark("ab-r11opt")
t = catalog.load(spark, DATA)
docs = t.documents.select("doc_id", "text")


def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)


def _cpu():
    tck = os.sysconf("SC_CLK_TCK")
    tot = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if (b"SparkSubmit" not in cmd and b"pyspark.daemon" not in cmd
                    and b"pyspark.worker" not in cmd):
                continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            tot += (int(parts[11]) + int(parts[12])
                    + int(parts[13]) + int(parts[14])) / tck
        except (OSError, IndexError, ValueError):
            continue
    return tot


def timed(label, mk, n=2):
    best_w = best_c = None
    for _ in range(n):
        c0, t0 = _cpu(), time.perf_counter()
        mk().write.mode("overwrite").format("noop").save()
        w, c = time.perf_counter() - t0, _cpu() - c0
        release()
        best_w = w if best_w is None else min(best_w, w)
        if c >= 0:
            best_c = c if best_c is None else min(best_c, c)
    print(f"{label:34s} wall {best_w:7.2f}s  cpu {best_c:8.1f}s", flush=True)


# ---------------------------------------------------------------- q145
PASSAGE_W = 8


def q145_current():
    from memvid_spark.operators import semdedup as sd
    return sd.passage_dup_stats(docs, w=PASSAGE_W)


def _win(hash_fn):
    return ngram_rows(docs, PASSAGE_W, "doc_id", "text", with_pos=True).select(
        F.col("doc_id"), hash_fn(F.col("gram")).alias("whash")
    )


def q145_onepass(hash_fn=hash64):
    win = _win(hash_fn)
    per = win.groupBy("whash", "doc_id").agg(F.count("*").alias("cnt"))
    wnd = Window.partitionBy("whash")
    per = per.withColumn("ndocs", F.count("*").over(wnd))
    out = per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_windows"),
        F.sum(F.when(F.col("ndocs") > 1, F.col("cnt")).otherwise(F.lit(0)))
        .alias("n_dup_windows"),
    )
    return (
        out.withColumn(
            "dup_fraction",
            F.round(F.col("n_dup_windows") / F.col("n_windows"), 6),
        )
        .withColumn("flagged", F.col("dup_fraction") >= F.lit(0.3))
    )


def q145_onepass_xx():
    return q145_onepass(lambda c: F.xxhash64(c))


# ---------------------------------------------------------------- q158
def q158_current():
    from memvid_spark.operators import traindata
    return traindata.lm_perplexity(docs.join(
        t.documents.select("doc_id", "lang"), "doc_id"
    ), F.col("lang") == "en", group_col="lang") if False else (
        traindata.lm_perplexity(t.documents, F.col("lang") == "en",
                                group_col="lang"))


def q158_corpus_pass(hash_fn):
    """Just the corpus bigram pass + per-doc agg — isolates hash cost."""
    toks = tokens("text")
    n = F.size(F.col("toks"))
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))).alias("t1"),
    )
    base = (
        t.documents.select(F.col("doc_id"), F.col("lang"), toks.alias("toks"))
        .select("doc_id", "lang", F.explode(zipped).alias("z"))
        .filter(F.col("z.t1").isNotNull())
        .select(
            "doc_id", "lang",
            hash_fn(F.concat(F.col("z.t0"), F.lit(" "), F.col("z.t1"))).alias("bh"),
            hash_fn(F.col("z.t1")).alias("wh"),
        )
    )
    return base.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n"), F.sum(F.col("bh") + F.col("wh")).alias("s")
    )


# ---------------------------------------------------------------- q12
def q12_current():
    from memvid_spark.operators import search
    return search.bm25_topk(docs, ["hash", "join", "vector"], k=10)


def q12_onepass():
    from memvid_spark.operators.search import BM25_K1, BM25_B
    terms = sorted({"hash", "join", "vector"})
    toks = tokens("text")
    per = docs.select(
        F.col("doc_id"),
        F.size(toks).alias("dl"),
        *[
            F.size(F.filter(toks, lambda x, tt=tt: x == F.lit(tt)))
            .alias(f"tf{i}")
            for i, tt in enumerate(terms)
        ],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    k1, b = BM25_K1, BM25_B
    sc = per.crossJoin(F.broadcast(stats))
    w_terms = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
        )
        wi = F.when(
            F.col(f"tf{i}") > 0,
            idf * (F.col(f"tf{i}") * (k1 + 1))
            / (F.col(f"tf{i}") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        w_terms = wi if w_terms is None else w_terms + wi
    scored = (
        sc.withColumn("score", F.round(w_terms, 6))
        .filter(F.col("score") > 0)  # only docs matching >=1 term rank
        .select("doc_id", "score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)


EXPERIMENTS = {
    "q145_current": q145_current,
    "q145_onepass": q145_onepass,
    "q145_onepass_xx": q145_onepass_xx,
    "q158_current": q158_current,
    "q158_pass_md5": lambda: q158_corpus_pass(hash64),
    "q158_pass_xx": lambda: q158_corpus_pass(
        lambda c: F.xxhash64(c)),
    "q12_current": q12_current,
    "q12_onepass": q12_onepass,
}

for name, mk in EXPERIMENTS.items():
    if WHICH and name not in WHICH:
        continue
    try:
        timed(name, mk)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: FAILED {exc!r}", flush=True)
spark.stop()
