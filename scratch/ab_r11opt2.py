"""Post-commit quiet-window A/B: the committed one-pass operators vs
reconstructions of the r10 shapes, at the 100x blowup. Also times the
full q158/q12/q170 queries through the registry."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark import catalog, registry  # noqa: E402
from memvid_spark.functions.text import tokens  # noqa: E402
from memvid_spark.functions.hashing import hash64  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/probe100x"
WHICH = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark("ab-r11opt2")
t = catalog.load(spark, DATA)
docs = t.documents.select("doc_id", "text")
QS = {s.name: s.fn for s in registry.SPECS}


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


# ---- old q158 (md5 join keys), reconstructed -------------------------
def q158_old_hashes():
    from memvid_spark.operators.traindata import LM_BACKOFF, LM_SCALE
    from pyspark.sql import Window

    id_col, group_col = "doc_id", "lang"
    src = t.documents
    toks = tokens("text")
    n = F.size(F.col("toks"))
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(n - 1, F.lit(0))).alias("t1"),
    )

    def _bigram_pass(s, *cols, strings: bool):
        out = [
            hash64(F.concat(F.col("z.t0"), F.lit(" "), F.col("z.t1"))).alias("bh"),
            hash64(F.col("z.t1")).alias("wh"),
        ]
        if strings:
            out = [F.col("z.t0").alias("t0"), F.col("z.t1").alias("t1")] + out
        return (
            s.select(*cols, toks.alias("toks"))
            .select(*cols, F.explode(zipped).alias("z"))
            .filter(F.col("z.t1").isNotNull())
            .select(*cols, *out)
        )

    ref = _bigram_pass(src.filter(F.col("lang") == "en"), F.col(id_col),
                       strings=True).localCheckpoint()
    base = _bigram_pass(src, F.col(id_col), F.col(group_col), strings=False)
    c2 = ref.groupBy("t0", "t1", "bh").agg(F.count("*").alias("c2"))
    c1ctx = c2.groupBy(F.col("t0").alias("prev")).agg(F.sum("c2").alias("c1ctx"))
    bg_model = c2.join(c1ctx, c2.t0 == c1ctx.prev).select(
        "bh",
        F.round(F.log(F.col("c2") / F.col("c1ctx")) * LM_SCALE).cast("long").alias("lp2_micro"),
    )
    c1 = ref.groupBy(F.col("t1").alias("w"), F.col("wh").alias("uwh")).agg(
        F.count("*").alias("c1"))
    totals = c1.agg(F.sum("c1").alias("_T"), F.count("*").alias("_V"))
    ug_model = c1.join(F.broadcast(totals)).select(
        F.col("uwh").alias("wh"),
        F.round((F.log(F.lit(LM_BACKOFF)) + F.log((F.col("c1") + 1) / (F.col("_T") + F.col("_V")))) * LM_SCALE).cast("long").alias("lp1_micro"),
    )
    scored = (
        base.join(bg_model, "bh", "left")
        .join(ug_model, "wh", "left")
        .join(F.broadcast(totals))
        .withColumn("lp_micro", F.coalesce(
            "lp2_micro", "lp1_micro",
            F.round((F.log(F.lit(LM_BACKOFF)) - F.log(F.col("_T") + F.col("_V"))) * LM_SCALE).cast("long")))
        .groupBy(id_col, group_col)
        .agg(F.count("*").alias("n_big"), F.sum("lp_micro").alias("lp_sum_micro"))
    )
    ratio = F.col("lp_sum_micro") / F.col("n_big")
    scored = scored.withColumn("avg_lp", ratio / F.lit(LM_SCALE))
    w = Window.partitionBy(group_col).orderBy(ratio.desc(), F.asc(id_col))
    cnt = Window.partitionBy(group_col)
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(cnt))
        .select(id_col, group_col, "n_big", "lp_sum_micro",
                F.round("avg_lp", 6).alias("avg_lp"),
                F.when(F.col("_rk") * 3 <= F.col("_n"), F.lit("head"))
                .when(F.col("_rk") * 3 <= F.col("_n") * 2, F.lit("middle"))
                .otherwise(F.lit("tail")).alias("bucket"))
    )


# ---- old q12 (postings + dl join), reconstructed ---------------------
def q12_old():
    from memvid_spark.operators.search import (
        BM25_K1, BM25_B, build_postings, doc_lengths)

    terms_lc = sorted({"hash", "join", "vector"})
    post = build_postings(docs, "doc_id", "text", vocab=terms_lc)
    dl = doc_lengths(docs, "doc_id", "text")
    stats = docs.agg(F.count("*").alias("n_docs"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    df_tbl = post.groupBy("token").agg(F.count("*").alias("df"))
    k1, b = BM25_K1, BM25_B
    scored = (
        post.join(F.broadcast(df_tbl), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(avgdl))
        .withColumn("idf", F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)))
        .withColumn("w", F.col("idf") * (F.col("tf") * (k1 + 1)) / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(10)


EXPERIMENTS = {
    "q158_new": lambda: QS["q158_lm_perplexity"](spark, DATA),
    "q158_old_hashes": q158_old_hashes,
    "q145_new": lambda: QS["q145_passage_dedup"](spark, DATA),
    "q12_new": lambda: QS["q12_bm25_topk"](spark, DATA),
    "q12_old": q12_old,
    "q109_new": lambda: QS["q109_clean_corpus_pipeline"](spark, DATA),
    "q161_cur": lambda: QS["q161_quality_classifier"](spark, DATA),
    "q146_cur": lambda: QS["q146_dedup_survivors"](spark, DATA),
}

for name, mk in EXPERIMENTS.items():
    if WHICH and name not in WHICH:
        continue
    try:
        timed(name, mk)
    except Exception as exc:  # noqa: BLE001
        print(f"{name}: FAILED {exc!r}", flush=True)
spark.stop()
