"""Round-11-opt A/B #3: q109 pin+dirty-anti-join rewrite, CC changed-fold.

Usage: python scratch/ab_r11opt3.py [data_dir] [which,which,...]
Interleaved (old,new)x3 per experiment, min-vs-min, noop sink, cpu_s.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F, Window  # noqa: E402

from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark import catalog  # noqa: E402
from memvid_spark.operators import traindata  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scratch/probe100x"
WHICH = sys.argv[2].split(",") if len(sys.argv) > 2 else None

spark = get_spark("ab-r11opt3")
t = catalog.load(spark, DATA)


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


def run_once(mk):
    c0, t0 = _cpu(), time.perf_counter()
    mk().write.mode("overwrite").format("noop").save()
    w, c = time.perf_counter() - t0, _cpu() - c0
    release()
    return w, c


def interleaved(label, mk_old, mk_new, n=3):
    olds, news = [], []
    for i in range(n):
        olds.append(run_once(mk_old))
        news.append(run_once(mk_new))
    ow = min(w for w, _ in olds)
    oc = min((c for _, c in olds if c >= 0), default=float("nan"))
    nw = min(w for w, _ in news)
    nc = min((c for _, c in news if c >= 0), default=float("nan"))
    print(f"{label}: old wall {ow:6.2f}s cpu {oc:7.1f}s | "
          f"new wall {nw:6.2f}s cpu {nc:7.1f}s  "
          f"(all old={[f'{w:.1f}/{c:.0f}' for w, c in olds]} "
          f"new={[f'{w:.1f}/{c:.0f}' for w, c in news]})", flush=True)


# ---------------------------------------------------------------- q109
def _q109_common():
    docs = t.documents.select("doc_id", "source", "lang", "text")
    gated = traindata.quality_gates(docs).filter(F.col("verdict") == "kept")
    w = Window.partitionBy(F.sha2("text", 256)).orderBy(F.col("doc_id").asc())
    dd = gated.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return docs, dd


def q109_old():
    docs, dd = _q109_common()
    cand = dd.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    decon = traindata.decontaminate(
        bench.unionByName(cand.select("doc_id", "source", "lang", "text")),
        F.col("source") == "src0",
    )
    clean_ids = decon.filter(F.col("contaminated") == 0).select("doc_id")
    clean = cand.join(clean_ids, "doc_id", "left_semi")
    labeled = traindata.split_assign(clean)
    return labeled.groupBy("split", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens")
    )


def q109_new():
    from memvid_spark.registry import all_queries
    return all_queries()["q109_clean_corpus_pipeline"](spark, DATA)


# ---------------------------------------------------------------- CC
def _cc_edges():
    # q146-shaped duplicate graph: exact-dup pairs over the corpus plus
    # synthetic near-chain edges to force >1 propagation round.
    docs = t.documents.select("doc_id", "text")
    hashed = docs.select("doc_id", F.sha2("text", 256).alias("sha"))
    pairs = (
        hashed.alias("l").join(hashed.alias("r"), "sha")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
    )
    chain = t.documents.select(
        F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b")
    ).filter(F.col("doc_id") % 7 == 0)
    return pairs.unionByName(chain).localCheckpoint()


def cc_old(edges, a_col="a", b_col="b", max_iter=20):
    und = (
        edges.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            edges.select(F.col(b_col).alias("src"),
                         F.col(a_col).alias("dst"))
        )
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("src").alias("node")).distinct()
        .withColumn("cluster", F.col("node")).localCheckpoint()
    )
    for _ in range(max_iter):
        nbr = und.join(labels, und["dst"] == labels["node"]).select(
            F.col("src").alias("node"), F.col("cluster")
        )
        new_labels = (
            labels.unionByName(nbr).groupBy("node")
            .agg(F.min("cluster").alias("cluster")).localCheckpoint()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .filter(F.col("n.cluster") != F.col("o.cluster")).count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError("no converge")


def cc_new(edges):
    from memvid_spark.operators.mesh import connected_components
    return connected_components(edges)


EXPS = {}
EXPS["q109"] = lambda: interleaved("q109", q109_old, q109_new)


def _cc_exp():
    # release() drops every persisted RDD between runs, so each timed
    # run re-mines its own edge checkpoint (identical cost both arms).
    print(f"cc edge rows: {_cc_edges().count()}", flush=True)
    interleaved("cc", lambda: cc_old(_cc_edges()),
                lambda: cc_new(_cc_edges()))
    a = sorted(map(tuple, cc_old(_cc_edges()).collect()))
    b = sorted(map(tuple, cc_new(_cc_edges()).collect()))
    print("cc equal:", a == b, flush=True)


EXPS["cc"] = _cc_exp



# ------------------------------------------------------------ q179 pin
def _q179_assigned():
    import math as _m
    from memvid_spark.operators import dedup as dd, semdedup as sd
    planted = dd.plant_near_dups(t.embeddings, every=10)
    n = planted.count()
    k = max(1, _m.ceil(n / 256))
    if k <= sd.SEM_EXACT_K_MAX:
        return sd.seed_assign(planted, k=k)
    return sd.seed_assign_scaled(planted, k=k, n_hint=n)


def q179_dups_old():
    import numpy as np
    import pandas as pd
    assigned = _q179_assigned()
    tau, max_cluster, id_col = 0.999, 4096, "vec_id"
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_m"))
    n_sub = F.greatest(F.lit(1), F.ceil(F.col("_m") / F.lit(max_cluster))).cast("long")
    assigned = (
        assigned.join(F.broadcast(sizes), "cluster")
        .withColumn("_sub", F.pmod(F.xxhash64(F.col(id_col)), n_sub))
        .drop("_m")
    )

    def cluster_dups(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        vs = pdf["v"]
        ok = vs.map(lambda a: a is not None).to_numpy()
        is_dup = np.zeros(len(pdf), dtype=bool)
        if ok.sum() >= 2:
            X = np.stack(vs[ok].to_numpy())
            sim = X @ X.T
            dup_ok = (np.triu(sim >= tau, k=1)).any(axis=0)
            is_dup[np.flatnonzero(ok)] = dup_ok
        return pd.DataFrame({id_col: pdf[id_col], "cluster": pdf["cluster"], "is_dup": is_dup})

    return assigned.groupBy("cluster", "_sub").applyInPandas(
        cluster_dups, f"{id_col} long, cluster long, is_dup boolean")


def q179_new():
    from memvid_spark.operators import dedup as dd, semdedup as sd
    planted = dd.plant_near_dups(t.embeddings, every=10)
    return sd.semdedup(planted, k=None, tau=0.999)


def _q179_exp():
    interleaved("q179", q179_dups_old, q179_new)


EXPS["q179pin"] = _q179_exp




# ------------------------------------------------------------ q161 feat
def _q161_base(with_hash):
    docs = t.documents.select("doc_id", "text")
    from memvid_spark.functions.text import tokens as _tokens
    toks = _tokens("text")
    zipped = F.arrays_zip(
        F.col("toks").alias("t0"),
        F.slice("toks", 2, F.greatest(F.size(F.col("toks")) - 1, F.lit(0))).alias("t1"),
    )
    b = (
        docs.select(F.col("doc_id"), toks.alias("toks"))
        .select(F.col("doc_id"), F.explode(zipped).alias("z"))
        .select(
            F.col("doc_id"),
            F.explode(F.array(
                F.concat(F.lit("u#"), F.col("z.t0")),
                F.when(F.col("z.t1").isNotNull(),
                       F.concat(F.lit("b#"), F.col("z.t0"), F.lit(" "), F.col("z.t1"))),
            )).alias("feat"),
        )
        .filter(F.col("feat").isNotNull())
    )
    if with_hash:
        from memvid_spark.functions.hashing import hash64 as h64
        b = b.withColumn("bucket", F.pmod(h64("feat"), F.lit(1024)))
    return b


def q161_fb_old():
    return _q161_base(True).groupBy("doc_id", "bucket").agg(
        F.count("*").alias("n_occ"))


def q161_fb_new():
    from memvid_spark.functions.hashing import hash64 as h64
    per_feat = _q161_base(False).groupBy("doc_id", "feat").agg(
        F.count("*").alias("c"))
    return (
        per_feat.withColumn("bucket", F.pmod(h64("feat"), F.lit(1024)))
        .groupBy("doc_id", "bucket").agg(F.sum("c").alias("n_occ"))
    )


def _q161_exp():
    interleaved("q161_fb", q161_fb_old, q161_fb_new)
    a = sorted(map(tuple, q161_fb_old().collect()))
    b = sorted(map(tuple, q161_fb_new().collect()))
    print("q161 fb equal:", a == b, flush=True)


EXPS["q161feat"] = _q161_exp


for name, fn in EXPS.items():
    if WHICH and name not in WHICH:
        continue
    fn()
print("done", flush=True)
