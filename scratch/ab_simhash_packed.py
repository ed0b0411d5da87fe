"""Interleaved A/B: q21 SimHash vote aggregation — 60 per-bit ±1 sums
(current) vs 32 packed dual-lane sums (candidate).

Packing: for j in 0..31, sum((h >> j) & 0x100000001) accumulates
  lane0 = count of rows with bit j set        (bits 0..31)
  lane32 = count of rows with bit j+32 set    (bits 32..59; 60..63 are 0)
per doc. No carry between lanes while n_tokens(doc) < 2^32. The vote for
bit j is 2*cnt_j - n, and the simhash bit is 1 iff 2*cnt_j > n — exactly
the current `sum(±1) > 0`.

Usage: python scratch/ab_simhash_packed.py [rounds]
Runs (old,new) x rounds interleaved on the 100x blowup corpus, printing
wall + spark cpu_s per sample, and verifies both variants produce
IDENTICAL (doc_id, simhash) tables (full collect + compare).
"""
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _spark_cpu_s
from memvid_spark.session import get_spark
from memvid_spark.functions.text import tokens
from memvid_spark.functions.hashing import hash64

BITS = 60
MASK = (1 << 32) | 1


def simhash_old(docs):
    ex = docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("token"))
    post = ex.select(F.col("doc_id"), hash64("token").alias("h"))
    vote_aggs = [
        F.sum(F.expr(f"(((h >> {j}) & 1) * 2 - 1)")).alias(f"v{j}")
        for j in range(BITS)
    ]
    per_doc = post.groupBy("doc_id").agg(*vote_aggs)
    sim = reduce(
        lambda a, b: a + b,
        [
            F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(BITS)
        ],
    )
    return per_doc.select(F.col("doc_id"), sim.cast("long").alias("simhash"))


def simhash_new(docs):
    ex = docs.select(F.col("doc_id"), F.explode(tokens("text")).alias("token"))
    post = ex.select(F.col("doc_id"), hash64("token").alias("h"))
    aggs = [
        F.sum(F.expr(f"(h >> {j}) & {MASK}")).alias(f"s{j}") for j in range(32)
    ] + [F.count(F.lit(1)).alias("n")]
    per_doc = post.groupBy("doc_id").agg(*aggs)

    def cnt(j):
        if j < 32:
            return F.expr(f"s{j} & 4294967295")
        return F.expr(f"(s{j - 32} >> 32) & 4294967295")

    sim = reduce(
        lambda a, b: a + b,
        [
            F.when(cnt(j) * 2 > F.col("n"), F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(BITS)
        ],
    )
    return per_doc.select(F.col("doc_id"), sim.cast("long").alias("simhash"))


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab-simhash")
    blow = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scratch", "probe100x", "documents.parquet",
    )
    docs = spark.read.parquet(blow)
    docs.count()
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()

    # correctness first: identical output tables
    a = simhash_old(docs)
    b = simhash_new(docs)
    diff = a.join(b, "doc_id").filter(
        a["simhash"] != b["simhash"]
    ).count()
    na, nb = a.count(), b.count()
    print(f"rows old={na} new={nb} mismatched_simhash={diff}", flush=True)
    assert na == nb and diff == 0, "NOT EQUAL — abort"

    for r in range(rounds):
        for label, fn in (("old", simhash_old), ("new", simhash_new)):
            c0 = _spark_cpu_s()
            t0 = time.perf_counter()
            fn(docs).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            dc = _spark_cpu_s() - c0
            print(f"round {r} {label}: wall {dt:.2f}s cpu {dc:.1f}s", flush=True)


if __name__ == "__main__":
    main()
