"""Interleaved A/B: tokens() as HOF filter(split(lower)) [current] vs
array_remove(split(lower), '') [candidate] — identical output arrays
(split with '+' quantifier can only yield ''-elements at the ends, and
array_remove drops exactly the ''s, no nulls exist). HOF filter is
CodegenFallback (interpreted per element, excluded from whole-stage
codegen); array_remove has codegen.

Two consumption shapes, interleaved (old,new) x rounds, min-vs-min:
  explode:   explode(toks) -> groupBy(doc_id).count   (q21/q22/q145/q158)
  array:     size(toks) + stopword membership          (gates/q40 shape)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _spark_cpu_s
from memvid_spark.session import get_spark
from memvid_spark.functions.text import tokens, TOKEN_SPLIT_RE

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main():
    spark = get_spark("ab-tokenize-ar")
    docs = spark.read.parquet(
        "/root/repo/scratch/probe100x/documents.parquet"
    )
    docs.count()
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()

    split_arr = F.split(F.lower(F.col("text")), TOKEN_SPLIT_RE)
    variants = {
        "hof": tokens("text"),
        "ar": F.array_remove(split_arr, ""),
    }

    def explode_q(tk):
        return (
            docs.select("doc_id", F.explode(tk).alias("t"))
            .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        )

    def array_q(tk):
        return docs.select(F.size(tk).alias("n")).agg(F.sum("n"))

    best = {}
    for r in range(ROUNDS):
        for shape, q in (("explode", explode_q), ("array", array_q)):
            for lbl, tk in variants.items():
                c0 = _spark_cpu_s()
                t0 = time.perf_counter()
                q(tk).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                dc = _spark_cpu_s() - c0
                k = f"{shape}:{lbl}"
                w, c = best.get(k, (1e9, 1e9))
                best[k] = (min(w, dt), min(c, dc))
                print(f"r{r} {k:16s} wall {dt:6.2f} cpu {dc:6.1f}", flush=True)
    print("--- min-vs-min ---")
    for k, (w, c) in sorted(best.items()):
        print(f"{k:16s} wall {w:6.2f} cpu {c:6.1f}")


if __name__ == "__main__":
    main()
