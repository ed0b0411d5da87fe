#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full compute, no
driver collect) and timed wall-clock. A warmup action runs first so JVM
/ codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_star_join_revenue",
    "q04_topk_per_group",
    "q12_bm25_topk",
    "q16_rrf_fusion",
    "q21_simhash_near_dups",
    "q22_minhash_lsh",
    "q30_knn_cosine",
    "q31_knn_join",
    "q33_knn_pandas_kernel",
    "q51_hourly_rollup",
    "q52_current_state",
    "q54_sessionize",
    "q66_semantic_rerank",
    "q81_structure_blocks",
    "q84_sheet_tables",
    "q94_decontamination",
    "q97_event_pair_rangejoin",
    "q109_clean_corpus_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from memvid_spark.session import get_spark
    from memvid_spark import registry

    spark = get_spark("memvid-spark-bench")
    qs = {s.name: s.fn for s in registry.SPECS}

    # warmup: JVM, codegen, parquet footer reads
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
