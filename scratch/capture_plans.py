"""Capture .explain('formatted') for the headline + probe queries into
plans/r11/<query>_<tag>.txt (tag = before/after). Driver-side only; no
actions are run (except the tiny catalog reads Spark needs to resolve
schemas), so it is cheap and load-insensitive."""

import os
import sys

sys.path.insert(0, "/root/repo")

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_PLAN_OUT", "/root/repo/plans/r12")

from memvid_spark.session import get_spark  # noqa: E402
from memvid_spark import registry  # noqa: E402

NAMES = [
    "q01_pricing_summary", "q03_star_join_revenue", "q04_topk_per_group",
    "q12_bm25_topk", "q16_rrf_fusion", "q21_simhash_near_dups",
    "q22_minhash_lsh", "q30_knn_cosine", "q31_knn_join",
    "q33_knn_pandas_kernel", "q51_hourly_rollup", "q52_current_state",
    "q54_sessionize", "q66_semantic_rerank", "q81_structure_blocks",
    "q84_sheet_tables", "q94_decontamination", "q97_event_pair_rangejoin",
    "q109_clean_corpus_pipeline",
    # heavy scale-probe family
    "q145_passage_dedup", "q146_dedup_survivors", "q158_lm_perplexity",
    "q161_quality_classifier", "q179_semdedup_autok", "q152_heavy_hitters",
    "q175_ivfpq",
]

os.makedirs(OUT, exist_ok=True)
spark = get_spark("plan-capture")
qs = {s.name: s.fn for s in registry.SPECS}
for name in (ONLY or NAMES):
    try:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # noqa: BLE001 — record the failure, keep going
        plan = f"EXPLAIN FAILED: {exc!r}"
    with open(os.path.join(OUT, f"{name}_{TAG}.txt"), "w") as f:
        f.write(plan)
    print(f"captured {name} ({len(plan)} chars)")
spark.stop()
