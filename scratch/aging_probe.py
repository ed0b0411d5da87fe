"""Quantify in-session tail inflation and test remedies.

Times a probe query in a fresh session, ages the session with ~40 heavy
queries (the bench shape), re-times the probe, then applies candidate
remedies (driver GC to kick ContextCleaner; clearCache) and re-times.
"""

import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, "/root/repo")

from memvid_spark import registry
from memvid_spark.session import get_spark

SF = "/root/testdata/sf0.1"
qs = {s.name: s.fn for s in registry.SPECS}
spark = get_spark("aging-probe")


def release(spark) -> None:
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)


def t(name: str) -> float:
    t0 = time.perf_counter()
    qs[name](spark, SF).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    release(spark)
    return round(dt, 2)


PROBES = ["q124_audio_features", "q22_minhash_lsh", "q66_semantic_rerank"]

print("== fresh session ==")
for p in PROBES:
    print(f"cold {p}: {t(p)}")
for p in PROBES:
    print(f"warm {p}: {t(p)}")

AGE = [
    "q01_pricing_summary", "q03_star_join_revenue", "q04_topk_per_group",
    "q12_bm25_topk", "q16_rrf_fusion", "q21_simhash_near_dups",
    "q30_knn_cosine", "q31_knn_join", "q33_knn_pandas_kernel",
    "q51_hourly_rollup", "q52_current_state", "q54_sessionize",
    "q81_structure_blocks", "q84_sheet_tables", "q94_decontamination",
    "q97_event_pair_rangejoin", "q109_clean_corpus_pipeline",
    "q113_tfidf_keywords", "q115_hnsw_recall", "q34_pq_recall",
    "q35_ivf_knn", "q168_sq8_knn", "q175_ivfpq", "q121_image_features",
    "q126_video_manifest", "q128_jpeg_pixels", "q163_flac_roundtrip",
    "q166_tiff_pixels", "q172_tar_ingest", "q173_pdf_table_extract",
    "q144_semdedup", "q145_passage_dedup", "q146_dedup_survivors",
    "q147_dsir_weights", "q152_heavy_hitters", "q158_lm_perplexity",
    "q161_quality_classifier", "q176_sketch_entries",
    "q177_sketch_candidates",
]
print(f"== aging with {len(AGE)} queries ==")
t0 = time.perf_counter()
for n in AGE:
    t(n)
print(f"aging took {time.perf_counter()-t0:.0f}s")

print("== aged session ==")
for p in PROBES:
    print(f"aged {p}: {t(p)}")

print("== remedy: driver System.gc() (kicks ContextCleaner) ==")
spark.sparkContext._jvm.System.gc()
time.sleep(8)
for p in PROBES:
    print(f"postgc {p}: {t(p)}")

print("== remedy: catalog.clearCache + gc ==")
spark.catalog.clearCache()
spark.sparkContext._jvm.System.gc()
time.sleep(8)
for p in PROBES:
    print(f"postclear {p}: {t(p)}")

spark.stop()
