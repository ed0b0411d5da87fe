"""Scale probes for the round-12 touched family only — same
min-of-2-samples + cpu_s methodology as bench.py's probe sections,
against the cached 10x/100x blowups. Usage:
    python scratch/probe_family_r12.py [10x|100x|both] [q..,q..]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _timed_probe
from memvid_spark.session import get_spark
from memvid_spark import registry

MODE = sys.argv[1] if len(sys.argv) > 1 else "both"
DEFAULT = [
    "q21_simhash_near_dups", "q22_minhash_lsh", "q109_clean_corpus_pipeline",
    "q145_passage_dedup", "q158_lm_perplexity", "q161_quality_classifier",
    "q66_semantic_rerank",
]
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    spark = get_spark("probe-family-r12")
    qs = {s.name: s.fn for s in registry.SPECS}
    extras = {}
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()
    dirs = []
    if MODE in ("10x", "both"):
        dirs.append(("probe10x", os.path.join(ROOT, "scratch", "probe10x")))
    if MODE in ("100x", "both"):
        dirs.append(("probe100x", os.path.join(ROOT, "scratch", "probe100x")))
    for prefix, d in dirs:
        spark.read.parquet(os.path.join(d, "documents.parquet")).count()
        for name in NAMES:
            _timed_probe(extras, f"{prefix}:{name}", qs[name], spark, d)
            print(json.dumps({k: v for k, v in extras.items()
                              if k.startswith(f"{prefix}:{name}")}),
                  flush=True)
    print("FINAL " + json.dumps(extras), flush=True)


if __name__ == "__main__":
    main()
