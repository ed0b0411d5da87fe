import sys
sys.path.insert(0, "/root/repo")
from memvid_spark.session import get_spark
from bench import _ensure_blowup
spark = get_spark("mk-blowups")
_ensure_blowup(spark, "/root/testdata/sf0.1", "/root/repo/scratch/probe10x", factor=10)
print("10x done", flush=True)
_ensure_blowup(spark, "/root/testdata/sf0.1", "/root/repo/scratch/probe100x", factor=100)
print("100x done", flush=True)
spark.stop()
