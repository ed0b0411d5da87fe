import os, sys, time
sys.path.insert(0, "/root/repo")
MODE = sys.argv[1]  # base | tuned
DATA = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/scratch/probe100x"
from memvid_spark.session import get_spark
spark = get_spark(f"ab-confs-{MODE}")
if MODE == "tuned":
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
from memvid_spark import catalog, registry
t = catalog.load(spark, DATA)
QS = {s.name: s.fn for s in registry.SPECS}
def release():
    for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        rdd.unpersist(False)
def cpu():
    tck = os.sysconf("SC_CLK_TCK"); tot = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit(): continue
        try:
            with open(f"/proc/{pid}/cmdline","rb") as f: cmd=f.read()
            if (b"SparkSubmit" not in cmd and b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd): continue
            with open(f"/proc/{pid}/stat") as f: parts=f.read().rsplit(")",1)[1].split()
            tot += (int(parts[11])+int(parts[12])+int(parts[13])+int(parts[14]))/tck
        except (OSError,IndexError,ValueError): continue
    return tot
spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").write.mode("overwrite").format("noop").save()
for name in ("q22_minhash_lsh", "q146_dedup_survivors", "q158_lm_perplexity"):
    best_w = best_c = None
    for _ in range(2):
        c0,t0 = cpu(), time.perf_counter()
        QS[name](spark, DATA).write.mode("overwrite").format("noop").save()
        w,c = time.perf_counter()-t0, cpu()-c0
        release()
        best_w = w if best_w is None else min(best_w, w)
        best_c = c if best_c is None else min(best_c, c)
    print(f"{MODE} {name}: wall {best_w:6.1f}s cpu {best_c:7.1f}s", flush=True)
spark.stop()
