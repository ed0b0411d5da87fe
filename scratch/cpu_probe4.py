import os, time

from memvid_spark.session import get_spark

spark = get_spark("cpuprobe")
sc = spark.sparkContext

def jvm_cpu_s():
    mx = sc._jvm.java.lang.management.ManagementFactory.getOperatingSystemMXBean()
    return mx.getProcessCpuTime() / 1e9

def py_workers_cpu_s():
    tck = os.sysconf("SC_CLK_TCK")
    tot = 0.0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read()
            if b"pyspark.daemon" not in cmd and b"pyspark.worker" not in cmd:
                continue
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            tot += (int(parts[11]) + int(parts[12])) / tck  # utime+stime
        except (OSError, IndexError, ValueError):
            continue
    return tot

a = jvm_cpu_s() + py_workers_cpu_s()
t0 = time.perf_counter()
# JVM-side work
spark.range(200_000_000).selectExpr("sum(id*2)").collect()
# Python-worker work
spark.range(2_000_000, numPartitions=32).mapInPandas(
    lambda it: ((p.assign(id=p["id"] * 2) for p in it)), "id long"
).write.mode("overwrite").format("noop").save()
wall = time.perf_counter() - t0
b = jvm_cpu_s() + py_workers_cpu_s()
print("RESULT wall:", round(wall, 2), "cpu_s:", round(b - a, 2))
