from memvid_spark.session import get_spark

spark = get_spark("cpuprobe")
sc = spark.sparkContext

def totals():
    store = sc._jsc.sc().statusStore()
    stages = store.stageList(sc._jvm.java.util.ArrayList())
    tot_run = 0.0
    tot_cpu = 0.0
    for i in range(stages.size()):
        s = stages.apply(i)
        tot_run += s.executorRunTime()
        tot_cpu += s.executorCpuTime()
    return tot_run / 1e3, tot_cpu / 1e9  # run ms->s, cpu ns->s

a = totals()
spark.range(200_000_000).selectExpr("sum(id*2)").collect()
b = totals()
print("RESULT run_s delta:", round(b[0]-a[0],3), "cpu_s delta:", round(b[1]-a[1],3))
