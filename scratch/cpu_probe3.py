from memvid_spark.session import get_spark

spark = get_spark("cpuprobe")
sc = spark.sparkContext
jvm = sc._jvm

def totals():
    store = sc._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    stages = store.stageList(
        empty,
        store.stageList__default__2() if False else False,
        False,
        store.stageList__default__4() if False else None,
        empty,
    )
    tot_run, tot_cpu = 0.0, 0.0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        tot_run += s.executorRunTime()
        tot_cpu += s.executorCpuTime()
    return tot_run / 1e3, tot_cpu / 1e9

a = totals()
spark.range(200_000_000).selectExpr("sum(id*2)").collect()
b = totals()
print("RESULT run_s:", round(b[0]-a[0],3), "cpu_s:", round(b[1]-a[1],3))
