from memvid_spark.session import get_spark

spark = get_spark("cpuprobe")
sc = spark.sparkContext
store = sc._jsc.sc().statusStore()
ms = store.getClass().getMethods()
for i in range(len(ms)):
    n = ms[i].getName()
    if "stage" in n.lower() or "summary" in n.lower():
        print(ms[i].toString())
