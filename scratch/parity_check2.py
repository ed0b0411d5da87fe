from pyspark.sql import SparkSession, functions as F
import duckdb
spark = (SparkSession.builder.master("local[4]").appName("parity")
         .config("spark.sql.shuffle.partitions","4")
         .config("spark.ui.enabled","false").getOrCreate())
# simulate driver session: set runtime confs AFTER getOrCreate
spark.conf.set("spark.sql.session.timeZone","UTC")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong","true")
con = duckdb.connect()
d = "/root/testdata/sf0.001"
ev = spark.read.parquet(f"{d}/events.parquet")
ev.printSchema()
s4 = ev.orderBy("event_id").limit(3).select((F.col("ts")/F.lit(1000)).cast("long").alias("us"),
     F.date_format(F.timestamp_micros(F.expr("ts div 1000")), "yyyy-MM-dd HH:00:00").alias("hr")).collect()
d4 = con.sql(f"select epoch_us(ts), strftime(date_trunc('hour',ts),'%Y-%m-%d %H:00:00') from '{d}/events.parquet' order by event_id limit 3").fetchall()
print("epoch_us:", [r.us for r in s4]==[r[0] for r in d4], "hour:", [r.hr for r in s4]==[r[1] for r in d4])
print(s4, d4)
spark.stop()
