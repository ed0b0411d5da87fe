from pyspark.sql import SparkSession, functions as F
import duckdb
spark = (SparkSession.builder.master("local[4]").appName("parity")
         .config("spark.sql.shuffle.partitions","4")
         .config("spark.ui.enabled","false").getOrCreate())
spark.conf.set("spark.sql.session.timeZone","UTC")
con = duckdb.connect()
d = "/root/testdata/sf0.001"
docs = spark.read.parquet(f"{d}/documents.parquet")
s = docs.select(F.col("doc_id"), F.conv(F.substring(F.md5(F.col("text")),1,15),16,10).cast("long").alias("h")).orderBy("doc_id").limit(5).collect()
dk = con.sql(f"select doc_id, ('0x'||substr(md5(text),1,15))::bigint h from '{d}/documents.parquet' order by doc_id limit 5").fetchall()
print("hash64:", [r.h for r in s] == [r[1] for r in dk])
s2 = spark.createDataFrame([(123456789,987654321)],"a long, b long").select(F.expr("a ^ b").alias("x"), F.bit_count(F.expr("a ^ b")).alias("bc"), F.shiftright("a",3).alias("sr")).collect()[0]
d2 = con.sql("select xor(123456789,987654321), bit_count(xor(123456789,987654321)::bigint), 123456789 >> 3").fetchall()[0]
print("bitops:", (s2.x,s2.bc,s2.sr) == d2)
s3 = spark.range(1,5).select(F.round(F.exp(F.log(F.col("id")*1.7)),10).alias("v")).collect()
d3 = con.sql("select round(exp(ln(range*1.7)),10) v from range(1,5)").fetchall()
print("expln:", [r.v for r in s3]==[r[0] for r in d3])
s5 = docs.select("doc_id", F.filter(F.split(F.lower("text"),"[^a-z0-9]+"), lambda x: x != F.lit("")).alias("toks")).orderBy("doc_id").limit(5).collect()
d5 = con.sql(f"select doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x<>'') from '{d}/documents.parquet' order by doc_id limit 5").fetchall()
print("tokens:", [r.toks for r in s5]==[list(r[1]) for r in d5])
s6 = spark.read.parquet(f"{d}/orders.parquet").orderBy("o_orderkey").limit(3).select(F.date_format("o_orderdate","yyyy-MM-dd").alias("dt")).collect()
d6 = con.sql(f"select strftime(o_orderdate,'%Y-%m-%d') from '{d}/orders.parquet' order by o_orderkey limit 3").fetchall()
print("datefmt:", [r.dt for r in s6]==[r[0] for r in d6])
s7 = spark.read.parquet(f"{d}/lineitem.parquet").agg(F.round(F.sum("l_extendedprice"),2).alias("s")).collect()[0].s
d7 = con.sql(f"select round(sum(l_extendedprice),2) from '{d}/lineitem.parquet'").fetchall()[0][0]
print("sum:", s7==d7, s7, d7)
# cosine parity: spark zip_with/aggregate double vs duckdb manual
emb = spark.read.parquet(f"{d}/embeddings.parquet")
s8 = emb.orderBy("vec_id").limit(3).select("vec_id",
    F.round(F.aggregate(F.zip_with(F.col("embedding").cast("array<double>"), F.col("embedding").cast("array<double>"), lambda a,b: a*b), F.lit(0.0), lambda acc,x: acc+x), 6).alias("dp")).collect()
d8 = con.sql(f"""select vec_id, round(list_sum(list_transform(embedding::double[], x -> x*x)),6) from '{d}/embeddings.parquet' order by vec_id limit 3""").fetchall()
print("dotprod:", [(r.vec_id,r.dp) for r in s8]==[tuple(r) for r in d8], s8, d8)
spark.stop()
