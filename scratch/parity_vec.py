from pyspark.sql import SparkSession, functions as F
import duckdb
spark = (SparkSession.builder.master("local[4]").appName("p").config("spark.ui.enabled","false")
         .config("spark.sql.shuffle.partitions","4").getOrCreate())
spark.conf.set("spark.sql.session.timeZone","UTC")
con = duckdb.connect()
d = "/root/testdata/sf0.001"
emb = spark.read.parquet(f"{d}/embeddings.parquet")
import sys; sys.path.insert(0,"/root/repo")
from memvid_spark.functions.vector import cosine, dot, norm

q = [float(x) for x in emb.filter(F.col("vec_id")==0).collect()[0].embedding]
s = (emb.filter(F.col("vec_id")<20).select("vec_id", F.round(cosine("embedding", q),6).alias("sim"))
     .orderBy("vec_id").collect())
dk = con.sql(f"""
WITH q AS (SELECT embedding::double[] AS qv FROM read_parquet('{d}/embeddings.parquet') WHERE vec_id=0)
SELECT vec_id, round(
  list_dot_product(embedding::double[], qv) /
  nullif(sqrt(list_dot_product(embedding::double[], embedding::double[])) * sqrt(list_dot_product(qv,qv)),0)
,6) AS sim
FROM read_parquet('{d}/embeddings.parquet'), q WHERE vec_id<20 ORDER BY vec_id""").fetchall()
sp = [(r.vec_id, r.sim) for r in s]
du = [tuple(r) for r in dk]
print("cosine parity:", sp == du)
for a,b in zip(sp,du):
    if a!=b: print("  diff", a, b)

# simhash oracle CTE parity vs engine
from memvid_spark.operators.dedup import simhash_table
docs = spark.read.parquet(f"{d}/documents.parquet").filter(F.col("doc_id")<50)
sh = simhash_table(docs).orderBy("doc_id").collect()
dsh = con.sql(f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), t -> t<>'')) AS tok
  FROM read_parquet('{d}/documents.parquet') WHERE doc_id<50
), post AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok
), hashed AS (
  SELECT doc_id, tf, ('0x'||substr(md5(tok),1,15))::bigint AS h FROM post
), votes AS (
  SELECT doc_id, j, sum(tf * (((h >> j) & 1) * 2 - 1)) AS v
  FROM hashed, unnest(generate_series(0,31)) AS t(j) GROUP BY doc_id, j
)
SELECT doc_id, sum(CASE WHEN v > 0 THEN cast(pow(2,j) AS bigint) ELSE 0 END) AS simhash
FROM votes GROUP BY doc_id ORDER BY doc_id""").fetchall()
print("simhash parity:", [(r.doc_id, r.simhash) for r in sh] == [tuple(r) for r in dsh])

# shingle parity
from memvid_spark.operators.dedup import shingles
shg = shingles(docs).orderBy("doc_id","shingle").collect()
dshg = con.sql(f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text),'[^a-z0-9]+'), x -> x<>'') AS toks
  FROM read_parquet('{d}/documents.parquet') WHERE doc_id<50
)
SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
FROM t, unnest(generate_series(1, greatest(len(toks)-2,0))) AS g(i)
ORDER BY doc_id, shingle""").fetchall()
print("shingles parity:", [(r.doc_id,r.shingle) for r in shg] == [tuple(r) for r in dshg], len(shg), len(dshg))
spark.stop()
