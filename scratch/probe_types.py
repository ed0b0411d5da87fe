"""Print raw value types from Spark collect() vs DuckDB fetchall() for the
5 driver hash-fail queries, to find the canonicalization mismatch."""
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

SF = "/root/testdata/sf0.01"
NAMES = ["q09_corpus_stats", "q40_token_stats", "q42_lang_heuristic",
         "q54_sessionize", "q57_schema_inference"]

spark = (SparkSession.builder.master("local[8]").appName("probe")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs, os_ = e.queries(), e.oracle_sql()
for name in NAMES:
    sdf = qs[name](spark, SF)
    srows = sdf.collect()
    res = con.sql(os_[name])
    drows = res.fetchall()
    print(f"\n== {name} ==")
    print("spark schema :", sdf.dtypes)
    print("duckdb schema:", list(zip(res.columns, [str(t) for t in res.types])))
    r = sorted(tuple(x) for x in srows)[0]
    d = sorted(drows)[0]
    print("spark row0 :", [(v, type(v).__name__) for v in r])
    print("duckdb row0:", [(v, type(v).__name__) for v in d])
spark.stop()
