"""Run every oracle SQL via DuckDB at sf0.001 and flag any result column whose
type is not in the portable set (BIGINT/INTEGER/DOUBLE/VARCHAR/BOOLEAN/DATE/
TIMESTAMP/lists thereof). HUGEINT/DECIMAL columns hash differently in the
driver's Arrow-based comparison even when values match."""
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OK = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT", "VARCHAR",
      "BOOLEAN", "DATE"}

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

bad = 0
for name, sql in e.oracle_sql().items():
    try:
        res = con.sql(sql)
        flags = [(c, str(t)) for c, t in zip(res.columns, res.types)
                 if str(t) not in OK and not str(t).endswith("[]")]
        listf = [(c, str(t)) for c, t in zip(res.columns, res.types)
                 if str(t).endswith("[]") and str(t)[:-2] not in OK]
        flags += listf
        if flags:
            bad += 1
            print(f"{name}: {flags}")
    except Exception as ex:
        bad += 1
        print(f"{name}: ERROR {type(ex).__name__}: {str(ex)[:120]}")
print(f"== {bad} oracles with non-portable column types ==")
