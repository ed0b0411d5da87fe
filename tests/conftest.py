"""Shared pytest fixtures: one local SparkSession per test run and a
DuckDB oracle harness that replicates the driver's correctness compare."""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
    from memvid_spark.session import get_spark

    s = get_spark("memvid-spark-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison (exact, not approx —
    the driver hashes values, so our gate must be exact equality)."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def rows_key(cols, rows):
    """Sort columns by name (as the driver does) then sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    ), [cols[i] for i in order]


def assert_oracle_match(spark_df, con, sql, name=""):
    s_rows = spark_df.collect()
    s_cols = spark_df.columns
    res = con.sql(sql)
    d_cols = res.columns
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column names differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    sk, _ = rows_key(s_cols, [tuple(r) for r in s_rows])
    dk, _ = rows_key(d_cols, d_rows)
    assert len(sk) == len(dk), f"{name}: row count {len(sk)} vs {len(dk)}"
    for i, (a, b) in enumerate(zip(sk, dk)):
        assert a == b, f"{name}: row {i} differs:\n  spark : {a}\n  duckdb: {b}"
