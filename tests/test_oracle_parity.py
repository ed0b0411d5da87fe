"""The local mirror of the driver's correctness gate: every registry query
must hash-match its DuckDB oracle at the test scale factor."""

from __future__ import annotations

import pytest

from memvid_spark import registry
from tests.conftest import SF_DIR, assert_oracle_match

PARAMS = [s for s in registry.SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", PARAMS, ids=[s.name for s in PARAMS])
def test_query_matches_oracle(spark, oracle, spec):
    df = spec.fn(spark, SF_DIR)
    assert_oracle_match(df, oracle, spec.oracle, name=spec.name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


def test_queries_and_oracles_aligned():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert q, "no queries registered"
