"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``memvid_spark``; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from memvid_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hybrid retrieval —
    lexical TF list + BM25 list fused with reciprocal-rank fusion
    (the reference's ask() fusion core, src/memvid/ask.rs:1381-1432)."""
    from pyspark.sql import functions as F

    from memvid_spark import catalog
    from memvid_spark.operators import rrf, search

    sf_dir = "/root/testdata/sf0.001"
    t = catalog.load(spark, sf_dir)
    lex = rrf.with_rank(
        search.lex_topk(t.documents, ["hash", "join"], phrase="hash join", k=20),
        [F.col("score").desc(), F.col("doc_id").asc()],
    )
    bm25 = rrf.with_rank(
        search.bm25_topk(t.documents, ["hash", "join", "vector"], k=20),
        [F.col("score").desc(), F.col("doc_id").asc()],
    )
    return rrf.rrf_fuse([lex, bm25], k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query."""
    return registry.all_oracles()
