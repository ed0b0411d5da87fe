"""Bucketed co-located joins — the 100 TB join strategy the brief calls
out. Writing both sides bucketed by the join key lets Spark join them
with ZERO shuffle exchanges (SortMergeJoin reads co-located buckets);
this is the warehouse layout the registry's chunk→parent and
frame→embedding joins would use at scale, where the derived tables are
written once and joined many times (SURVEY §4 derived-table model)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_tables(spark):
    # warehouse dir is a static conf; tables land in the session default
    # and are dropped on teardown
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    emb = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.array(*[(F.col("id") % (j + 3)).cast("double") for j in range(4)])
        .alias("embedding"),
    )
    spark.sql("DROP TABLE IF EXISTS bdocs")
    spark.sql("DROP TABLE IF EXISTS bemb")
    (docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
     .saveAsTable("bdocs"))
    (emb.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
     .saveAsTable("bemb"))
    yield "bdocs", "bemb"
    spark.sql("DROP TABLE IF EXISTS bdocs")
    spark.sql("DROP TABLE IF EXISTS bemb")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    a, b = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(a).join(spark.table(b), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: the join must not exchange either side
        assert "Exchange" not in plan, plan
        assert joined.count() == 2000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles_both_sides(spark, bucketed_tables):
    """Control: the same join over plain frames DOES exchange — the
    bucket layout, not the data, is what removes the shuffle."""
    a, _ = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.table(a).select("doc_id", "text")
        other = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
        joined = plain.join(other, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
