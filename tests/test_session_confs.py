"""Session-conf pins: the partition-discovery threshold raise (round 11
maintenance-listing fix) is applied by configure() and stays
env-parameterizable for cluster deployments."""

from memvid_spark.session import configure

KEY = "spark.sql.sources.parallelPartitionDiscovery.threshold"


def test_partition_discovery_threshold_applied(spark):
    # the shared fixture session went through get_spark -> configure
    assert spark.conf.get(KEY) == "65536"


def test_partition_discovery_threshold_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PARTITION_DISCOVERY_THRESHOLD", "32")
    try:
        configure(spark)
        assert spark.conf.get(KEY) == "32"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_PARTITION_DISCOVERY_THRESHOLD")
        configure(spark)
        assert spark.conf.get(KEY) == "65536"
