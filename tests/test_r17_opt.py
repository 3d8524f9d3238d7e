"""Focused pins for the r17 optimization round's operator-internal
changes (OPTIMIZATION_r17.md): each test pins the specific contract an
optimization relies on, so a later refactor cannot silently undo it."""

import os

import pytest


class TestStreamStatePartitions:
    """The streaming replay rows size their state partitions from input
    bytes (scale-adaptive, guide §2.2), not the session core count."""

    def test_small_input_gets_few_partitions(self, spark):
        from grower_spark.session import stream_state_partitions

        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # a 1.2 MB replay (the sf0.1 drift gate) needs 2, not `cap`
        assert stream_state_partitions(spark, 1_200_000) == 2
        # the sf0.1 funnel replay (~10 MB) lands in the measured
        # 8-16 optimum, never above the session cap
        got = stream_state_partitions(spark, 10_000_000)
        assert 8 <= got <= max(16, cap)

    def test_large_input_hits_session_cap(self, spark):
        from grower_spark.session import stream_state_partitions

        cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # a production-sized stream is never throttled below the
        # session's (cluster-sized) shuffle parallelism
        assert stream_state_partitions(spark, 500 * 1024**3) == cap

    def test_env_override_wins(self, spark, monkeypatch):
        from grower_spark.session import stream_state_partitions

        monkeypatch.setenv("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "7")
        assert stream_state_partitions(spark, 1) == 7

    def test_conf_restored_after_replay(self, spark):
        """The replay rows scope the shuffle-partition override to the
        stream and must restore the session value afterwards."""
        from grower_spark.driver_queries import QUERIES

        sf = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
        if not os.path.isdir(sf):
            pytest.skip("no testdata")
        before = spark.conf.get("spark.sql.shuffle.partitions")
        QUERIES["streaming_drift_gate"](spark, sf).count()
        assert spark.conf.get("spark.sql.shuffle.partitions") == before
