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


class TestSimhashFilterBeforeDedupe:
    """The banded simhash pair plan filters on exact hamming BEFORE the
    cross-band dedupe (the filter commutes with it and cuts the
    dropDuplicates exchange from the full candidate fan-out to the
    near-dup survivors).  Pin: the emitted pair set still equals the
    naive all-pairs hamming filter — the pigeonhole recall guarantee
    survived the reorder — and no pair appears twice."""

    def test_equals_all_pairs_hamming(self, spark):
        import pyspark.sql.functions as F

        from grower_spark.operators.dedup import simhash, simhash_banded_pairs

        rows = [(i, f"tok{i % 7} alpha beta gamma delta tok{i % 3}")
                for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = simhash_banded_pairs(
            df, bits=32, bands=8, max_hamming=6, combo=2
        ).select("id_a", "id_b", "hamming")
        h = simhash(df, "text", 32, "md5").select("doc_id", "simhash")
        a = h.selectExpr("doc_id id_a", "simhash sa")
        b = h.selectExpr("doc_id id_b", "simhash sb")
        naive = (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a", "id_b",
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
            )
            .where(F.col("hamming") <= 6)
        )
        g = sorted(map(tuple, got.collect()))
        n = sorted(map(tuple, naive.collect()))
        assert g == n
        assert len(g) == len({(x, y) for x, y, _ in g})


class TestHoistedNormsBitIdentical:
    """The pair-join kernels hoist the two L2 norms to the join sides;
    the division order dot / (norm_a * norm_b) is kept, so the floats
    must be BIT-identical to the composed cosine() — not just close."""

    def test_dot_over_norms_equals_cosine(self, spark):
        import pyspark.sql.functions as F

        from grower_spark.operators.similarity import (
            cosine, dot_fold, l2_norm,
        )

        rows = [(i, [((i * 37 + j * 11) % 97) / 19.0 - 2.5
                     for j in range(16)]) for i in range(50)]
        df = spark.createDataFrame(rows, "vec_id long, v array<double>")
        a = df.selectExpr("vec_id ia", "v va").withColumn(
            "na", l2_norm(F.col("va")))
        b = df.selectExpr("vec_id ib", "v vb").withColumn(
            "nb", l2_norm(F.col("vb")))
        pairs = a.join(b, F.col("ia") < F.col("ib"))
        out = pairs.select(
            (dot_fold(F.col("va"), F.col("vb"))
             / (F.col("na") * F.col("nb"))).alias("hoisted"),
            cosine(F.col("va"), F.col("vb")).alias("composed"),
        ).collect()
        assert all(r["hoisted"] == r["composed"] for r in out)  # bitwise


class TestDriftGateBaselineFused:
    """The drift-gate baseline derives its share divisor from a window
    sum over the histogram (one events scan) instead of a separate
    ref.count() pass, and is localCheckpoint-ed before entering the
    stream (a batch side of a stream-batch join re-executes per
    micro-batch).  Pin: the window-sum share is BIT-identical to the
    count-based share, and the materialized baseline's plan carries no
    scan lineage for the micro-batches to re-run."""

    def test_window_sum_share_bit_equals_count_share(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        rows = [(i % 7,) for i in range(997)]
        ref = spark.createDataFrame(rows, "bin long")
        hist = ref.groupBy("bin").agg(F.count(F.lit(1)).alias("_n"))
        total = ref.count()
        old = {
            r["bin"]: r["share_old"]
            for r in hist.select(
                "bin",
                (F.col("_n") / F.lit(float(max(total, 1)))).alias(
                    "share_old"),
            ).collect()
        }
        new = {
            r["bin"]: r["share_old"]
            for r in hist.select(
                "bin",
                (
                    F.col("_n")
                    / F.greatest(
                        F.sum("_n").over(Window.partitionBy())
                        .cast("double"),
                        F.lit(1.0),
                    )
                ).alias("share_old"),
            ).collect()
        }
        assert old == new  # bitwise: same float division operands

    def test_baseline_is_materialized_before_the_stream(self, spark):
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        df = spark.createDataFrame([(1,), (2,)], "bin long")
        hist = df.groupBy("bin").agg(F.count(F.lit(1)).alias("_n"))
        baseline = hist.select(
            "bin",
            (F.col("_n")
             / F.sum("_n").over(Window.partitionBy()).cast("double")
             ).alias("share_old"),
        ).localCheckpoint()
        plan = baseline._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan
        assert "HashAggregate" not in plan
