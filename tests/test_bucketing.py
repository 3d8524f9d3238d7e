"""Bucketed co-located joins: the write-once-shuffle-never contract.

Pins the plan shape that justifies bucketing at 100 TB: after bucketBy
writes on the join key, the fact-fact equi-join plans with ZERO Exchange
(the bucketed scans provide the hash distribution) and, with sortBy,
ZERO Sort under the SortMergeJoin.  Also pins row-level equality against
the plain (shuffling) join.
"""

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.bucketing import bucketed_join, write_bucketed
from tests.conftest import SF_SMALL


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    old_wh = spark.conf.get("spark.sql.warehouse.dir", None)
    # warehouse.dir is fixed at first catalog use in a JVM; use unique
    # table names instead of relying on the dir to isolate repeated runs
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "bt_lineitem", "l_orderkey", 8)
    write_bucketed(orders, "bt_orders", "o_orderkey", 8)
    yield "bt_lineitem", "bt_orders"
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    del old_wh


def test_bucketed_join_has_no_exchange_and_no_sort(spark, bucketed_tables):
    lt, ot = bucketed_tables
    no_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Spark only consumes the buckets' sort order behind this flag (off by
    # default since SPARK-28595 because multi-file buckets break it); our
    # write guarantees one file per bucket, which is the valid case.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        if "== Initial Plan ==" in plan:
            plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # sortBy buckets: SMJ consumes the file order, no Sort node
        assert "Sort " not in plan.replace("SortMergeJoin", "SMJ"), plan
        # the scans themselves advertise the bucket spec
        assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", no_bcast)
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_bucketed_join_rows_match_plain_join(spark, bucketed_tables):
    lt, ot = bucketed_tables
    j = bucketed_join(spark, lt, ot, "l_orderkey", "o_orderkey").groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
    )
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s"),
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_agg_reuses_bucket_distribution(spark, bucketed_tables):
    """groupBy on the bucket key must also plan shuffle-free: the bucketed
    scan's hashpartitioning satisfies the aggregation's distribution."""
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("s")
    )
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    assert "Exchange" not in plan, plan
