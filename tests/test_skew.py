"""Skew operators: salted two-phase aggregation and the salted join must
be salt-invariant (identical to their unsalted equivalents)."""

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.skew import (
    salted_agg,
    salted_broadcast_left,
    salted_join,
    with_salt,
)


def test_salted_agg_matches_plain(spark):
    # one hot key (user 1 gets 90% of rows)
    rows = [(1 if i % 10 != 0 else i % 7, i, float(i % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "value"])
    salted = salted_agg(
        df,
        ["user_id"],
        [F.count(F.lit(1)).alias("cnt"), F.sum(F.col("value").cast("long")).alias("s")],
        [F.sum("cnt").alias("cnt"), F.sum("s").alias("s")],
        n_salts=8,
    )
    plain = df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(F.col("value").cast("long")).alias("s")
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_domain(spark):
    df = with_salt(spark.range(1000).toDF("id"), n_salts=4)
    salts = {r["_salt"] for r in df.select("_salt").distinct().collect()}
    assert salts <= {0, 1, 2, 3} and len(salts) > 1


def test_salted_broadcast_left_replicates(spark):
    small = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    exploded = salted_broadcast_left(small, n_salts=3)
    assert exploded.count() == 6
    assert exploded.where(F.col("k") == 1).count() == 3


def test_salted_join_matches_plain(spark):
    # hot key 1 dominates the fact side
    big = spark.createDataFrame(
        [(1 if i % 10 != 0 else i % 5, i) for i in range(1000)], ["k", "eid"]
    )
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (9, "unmatched-dim")], ["k", "name"]
    )
    for how in ("inner", "left"):
        salted = salted_join(big, small, ["k"], n_salts=8, how=how)
        plain = big.join(small, ["k"], how)
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        ), how
    # left join keeps unmatched big rows exactly once
    left = salted_join(big, small, ["k"], n_salts=8, how="left")
    assert left.count() == big.count()


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, 1)], ["k", "v"])
    with pytest.raises(ValueError, match="inner|left"):
        salted_join(df, df, ["k"], how="right")
