"""Bucketed range join: exact point-in-interval semantics, half-open
bounds, bucket-boundary spans, multi-match, left-join nulls, guards."""

import pytest
import pyspark.sql.functions as F

from grower_spark.operators.ranges import _with_floor_bucket, range_join


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [(1, 100), (2, 150), (3, 200), (4, 999), (5, 1000)],
        ["pid", "t"],
    )
    intervals = spark.createDataFrame(
        [("A", 100, 200),    # catches t=100,150 (200 excluded: half-open)
         ("B", 140, 1001),   # spans many buckets; catches 150,200,999,1000
         ("C", 5000, 5100),  # empty
         ("D", 300, 300)],   # zero-length: matches nothing
        ["name", "s", "e"],
    )
    return points, intervals


@pytest.mark.parametrize("width", [10, 64, 1000, 10000])
def test_range_join_matches_na_naive(spark, frames, width):
    """Result must be width-invariant and equal the naive theta-join."""
    points, intervals = frames
    got = {
        (r["pid"], r["name"])
        for r in range_join(points, intervals, "t", "s", "e", width).collect()
    }
    naive = {
        (p["pid"], i["name"])
        for p in points.collect()
        for i in intervals.collect()
        if i["s"] <= p["t"] < i["e"]
    }
    assert got == naive
    assert ("1", "A") not in got  # sanity: tuple types are ints
    assert (3, "A") not in got    # t=200 excluded at half-open end
    assert (5, "B") in got and (4, "B") in got


def test_range_join_left_keeps_unmatched(spark, frames):
    points, intervals = frames
    points = points.union(spark.createDataFrame([(6, 4000)], ["pid", "t"]))
    out = range_join(points, intervals, "t", "s", "e", 100, how="left")
    rows = {(r["pid"], r["name"]) for r in out.collect()}
    # every point appears; the point outside all intervals gets NULL once
    assert {p for p, _ in rows} == {1, 2, 3, 4, 5, 6}
    assert (6, None) in rows
    assert sum(1 for p, _ in rows if p == 6) == 1
    # matched points do NOT get an extra null row
    assert (1, None) not in rows and (1, "A") in rows


def test_range_join_property_random_graphs(spark):
    """Hypothesis-style randomized check (fixed seeds for determinism):
    bucketized result == naive theta-join for arbitrary interval layouts,
    including touching, nested, and duplicated intervals."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        pts = [(i, rng.randrange(0, 500)) for i in range(40)]
        ivs = []
        for j in range(25):
            s = rng.randrange(0, 500)
            ivs.append((j, s, s + rng.randrange(0, 120)))
        points = spark.createDataFrame(pts, ["pid", "t"])
        intervals = spark.createDataFrame(ivs, ["iid", "s", "e"])
        width = rng.choice([1, 7, 64, 300])
        got = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "t", "s", "e", width).collect()
        }
        naive = {
            (p, j) for p, t in pts for j, s, e in ivs if s <= t < e
        }
        assert got == naive, f"seed={seed} width={width}"


def test_range_join_left_null_safe_no_spurious_rows(spark):
    """A MATCHED point row containing a NULL must not reappear as a
    NULL-extended row: the unmatched-row recovery anti-join has to compare
    null-safely (plain `=` never equates NULL to NULL)."""
    points = spark.createDataFrame(
        [(1, 100, None), (2, 4000, None), (3, 150, "x")],
        schema="pid int, t int, extra string",
    )
    intervals = spark.createDataFrame([("A", 100, 200)], ["name", "s", "e"])
    out = range_join(points, intervals, "t", "s", "e", 50, how="left")
    rows = [(r["pid"], r["extra"], r["name"]) for r in out.collect()]
    assert sorted(rows) == [(1, None, "A"), (2, None, None), (3, "x", "A")]


def test_floor_bucket_exact_above_2_53_and_negative(spark):
    """Bucket assignment must be exact integer floor division: double
    division drifts above 2^53 (epoch nanos), truncating div is wrong for
    negatives."""
    vals = [
        (1 << 60) + 999, (1 << 60) - 1, (1 << 53) + 1, (1 << 53) - 1,
        -1, -999, -1000, -1001, 0, 1, 999, 1000, 1001,
    ]
    df = spark.createDataFrame([(v,) for v in vals], schema="v long")
    got = {
        r["v"]: r["b"]
        for r in _with_floor_bucket(df, F.col("v"), 1000, "b").collect()
    }
    assert got == {v: v // 1000 for v in vals}


def test_range_join_exact_at_epoch_nanos_scale(spark):
    """Boundary matches at 2^60-scale timestamps (epoch nanos) must not be
    dropped by bucket rounding."""
    base = 1 << 60
    points = spark.createDataFrame(
        [(1, base), (2, base + 123), (3, base + 1000)], schema="pid long, t long"
    )
    intervals = spark.createDataFrame(
        [("A", base, base + 1000)], schema="name string, s long, e long"
    )
    got = {
        (r["pid"], r["name"])
        for r in range_join(points, intervals, "t", "s", "e", 777).collect()
    }
    assert got == {(1, "A"), (2, "A")}  # half-open: base+1000 excluded


def test_range_join_rejects_bad_how_and_clash(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="inner|left"):
        range_join(points, intervals, "t", "s", "e", 10, how="full")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(points, points.withColumnRenamed("pid", "s"), "t", "s", "t", 10)


def test_reserved_column_names_rejected(spark):
    """An input column named like an internal temp would be silently
    overwritten and dropped; both entry points must refuse instead."""
    points = spark.createDataFrame([(1, 10, 0)], schema="pid long, t long, __rbkt long")
    intervals = spark.createDataFrame([("A", 0, 100)], schema="name string, s long, e long")
    with pytest.raises(ValueError, match="reserved"):
        range_join(points, intervals, "t", "s", "e", 10)
    df = spark.createDataFrame([(1, 2)], schema="v long, __fd_b long")
    with pytest.raises(ValueError, match="reserved"):
        _with_floor_bucket(df, F.col("v"), 10, "b")
