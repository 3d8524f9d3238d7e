"""Bucketed range join: exact point-in-interval semantics, half-open
bounds, bucket-boundary spans, multi-match, left-join nulls, guards."""

import pytest

from grower_spark.operators.ranges import range_join


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


def test_range_join_rejects_bad_how_and_clash(spark, frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="inner|left"):
        range_join(points, intervals, "t", "s", "e", 10, how="full")
    with pytest.raises(ValueError, match="overlapping"):
        range_join(points, points.withColumnRenamed("pid", "s"), "t", "s", "t", 10)
