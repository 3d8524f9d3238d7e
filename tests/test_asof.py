"""as-of join semantics: latest-at-or-before match per key, left-join
nulls, equal-ts inclusion, tolerance cutoff, and name-clash guard."""

import pytest

from grower_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 100), (2, "u1", 205), (3, "u1", 300),
         (4, "u2", 150), (5, "u3", 500)],
        ["event_id", "user", "t"],
    )
    right = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 200, 20), ("u1", 400, 40), ("u2", 160, 99)],
        ["user", "t", "mark"],
    )
    return left, right


def test_latest_at_or_before(spark, frames):
    left, right = frames
    out = {r["event_id"]: r["mark"]
           for r in asof_join(left, right, ["user"], "t", ["mark"]).collect()}
    assert out[1] == 10   # exact ts match included (<=)
    assert out[2] == 20   # 205 -> mark at 200, not 100, not 400
    assert out[3] == 20   # 300 -> still 200 (400 is in the future)
    assert out[4] is None  # u2's only mark is at 160 > 150
    assert out[5] is None  # u3 has no marks at all (left join)


def test_tolerance_nulls_stale_matches(spark, frames):
    left, right = frames
    out = {r["event_id"]: r["mark"]
           for r in asof_join(left, right, ["user"], "t", ["mark"],
                              tolerance=50).collect()}
    assert out[1] == 10   # age 0 <= 50
    assert out[2] == 20   # age 5 <= 50
    assert out[3] is None  # age 100 > 50: stale match nulled
    assert out[4] is None and out[5] is None


def test_all_left_rows_survive(spark, frames):
    left, right = frames
    assert asof_join(left, right, ["user"], "t", ["mark"]).count() == left.count()


def test_null_value_in_newest_right_row_is_carried(spark):
    """A right row whose value column is legitimately NULL still wins the
    as-of match — per-column last(ignorenulls) would skip it and carry a
    STALE older row's value (DuckDB ASOF JOIN carries the NULL)."""
    left = spark.createDataFrame([(1, "u1", 300)], ["event_id", "user", "t"])
    right = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 200, None)], schema="user string, t long, mark int"
    )
    out = asof_join(left, right, ["user"], "t", ["mark"]).collect()
    assert out[0]["mark"] is None  # newest row's NULL, not the stale 10


def test_all_values_come_from_the_same_right_row(spark):
    """Multiple value_cols must be carried from ONE right row, never mixed
    across rows when one of them is NULL in the newest row."""
    left = spark.createDataFrame([(1, "u1", 300)], ["event_id", "user", "t"])
    right = spark.createDataFrame(
        [("u1", 100, 10, "a"), ("u1", 200, None, "b")],
        schema="user string, t long, mark int, tag string",
    )
    row = asof_join(left, right, ["user"], "t", ["mark", "tag"]).collect()[0]
    assert (row["mark"], row["tag"]) == (None, "b")


def test_tolerance_gates_on_the_carried_rows_ts(spark):
    """Tolerance must judge the SAME row whose values are carried."""
    left = spark.createDataFrame([(1, "u1", 300)], ["event_id", "user", "t"])
    right = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 200, None)], schema="user string, t long, mark int"
    )
    # newest row (t=200, mark NULL) is within tolerance: carry its NULL
    out = asof_join(left, right, ["user"], "t", ["mark"], tolerance=150).collect()
    assert out[0]["mark"] is None
    # tolerance 50 excludes even the newest row
    out = asof_join(left, right, ["user"], "t", ["mark"], tolerance=50).collect()
    assert out[0]["mark"] is None


def test_value_col_clash_rejected(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, ["user"], "t", ["t"])


def test_reserved_names_rejected(spark):
    """'__rts' as a value col would shadow the carry struct's timestamp field
    and break the tolerance path; '__side'/'__carry' on the left likewise."""
    left = spark.createDataFrame([(1, "u1", 100)], ["event_id", "user", "t"])
    right = spark.createDataFrame([("u1", 50, 7)], ["user", "t", "__rts"])
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, ["user"], "t", ["__rts"])
    left2 = left.withColumnRenamed("event_id", "__carry")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left2, right.withColumnRenamed("__rts", "mark"),
                  ["user"], "t", ["mark"])


def test_null_ts_right_rows_never_match(spark):
    """DuckDB ASOF never matches a NULL-ts right row (NULL <= t is not
    true); before the fix, NULLS-FIRST ordering handed its payload to left
    rows with no real predecessor."""
    left = spark.createDataFrame([(1, "u1", 50)], ["event_id", "user", "t"])
    right = spark.createDataFrame(
        [("u1", None, 99)], schema="user string, t long, mark int"
    )
    out = asof_join(left, right, ["user"], "t", ["mark"]).collect()
    assert out[0]["mark"] is None


def test_null_ts_left_rows_are_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "u1", None), (2, "u1", 300)], schema="event_id int, user string, t long"
    )
    right = spark.createDataFrame(
        [("u1", 100, 10), ("u1", None, 99)], schema="user string, t long, mark int"
    )
    out = {r["event_id"]: r["mark"]
           for r in asof_join(left, right, ["user"], "t", ["mark"]).collect()}
    assert out[1] is None  # NULL left ts: no predecessor can satisfy <=
    assert out[2] == 10    # real rows unaffected by the NULL ones


def test_null_ts_matches_duckdb_asof_oracle(spark):
    """Cross-check NULL-ts semantics against DuckDB ASOF over NULL-filtered
    inputs.  Raw DuckDB ASOF orders NULLs LAST and so matches a NULL-ts left
    row to a NULL-ts right row (both act as +inf) — a sort artifact, not
    ternary logic.  Our contract is the principled one (NULL never matches),
    i.e. DuckDB ASOF with NULL-ts rows excluded on both sides."""
    duckdb = pytest.importorskip("duckdb")
    lrows = [(1, "u1", None), (2, "u1", 120), (3, "u2", 80), (4, "u2", 200)]
    rrows = [("u1", None, 99), ("u1", 100, 11), ("u2", None, 77), ("u2", 150, 22)]
    left = spark.createDataFrame(lrows, schema="event_id int, user string, t long")
    right = spark.createDataFrame(rrows, schema="user string, t long, mark int")
    got = {r["event_id"]: r["mark"]
           for r in asof_join(left, right, ["user"], "t", ["mark"]).collect()}
    con = duckdb.connect()
    con.execute("create table l(event_id int, u varchar, t bigint)")
    con.executemany("insert into l values (?,?,?)", lrows)
    con.execute("create table r(u varchar, t bigint, mark int)")
    con.executemany("insert into r values (?,?,?)", rrows)
    want = dict(con.execute(
        "select l.event_id, r.mark"
        " from (select * from l where t is not null) l"
        " asof left join (select * from r where t is not null) r"
        " on l.u = r.u and r.t <= l.t"
        " union all select event_id, NULL from l where t is null"
    ).fetchall())
    assert got == want
    assert want == {1: None, 2: 11, 3: None, 4: 22}
