"""Cast semantics unit tests (reference: pkg/nginx/caster_test.go:9-208).

Covers: zero-on-empty, hyphen scrub, now()-fallback for empty times with an
injected deterministic clock, Go acceptance grammar strictness, FixedString
truncation, and the Go-layout -> JDK-pattern converter."""

import datetime
import decimal

import pyspark.sql.functions as F
import pytest

from grower_spark.plans.caster import build_cast, build_field_cast, scrub_hyphen
from grower_spark.timefmt import GO_RFC3339, go_layout_to_jdk


def run_cast(spark, type_name, value, **kwargs):
    plan = build_cast(type_name, **kwargs)
    df = spark.createDataFrame([(value,)], ["v"])
    col = scrub_hyphen(F.col("v"))
    row = df.select(
        plan.value(col).alias("value"), plan.valid(col).alias("valid")
    ).collect()[0]
    return row["value"], row["valid"]


def run_field_cast(spark, field, value, local_time_format="02/Jan/2006:15:04:05 -0700"):
    plan = build_field_cast(field, local_time_format=local_time_format)
    df = spark.createDataFrame([(value,)], ["v"])
    col = scrub_hyphen(F.col("v"))
    row = df.select(
        plan.value(col).alias("value"), plan.valid(col).alias("valid")
    ).collect()[0]
    return row["value"], row["valid"]


# --- timefmt converter -------------------------------------------------------

def test_go_layouts_to_jdk():
    assert go_layout_to_jdk("02/Jan/2006:15:04:05 -0700") == "dd/MMM/yyyy:HH:mm:ss xx"
    assert go_layout_to_jdk("2006-01-02T15:04:05") == "yyyy-MM-dd'T'HH:mm:ss"
    assert go_layout_to_jdk("2006-01-02") == "yyyy-MM-dd"
    assert go_layout_to_jdk(GO_RFC3339) == "yyyy-MM-dd'T'HH:mm:ssXXX"


# --- numeric semantics (caster_test.go tables) -------------------------------

@pytest.mark.parametrize(
    "type_name,value,expected",
    [
        ("UInt8", "255", 255),
        ("UInt16", "65535", 65535),
        ("UInt32", "4294967295", 4294967295),
        ("UInt64", "18446744073709551615", decimal.Decimal("18446744073709551615")),
        ("Int8", "-128", -128),
        ("Int16", "-32768", -32768),
        ("Int32", "-2147483648", -2147483648),
        ("Integer", "42", 42),
        ("Int64", "-9223372036854775808", -9223372036854775808),
        ("Float64", "2000.5", 2000.5),
    ],
)
def test_numeric_bounds_ok(spark, type_name, value, expected):
    got, valid = run_cast(spark, type_name, value)
    assert valid and got == expected


@pytest.mark.parametrize(
    "type_name,value",
    [
        ("UInt8", "256"),
        ("UInt16", "65536"),
        ("UInt32", "4294967296"),
        ("UInt64", "18446744073709551616"),
        ("UInt32", "-1"),
        ("UInt8", "+1"),  # ParseUint permits no sign prefix
        ("Int8", "128"),
        ("Int16", "32768"),
        ("Int32", "2147483648"),
        ("Int64", "9223372036854775808"),
        ("Int32", "1 "),  # Go rejects whitespace; Spark cast would trim
        ("Int32", " 1"),
        ("Int32", "abc"),
        ("Float32", "12,5"),
    ],
)
def test_numeric_invalid(spark, type_name, value):
    _, valid = run_cast(spark, type_name, value)
    assert not valid


@pytest.mark.parametrize(
    "type_name,zero",
    [
        ("UInt8", 0), ("UInt32", 0), ("UInt64", decimal.Decimal(0)),
        ("Int32", 0), ("Int64", 0), ("Float32", 0.0), ("Float64", 0.0),
    ],
)
def test_zero_on_empty(spark, type_name, zero):
    got, valid = run_cast(spark, type_name, "")
    assert valid and got == zero


def test_zero_on_hyphen(spark):
    got, valid = run_cast(spark, "Int32", "-")
    assert valid and got == 0


def test_signed_accepts_plus(spark):
    got, valid = run_cast(spark, "Int32", "+5")
    assert valid and got == 5


# --- string semantics --------------------------------------------------------

def test_string_passthrough_and_hyphen(spark):
    got, valid = run_cast(spark, "String", "hello")
    assert valid and got == "hello"
    got, valid = run_cast(spark, "String", "-")
    assert valid and got == ""


def test_fixed_string_truncates(spark):
    got, valid = run_cast(spark, "FixedString(10)", "1234567890_abcdefg")
    assert valid and got == "1234567890"
    got, valid = run_cast(spark, "FixedString(10)", "short")
    assert valid and got == "short"


def test_fixed_string_malformed_size_config_error():
    with pytest.raises(ValueError):
        build_cast("FixedString(x)")


# --- date/time semantics -----------------------------------------------------

def test_datetime_parse(spark):
    got, valid = run_cast(spark, "DateTime", "2022-07-21T00:30:43")
    assert valid and got == datetime.datetime(2022, 7, 21, 0, 30, 43)


def test_date_parse(spark):
    got, valid = run_cast(spark, "Date", "2022-07-21")
    assert valid and got == datetime.date(2022, 7, 21)


def test_empty_time_now_fallback_injected(spark):
    fixed = F.lit("2020-05-05 05:05:05").cast("timestamp")
    got, valid = run_cast(spark, "DateTime", "", now=fixed)
    assert valid and got == datetime.datetime(2020, 5, 5, 5, 5, 5)
    got, valid = run_cast(spark, "Date", "", now=fixed)
    assert valid and got == datetime.date(2020, 5, 5)


def test_empty_time_now_fallback_default_is_current(spark):
    got, valid = run_cast(spark, "DateTime", "")
    assert valid
    assert abs((got - datetime.datetime.utcnow()).total_seconds()) < 600


def test_malformed_datetime_invalid(spark):
    _, valid = run_cast(spark, "DateTime", "not-a-date")
    assert not valid


# --- nginx built-in field typing (caster.go:118-140) --------------------------

def test_native_time_local(spark):
    got, valid = run_field_cast(spark, "time_local", "21/Jul/2022:00:30:43 +0300")
    assert valid and got == datetime.datetime(2022, 7, 20, 21, 30, 43)


def test_native_time_iso8601(spark):
    got, valid = run_field_cast(spark, "time_iso8601", "2022-07-21T00:30:43+03:00")
    assert valid and got == datetime.datetime(2022, 7, 20, 21, 30, 43)


@pytest.mark.parametrize(
    "field,value,expected",
    [
        ("status", "404", 404),
        ("bytes_sent", "123456", 123456),
        ("body_bytes_sent", "1", 1),
        ("connection", "-5", -5),
        ("request_length", "300", 300),
        ("request_time", "0.25", 0.25),
        ("msec", "1658352643.123", pytest.approx(1658352643.123, rel=1e-6)),
        ("remote_addr", "1.2.3.4", "1.2.3.4"),
        ("unknown_field", "anything", "anything"),  # default String (caster.go:139)
    ],
)
def test_native_typing(spark, field, value, expected):
    got, valid = run_field_cast(spark, field, value)
    assert valid and got == expected


def test_custom_cast_overrides_native(spark):
    # status is natively UInt16; a custom cast can rewrite it (caster.go:76-79).
    plan = build_field_cast(
        "status",
        local_time_format="02/Jan/2006:15:04:05 -0700",
        custom_casts={"status": "String"},
        custom_casts_enable=True,
    )
    assert plan.spark_type.simpleString() == "string"


def test_custom_cast_disabled_falls_back(spark):
    plan = build_field_cast(
        "status",
        local_time_format="02/Jan/2006:15:04:05 -0700",
        custom_casts={"status": "String"},
        custom_casts_enable=False,
    )
    assert plan.spark_type.simpleString() == "int"
