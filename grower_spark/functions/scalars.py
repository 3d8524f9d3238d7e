"""Scalar function surface: the reference's planned-but-unbuilt functions.

The reference README's TODO list (/root/reference/README.md:27-37) defines
the v2 function surface it never shipped: ``JSONStringField``,
``JSONUInt64Field``, ``RegExp(pattern, target_field)``, GeoIP lookups, and
nested casts like ``toUInt32(GeoIPAS(ip))``.  Each is a one-expression Spark
function here; nesting composes for free because everything returns Column.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
import pyspark.sql.functions as F

from grower_spark.plans.caster import build_cast


def json_string_field(col: Column, field: str) -> Column:
    """JSONStringField(json, field) — README.md:33."""
    return F.get_json_object(col, f"$.{field}")


def json_uint64_field(col: Column, field: str) -> Column:
    """JSONUInt64Field(json, field) — README.md:34; widened to decimal(20,0)
    like every UInt64 in this engine (SURVEY.md §1.3)."""
    return F.get_json_object(col, f"$.{field}").try_cast("decimal(20,0)")


def regexp_field(col: Column, pattern: str, group: int = 1) -> Column:
    """RegExp(pattern, target_field) — README.md:35."""
    return F.regexp_extract(col, pattern, group)


def cast_to(col: Column, clickhouse_type: str) -> Column:
    """Nested Cast composition (README.md:36, e.g. toUInt32(GeoIPAS(ip))):
    applies the engine's ClickHouse-type cast semantics to any expression."""
    from grower_spark.plans.caster import scrub_hyphen

    plan = build_cast(clickhouse_type)
    return plan.value(scrub_hyphen(col.cast("string")))


# --- GeoIP (README.md:28-31) -------------------------------------------------
# A real deployment feeds a MaxMind database via a broadcast dict + pandas
# UDF; this container ships no GeoIP data, so the lookup table is an
# injectable DataFrame join (the Spark-idiomatic shape: broadcast dim join,
# not a per-row UDF).  With no table provided, a deterministic stub derives
# a pseudo-region from the /16 prefix so plumbing stays testable.


def _ip_prefix16(ip: Column) -> Column:
    return F.concat_ws(".", F.split(ip, r"\.").getItem(0), F.split(ip, r"\.").getItem(1))


def geoip_region(ip: Column, lookup: Optional[dict] = None) -> Column:
    """GeoIPRegion(ip) — README.md:29.  Stub: region id from /16 prefix."""
    from grower_spark.functions.hashing import md5_60

    if lookup:
        mapping = F.create_map(*[F.lit(x) for kv in lookup.items() for x in kv])
        return mapping.getItem(_ip_prefix16(ip))
    return F.concat(F.lit("region-"), (md5_60(_ip_prefix16(ip)) % 64).cast("string"))


def geoip_city(ip: Column, lookup: Optional[dict] = None) -> Column:
    """GeoIPCity(ip) — README.md:30.  Stub: city id from /16 prefix."""
    from grower_spark.functions.hashing import md5_60

    if lookup:
        mapping = F.create_map(*[F.lit(x) for kv in lookup.items() for x in kv])
        return mapping.getItem(_ip_prefix16(ip))
    return F.concat(F.lit("city-"), (md5_60(_ip_prefix16(ip)) % 512).cast("string"))


def geoip_as(ip: Column, lookup: Optional[dict] = None) -> Column:
    """GeoIPAS(ip) — README.md:31.  Stub: AS number from /16 prefix."""
    from grower_spark.functions.hashing import md5_60

    if lookup:
        mapping = F.create_map(*[F.lit(x) for kv in lookup.items() for x in kv])
        return mapping.getItem(_ip_prefix16(ip))
    return (md5_60(_ip_prefix16(ip)) % 65536).cast("int")
