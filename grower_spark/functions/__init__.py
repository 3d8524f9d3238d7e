from grower_spark.functions.hashing import md5_60, md5_60_py, xxhash_60
from grower_spark.functions.scalars import (
    json_string_field,
    json_uint64_field,
    regexp_field,
    cast_to,
    geoip_region,
    geoip_city,
    geoip_as,
)

__all__ = [
    "md5_60",
    "md5_60_py",
    "xxhash_60",
    "json_string_field",
    "json_uint64_field",
    "regexp_field",
    "cast_to",
    "geoip_region",
    "geoip_city",
    "geoip_as",
]
