"""Driver-contract queries and their DuckDB oracle SQL.

Each entry exercises an operator from SURVEY.md §2 (or a scale-path operator
from the north-star extensions).  The Spark side runs the real engine
(grower_spark.plans pipeline / operators); the oracle side is an
*independent* ANSI-SQL re-implementation of the same semantics for DuckDB.

Determinism rules used throughout (so value-hashes match across engines):

- no raw floats in outputs where a sum is involved; fixed-point bigints
  (``round(x*100)``) or ``round(x, 4)`` instead;
- timestamps leave queries as epoch seconds (BIGINT) — engine-neutral;
- every aggregate/computed column is explicitly aliased, and oracle
  aggregates are CAST to the Spark result type (DuckDB sum(BIGINT) is
  HUGEINT otherwise);
- the empty-time now() fallback is pinned to a fixed literal clock.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from grower_spark.config import PipelineConfig
from grower_spark.io_tables import load_table
from grower_spark.plans.pipeline import LogPipeline

# ---------------------------------------------------------------------------
# Synthetic access-log lines derived from the `events` table (TESTDATA.md).
# The same rendering is expressed for Spark SQL and DuckDB SQL; engine
# differences are limited to the timestamp-format function and STRING/VARCHAR.
# ---------------------------------------------------------------------------

SYNTH_FORMAT = (
    '$remote_addr - $remote_user [$time_local] "$request" '
    '$status $bytes_sent $request_time "$request_method"'
)

_SYNTH_LINE_TEMPLATE = """
SELECT
  '10.' || CAST(user_id % 200 AS {STR}) || '.' || CAST(event_id % 250 AS {STR})
        || '.' || CAST((event_id * 7) % 250 AS {STR})
  || ' - ' || (CASE WHEN event_id % 10 = 0 THEN '-'
               ELSE 'u' || CAST(user_id AS {STR}) END)
  || ' [' || {TL} || ' +0000]'
  || ' "GET /' || event_type || '/' || CAST(event_id AS {STR}) || ' HTTP/1.1"'
  || ' ' || (CASE WHEN event_id % 97 = 0 THEN 'ERR'
             ELSE CAST(200 + (event_id % 5) * 100 AS {STR}) END)
  || ' ' || (CASE WHEN event_id % 13 = 0 THEN '-'
             ELSE CAST(CAST(floor(abs(value) * 100) AS BIGINT) AS {STR}) END)
  || ' ' || CAST(CAST(floor(abs(value)) AS BIGINT) AS {STR}) || '.'
         || lpad(CAST(CAST(floor(abs(value) * 100) AS BIGINT) % 100 AS {STR}), 2, '0')
  || ' "GET"' AS value
FROM {EVENTS}
"""

SYNTH_LINES_SPARK_SQL = _SYNTH_LINE_TEMPLATE.format(
    STR="STRING", TL="date_format(ts, 'dd/MMM/yyyy:HH:mm:ss')", EVENTS="events_src"
)
SYNTH_LINES_DUCK_SQL = _SYNTH_LINE_TEMPLATE.format(
    STR="VARCHAR", TL="strftime(ts, '%d/%b/%Y:%H:%M:%S')", EVENTS="events"
)

# Fixed clock for the empty-time now() fallback (caster.go:293-296) so both
# engines agree; no synthetic line has an empty time, this is belt+braces.
FIXED_NOW = "2024-06-01 00:00:00"

SYNTH_CONFIG = PipelineConfig.from_dict(
    {
        "nginx": {
            "log_format": SYNTH_FORMAT,
            "log_time_format": "02/Jan/2006:15:04:05 -0700",
        },
        "scheme": {
            "logs_table": "synthetic.access_log",
            "columns": {
                "remote_addr": "remote_addr",
                "remote_user": "remote_user",
                "time_local": "time_local",
                "request": "request",
                "status": "status",
                "bytes_sent": "bytes_sent",
                "request_time": "request_time",
                "request_method": "request_method",
            },
        },
    }
)


def _cpu_spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a CPU-bound per-row pipeline across all cores.

    The sf testdata tables are single parquet files, which Spark reads as one
    partition — a regex-parse over it would run on one core.  A round-robin
    repartition to the default parallelism costs one small shuffle of raw
    rows and unlocks full-width execution.  (On a real cluster the source is
    many files/Kafka partitions and this is a no-op sized by the source.)
    """
    # Unconditional: checking df.rdd.getNumPartitions() first looks cheaper
    # but .rdd on an AQE plan can eagerly execute stages (observed multi-
    # second stalls).  The repartition shuffle is a few MB here; a real
    # deployment reads many files / Kafka partitions and skips this helper.
    return df.repartition(spark.sparkContext.defaultParallelism)


def _synth_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _cpu_spread(spark, load_table(spark, sf_dir, "events"))
    events.createOrReplaceTempView("events_src")
    return spark.sql(SYNTH_LINES_SPARK_SQL)


def _pipeline() -> LogPipeline:
    return LogPipeline(SYNTH_CONFIG, now=F.lit(FIXED_NOW).cast("timestamp"))


# Five nginx driver queries share the identical parsed DataFrame; building
# it costs ~0.4s of driver-side Column construction each time.  DataFrames
# are immutable, so one per (session, sf_dir) serves them all.
_PARSED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _PARSED_CACHE.get(key)
    if hit is None:
        hit = _PARSED_CACHE[key] = _pipeline().parse(_synth_lines(spark, sf_dir))
    return hit


# --- DuckDB oracle: independent regex-parse + cast of the same lines --------

_ORACLE_PATTERN = (
    r'^([^ ]*)\ \-\ ([^ ]*)\ \[([^\]]*)\]\ "([^"]*)"\ '
    r'([^ ]*)\ ([^ ]*)\ ([^ ]*)\ "([^"]*)"'
)

_UNSIGNED_GUARD = "^[0-9]+$"
_FLOAT_GUARD = (
    r"^[+-]?(([0-9]+(\.[0-9]*)?|\.[0-9]+)([eEpP][+-]?[0-9]+)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?|[nN][aA][nN])$"
)


def _duck_scrub(group: int) -> str:
    g = f"regexp_extract(value, '{_ORACLE_PATTERN}', {group})"
    return f"(CASE WHEN {g} = '-' THEN '' ELSE {g} END)"


def _duck_uint_valid(s: str, upper: int, duck_type: str) -> str:
    return (
        f"({s} = '' OR (regexp_matches({s}, '{_UNSIGNED_GUARD}')"
        f" AND try_cast({s} AS {duck_type}) IS NOT NULL"
        f" AND try_cast({s} AS {duck_type}) <= {upper}))"
    )


def _duck_float_valid(s: str) -> str:
    return (
        f"({s} = '' OR (regexp_matches({s}, '{_FLOAT_GUARD}')"
        f" AND try_cast({s} AS REAL) IS NOT NULL))"
    )


# CTE producing the oracle's parsed/typed rows from the synthetic lines.
ORACLE_PARSED_CTE = f"""
WITH lines AS ({SYNTH_LINES_DUCK_SQL}),
fields AS (
  SELECT value,
    {_duck_scrub(1)} AS remote_addr,
    {_duck_scrub(2)} AS remote_user,
    {_duck_scrub(3)} AS tl,
    {_duck_scrub(4)} AS request,
    {_duck_scrub(5)} AS status_s,
    {_duck_scrub(6)} AS bytes_s,
    {_duck_scrub(7)} AS rt_s,
    {_duck_scrub(8)} AS request_method,
    regexp_matches(value, '{_ORACLE_PATTERN}') AS matched
  FROM lines
),
checked AS (
  SELECT *,
    (matched
     AND {_duck_uint_valid('status_s', 65535, 'INTEGER')}
     AND {_duck_uint_valid('bytes_s', 4294967295, 'BIGINT')}
     AND {_duck_float_valid('rt_s')}
     AND (tl = '' OR try_strptime(tl, '%d/%b/%Y:%H:%M:%S %z') IS NOT NULL)
    ) AS valid
  FROM fields
),
parsed AS (
  SELECT
    remote_addr, remote_user, request, request_method,
    CASE WHEN status_s = '' THEN 0 ELSE CAST(status_s AS INTEGER) END AS status,
    CASE WHEN bytes_s = '' THEN 0 ELSE CAST(bytes_s AS BIGINT) END AS bytes_sent,
    CASE WHEN rt_s = '' THEN CAST(0 AS REAL) ELSE CAST(rt_s AS REAL) END AS request_time,
    CASE WHEN tl = '' THEN CAST(epoch(TIMESTAMP '{FIXED_NOW}') AS BIGINT)
         ELSE CAST(epoch(strptime(tl, '%d/%b/%Y:%H:%M:%S %z')) AS BIGINT)
    END AS tl_epoch
  FROM checked WHERE valid
)
"""


# ---------------------------------------------------------------------------
# Query implementations
# ---------------------------------------------------------------------------

def q_nginx_parse_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: file lines -> parse -> cast -> aggregate by status.

    Covers S1/P1/P2/P4/P5/P6/P7/P9 end to end (SURVEY.md §2)."""
    parsed = _parsed(spark, sf_dir)
    return parsed.groupBy("status").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("bytes_sent").alias("sum_bytes"),
        F.sum(F.round(F.col("request_time").cast("double") * 100).cast("long")).alias("sum_rt_centis"),
        F.max(F.to_unix_timestamp("time_local")).alias("max_epoch"),
        F.min("remote_addr").alias("min_addr"),
    )


def oracle_nginx_parse_agg() -> str:
    return (
        ORACLE_PARSED_CTE
        + """
SELECT status,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(bytes_sent) AS BIGINT) AS sum_bytes,
  CAST(sum(CAST(round(CAST(request_time AS DOUBLE) * 100) AS BIGINT)) AS BIGINT) AS sum_rt_centis,
  CAST(max(tl_epoch) AS BIGINT) AS max_epoch,
  min(remote_addr) AS min_addr
FROM parsed GROUP BY status
"""
    )


_ERR_RATE_ALERT_BP = 500  # flag windows where >5% of requests are 5xx


def q_nginx_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed error-rate monitoring over the parsed access log (r7) —
    the ops question the reference's users actually watch: per 5-minute
    bucket, request count, 5xx count, error rate in integer basis
    points, and an over-threshold alert flag.  One aggregation over the
    parse pipeline's typed output; the integer epoch-div bucketing is
    exact on both engines."""
    parsed = _parsed(spark, sf_dir)
    win = F.expr("to_unix_timestamp(time_local) div 300").alias("win5m")
    n = F.count(F.lit(1)).alias("n")
    n5 = F.sum(
        F.when(F.col("status") >= 500, F.lit(1)).otherwise(F.lit(0))
    ).alias("n_5xx")
    agg = parsed.groupBy(win).agg(n, n5)
    return agg.select(
        "win5m",
        "n",
        "n_5xx",
        F.expr("(10000 * n_5xx) div n").alias("err_bp"),
        (F.expr("(10000 * n_5xx) div n") > _ERR_RATE_ALERT_BP)
        .cast("int")
        .alias("alert"),
    )


def oracle_nginx_error_rate() -> str:
    return (
        ORACLE_PARSED_CTE
        + f"""
SELECT tl_epoch // 300 AS win5m,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_5xx,
  CAST((10000 * sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END)) // count(*)
    AS BIGINT) AS err_bp,
  CAST((10000 * sum(CASE WHEN status >= 500 THEN 1 ELSE 0 END)) // count(*)
    > {_ERR_RATE_ALERT_BP} AS INTEGER) AS alert
FROM parsed GROUP BY 1
"""
    )


def q_nginx_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency dashboard over the parsed access log (r7): exact
    interpolated p50/p95/p99 of request_time (centiseconds) per 5-minute
    window — the canonical SRE panel beside the error rate.  One
    aggregation, one array-of-fractions percentile sharing a single sort
    buffer (the events_exact_stats pattern); integer centis make the
    interpolated midpoints exact binary fractions on both engines."""
    parsed = _parsed(spark, sf_dir)
    src = parsed.select(
        F.expr("to_unix_timestamp(time_local) div 300").alias("win5m"),
        F.round(F.col("request_time").cast("double") * 100)
        .cast("long")
        .alias("rt"),
    )
    agg = src.groupBy("win5m").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(rt, array(0.5D, 0.95D, 0.99D))").alias("_p"),
    )
    return agg.select(
        "win5m", "n",
        F.col("_p")[0].alias("p50"),
        F.col("_p")[1].alias("p95"),
        F.col("_p")[2].alias("p99"),
    )


def oracle_nginx_latency_percentiles() -> str:
    return (
        ORACLE_PARSED_CTE
        + """
SELECT tl_epoch // 300 AS win5m,
  CAST(count(*) AS BIGINT) AS n,
  quantile_cont(CAST(round(CAST(request_time AS DOUBLE) * 100) AS BIGINT), 0.5) AS p50,
  quantile_cont(CAST(round(CAST(request_time AS DOUBLE) * 100) AS BIGINT), 0.95) AS p95,
  quantile_cont(CAST(round(CAST(request_time AS DOUBLE) * 100) AS BIGINT), 0.99) AS p99
FROM parsed GROUP BY 1
"""
    )


def q_nginx_parse_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level typed output of the parse pipeline (P2/P4-P9)."""
    parsed = _parsed(spark, sf_dir)
    return parsed.select(
        "remote_addr",
        "remote_user",
        "request",
        "request_method",
        "status",
        "bytes_sent",
        F.round(F.col("request_time").cast("double") * 100).cast("long").alias("rt_centis"),
        F.to_unix_timestamp("time_local").alias("tl_epoch"),
    )


def oracle_nginx_parse_rows() -> str:
    return (
        ORACLE_PARSED_CTE
        + """
SELECT remote_addr, remote_user, request, request_method, status, bytes_sent,
  CAST(round(CAST(request_time AS DOUBLE) * 100) AS BIGINT) AS rt_centis,
  tl_epoch
FROM parsed
"""
    )


def q_nginx_deadletter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-row drop semantics: kept vs dropped counts (§1.3 item 4).

    Single pass over parse_detailed (grouping on the validity flag) instead
    of unioning the good/bad branches, which would parse every line twice."""
    detailed = _pipeline().parse_detailed(_synth_lines(spark, sf_dir))
    return (
        detailed.select(
            F.when(F.col("_valid"), "kept").otherwise("dropped").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def oracle_nginx_deadletter() -> str:
    return (
        ORACLE_PARSED_CTE.rsplit(",\nparsed AS", 1)[0]
        + """
SELECT CASE WHEN valid THEN 'kept' ELSE 'dropped' END AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM checked GROUP BY 1
"""
    )


# --- custom-cast path: UInt64 / FixedString / Date / Float64 (P6-P8) --------

CUSTOM_FORMAT = "$big | $fixed | $day | $ratio"
CUSTOM_CONFIG = PipelineConfig.from_dict(
    {
        "nginx": {
            "log_format": CUSTOM_FORMAT,
            "log_time_format": "02/Jan/2006:15:04:05 -0700",
            "log_custom_casts_enable": True,
            "log_custom_casts": {
                "big": "UInt64",
                "fixed": "FixedString(6)",
                "day": "Date",
                "ratio": "Float64",
            },
        },
        "scheme": {
            "logs_table": "synthetic.custom_casts",
            "columns": {
                "big": "big",
                "fixed": "fixed",
                "day": "day",
                "ratio": "ratio",
            },
        },
    }
)

# `big` exercises the UInt64 > int64-max range (19 digits starting 92.5e18);
# every 11th row is '-' (hyphen -> '' -> zero semantics).
_CUSTOM_LINE_TEMPLATE = """
SELECT
  (CASE WHEN event_id % 11 = 0 THEN '-'
   ELSE '925337203' || lpad(CAST(event_id % 1000000 AS {STR}), 10, '0') END)
  || ' | ' || event_type || '_' || CAST(event_id AS {STR})
  || ' | ' || {DAY}
  || ' | ' || CAST(CAST(floor(abs(value)) AS BIGINT) AS {STR}) || '.'
           || lpad(CAST(CAST(floor(abs(value) * 100) AS BIGINT) % 100 AS {STR}), 2, '0')
  AS value
FROM {EVENTS}
"""


def q_nginx_custom_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _cpu_spread(spark, load_table(spark, sf_dir, "events"))
    events.createOrReplaceTempView("events_src")
    lines = spark.sql(
        _CUSTOM_LINE_TEMPLATE.format(
            STR="STRING", DAY="date_format(ts, 'yyyy-MM-dd')", EVENTS="events_src"
        )
    )
    parsed = LogPipeline(CUSTOM_CONFIG, now=F.lit(FIXED_NOW).cast("timestamp")).parse(lines)
    return parsed.select(
        # Driver contract: UInt64 surfaces as string. The engine keeps
        # decimal(20,0) internally (full uint64 range, golden-tested in
        # tests/test_caster.py); the harness normalizes oracle output through
        # pandas, where DECIMAL(20,0) degrades to float64 and values >2^53
        # can't round-trip — so the *contract* column is engine-neutral text.
        F.col("big").cast("string").alias("big"),
        F.col("fixed"),
        F.col("day").cast("string").alias("day_str"),
        F.round(F.col("ratio") * 100).cast("long").alias("ratio_centis"),
    )


def oracle_nginx_custom_casts() -> str:
    lines = _CUSTOM_LINE_TEMPLATE.format(
        STR="VARCHAR", DAY="strftime(ts, '%Y-%m-%d')", EVENTS="events"
    )
    return f"""
WITH lines AS ({lines}),
fields AS (
  SELECT
    (CASE WHEN string_split(value, ' | ')[1] = '-' THEN ''
     ELSE string_split(value, ' | ')[1] END) AS big_s,
    string_split(value, ' | ')[2] AS fixed_s,
    string_split(value, ' | ')[3] AS day_s,
    string_split(value, ' | ')[4] AS ratio_s
  FROM lines
)
SELECT
  CAST(CASE WHEN big_s = '' THEN CAST(0 AS DECIMAL(20,0))
       ELSE CAST(big_s AS DECIMAL(20,0)) END AS VARCHAR) AS big,
  substr(fixed_s, 1, 6) AS fixed,
  CAST(strptime(day_s, '%Y-%m-%d') AS DATE)::VARCHAR AS day_str,
  CAST(round(CAST(CAST(ratio_s AS DOUBLE) AS DOUBLE) * 100) AS BIGINT) AS ratio_centis
FROM fields
"""


# --- syslog content extraction (S5) ----------------------------------------

_SYSLOG_PATTERN = (
    r"^<([0-9]{1,3})>([A-Z][a-z]{2}\ +[0-9]{1,2}\ [0-9:]{8})\ "
    r"([^ ]+)\ ([^ :\[]+)(\[[0-9]+\])?:\ (.*)$"
)


def q_syslog_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC3164 envelope strip: syslog frame -> content (the raw nginx line).

    Reference: internal/services/syslog/impl.go:89-98 takes parts["content"].
    """
    lines = _synth_lines(spark, sf_dir)
    framed = lines.select(
        F.concat(
            F.lit("<"),
            (F.length(F.col("value")) % 192).cast("string"),
            F.lit(">Jul 21 00:30:43 web-01 nginx: "),
            F.col("value"),
        ).alias("frame")
    )
    return framed.select(
        F.regexp_extract("frame", _SYSLOG_PATTERN, 1).cast("int").alias("pri"),
        F.regexp_extract("frame", _SYSLOG_PATTERN, 4).alias("tag"),
        F.regexp_extract("frame", _SYSLOG_PATTERN, 6).alias("content"),
    )


def oracle_syslog_extract() -> str:
    return f"""
WITH lines AS ({SYNTH_LINES_DUCK_SQL}),
framed AS (
  SELECT '<' || CAST(length(value) % 192 AS VARCHAR) || '>Jul 21 00:30:43 web-01 nginx: ' || value AS frame
  FROM lines
)
SELECT CAST(regexp_extract(frame, '{_SYSLOG_PATTERN}', 1) AS INTEGER) AS pri,
       regexp_extract(frame, '{_SYSLOG_PATTERN}', 4) AS tag,
       regexp_extract(frame, '{_SYSLOG_PATTERN}', 6) AS content
FROM framed
"""


# --- generic engine queries over the TPC-H-ish tables ------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregation (engine bench headline; fixed-point sums)."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    return f.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_100"),
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("sum_disc_10000"),
        F.count(F.lit(1)).alias("count_order"),
    )


def oracle_tpch_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_100,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_10000,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-heavy scan agg: every predicate must reach the parquet scan
    (PushedFilters) — the predicate-pushdown/column-pruning showcase."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000).cast("long")
        ).alias("revenue_10000"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def oracle_tpch_q6() -> str:
    return """
SELECT
  CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS BIGINT) AS revenue_10000,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-revenue ratio: date-filtered lineitem ⋈ broadcast part with
    a conditional numerator — the conditional-aggregate pattern.  Fixed-
    point sums; the final ratio is emitted in basis points (integer) so the
    division result is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    agg = joined.agg(
        F.sum(F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0))).alias(
            "promo_10000"
        ),
        F.sum(rev).alias("total_10000"),
    )
    return agg.select(
        "promo_10000",
        "total_10000",
        F.floor(F.col("promo_10000") * 10000 / F.col("total_10000"))
        .cast("long")
        .alias("promo_share_bp"),
    )


def oracle_tpch_q14() -> str:
    return """
SELECT
  CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
       THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
       ELSE 0 END) AS BIGINT) AS promo_10000,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_10000,
  CAST(floor(sum(CASE WHEN p_type LIKE 'PROMO%'
       THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
       ELSE 0 END) * 10000.0
       / sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))) AS BIGINT)
    AS promo_share_bp
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way join through the dimension chain; true dims broadcast, and
    lineitem⋈orders — two fact-scale tables — is left unhinted so AQE can
    pick shuffled-hash (and split skewed partitions) by *measured* size.
    A forced broadcast(orders) would OOM the driver at large SF: the hint
    overrides AQE's size check (round-1 verdict scale-killer #2)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("revenue_10000"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def oracle_tpch_q5() -> str:
    return """
SELECT r_name, n_name,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_10000,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_salted_agg_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation over user_id (operators/skew.py);
    results are salt-invariant, which is exactly what the oracle checks."""
    from grower_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    return salted_agg(
        ev,
        ["user_id"],
        [
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
            F.max("event_id").alias("mx"),
        ],
        [
            F.sum("cnt").alias("cnt"),
            F.sum("s").alias("sum_value_centis"),
            F.max("mx").alias("max_event_id"),
        ],
    ).select("user_id", "cnt", "sum_value_centis", "max_event_id")


def oracle_salted_agg_users() -> str:
    return """
SELECT user_id,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_centis,
  CAST(max(event_id) AS BIGINT) AS max_event_id
FROM events GROUP BY user_id
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority join: broadcast only the true dim (customer);
    lineitem⋈orders stays unhinted — even date-filtered, orders is half a
    fact table, and a forced broadcast overrides AQE's size check (round-1
    verdict scale-killer #2). AQE still auto-broadcasts it at tiny SF."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    return joined.groupBy("l_orderkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("revenue_10000"),
        F.max(F.to_unix_timestamp("o_orderdate")).alias("o_orderdate_epoch"),
    )


def oracle_tpch_q3() -> str:
    return """
SELECT l_orderkey,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_10000,
  CAST(max(CAST(epoch(o_orderdate) AS BIGINT)) AS BIGINT) AS o_orderdate_epoch
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey
"""


# --- training-data pipeline operators ----------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (hash-groupBy; scale: shuffle on md5)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_md5")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def oracle_dedup_exact() -> str:
    return """
SELECT md5(text) AS text_md5,
  CAST(min(doc_id) AS BIGINT) AS keep_id,
  CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY md5(text)
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics AND quality signals in one per-row pass (round-5
    consolidation of the former text_stats + text_quality rows — both were
    selects over the same token array; one row frees a registry slot for
    dedup_paragraphs).  All outputs integer / boolean / 4-decimal."""
    from grower_spark.operators.text import quality_signals

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return quality_signals(docs).select(
        "doc_id",
        "n_chars", "n_tokens", "sum_token_len", "n_stop", "n_distinct_tokens",
        "ok_length", "ok_mean_token_len", "ok_stop_ratio", "ok_alpha_ratio",
        "mean_token_len_r4", "stop_ratio_r4", "alpha_ratio_r4",
        "quality_score",
    )


def oracle_text_stats() -> str:
    from grower_spark.operators.text import STOPWORDS_EN

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH stats AS (
  SELECT doc_id,
    length(text) AS n_chars,
    len(string_split(text, ' ')) AS n_tokens,
    list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS sum_token_len,
    len(list_filter(string_split(text, ' '), t -> list_contains([{stop_list}], t))) AS n_stop,
    len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha
  FROM documents
),
sig AS (
  SELECT doc_id,
    CAST(n_chars AS INTEGER) AS n_chars,
    CAST(n_tokens AS INTEGER) AS n_tokens,
    CAST(sum_token_len AS INTEGER) AS sum_token_len,
    CAST(n_stop AS INTEGER) AS n_stop,
    CAST(n_distinct_tokens AS INTEGER) AS n_distinct_tokens,
    (n_chars >= 32 AND n_chars <= 100000) AS ok_length,
    (sum_token_len / greatest(n_tokens, 1) >= 2.0
     AND sum_token_len / greatest(n_tokens, 1) <= 12.0) AS ok_mean_token_len,
    (n_stop / greatest(n_tokens, 1) >= 0.01) AS ok_stop_ratio,
    (n_alpha / greatest(n_chars, 1) >= 0.5) AS ok_alpha_ratio,
    round(sum_token_len / greatest(n_tokens, 1), 4) AS mean_token_len_r4,
    round(n_stop / greatest(n_tokens, 1), 4) AS stop_ratio_r4,
    round(n_alpha / greatest(n_chars, 1), 4) AS alpha_ratio_r4
  FROM stats
)
SELECT *,
  CAST(ok_length AS INTEGER) + CAST(ok_mean_token_len AS INTEGER)
  + CAST(ok_stop_ratio AS INTEGER) + CAST(ok_alpha_ratio AS INTEGER) AS quality_score
FROM sig
"""


def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health report — the dataset-card numbers a
    training-data team tracks per ingest: document/token volume, mean
    quality (integer basis points of the 0..4 gate score), and the
    exact-duplicate involvement rate (share of docs whose content hash
    appears more than once, corpus-wide).  Two shuffles: the hash-count
    aggregation and the per-source rollup; everything else is the
    text_stats per-row pass.  NULL-text docs are unscorable and excluded
    (both engines drop NULL keys at the hash join)."""
    from grower_spark.functions.hashing import md5_60
    from grower_spark.operators.text import quality_signals

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    q = quality_signals(docs).select(
        "doc_id", "source", "n_tokens", "quality_score",
        md5_60(F.col("text")).alias("h60"),
    )
    sizes = q.groupBy("h60").agg(F.count(F.lit(1)).alias("_c"))
    j = q.join(sizes, "h60")
    rep = j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("quality_score").cast("long").alias("quality_sum"),
        F.sum((F.col("_c") > 1).cast("int")).cast("long").alias("n_dup_docs"),
    )
    return rep.select(
        "source", "n_docs", "total_tokens", "quality_sum", "n_dup_docs",
        F.expr("(10000 * n_dup_docs) div n_docs").alias("dup_bp"),
        F.expr("(10000 * quality_sum) div (4 * n_docs)").alias("quality_bp"),
    )


def _duck_quality_score() -> str:
    # the SQL twin of operators/text.py::quality_signals' 0..4 score —
    # shared by oracle_corpus_report and oracle_dedup_keep_best
    from grower_spark.operators.text import STOPWORDS_EN

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""CAST((length(text) >= 32 AND length(text) <= 100000) AS INTEGER)
    + CAST((list_sum(list_transform(string_split(text, ' '), t -> length(t)))
            / greatest(len(string_split(text, ' ')), 1) >= 2.0
        AND list_sum(list_transform(string_split(text, ' '), t -> length(t)))
            / greatest(len(string_split(text, ' ')), 1) <= 12.0) AS INTEGER)
    + CAST((len(list_filter(string_split(text, ' '),
                            t -> list_contains([{stop_list}], t)))
            / greatest(len(string_split(text, ' ')), 1) >= 0.01) AS INTEGER)
    + CAST((length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
            / greatest(length(text), 1) >= 0.5) AS INTEGER)"""


def oracle_corpus_report() -> str:
    h60 = _DUCK_MD5_60.format(x="text")
    return f"""
WITH d AS (
  SELECT doc_id, source,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
    {_duck_quality_score()} AS quality_score,
    {h60} AS h60
  FROM documents WHERE text IS NOT NULL
),
c AS (SELECT h60, count(*) AS cc FROM d GROUP BY 1),
j AS (SELECT d.*, c.cc FROM d JOIN c USING (h60)),
rep AS (
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
    CAST(sum(quality_score) AS BIGINT) AS quality_sum,
    CAST(sum(CASE WHEN cc > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
  FROM j GROUP BY 1
)
SELECT source, n_docs, total_tokens, quality_sum, n_dup_docs,
  CAST((10000 * n_dup_docs) // n_docs AS BIGINT) AS dup_bp,
  CAST((10000 * quality_sum) // (4 * n_docs) AS BIGINT) AS quality_bp
FROM rep
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix (r8): pairwise shingle overlap
    between sources — shared distinct 3-gram count and basis-point
    Jaccard per source pair.  One corpus shuffle (gram grouping with a
    source-bounded collect_set — never a gram-keyed self-join), then
    sources²-bounded rollups (operators/overlap.py)."""
    from grower_spark.operators.overlap import source_overlap_matrix

    docs = load_table(spark, sf_dir, "documents")
    return source_overlap_matrix(docs, shingle_n=3)


def oracle_source_overlap() -> str:
    # distinct (source, gram) via DISTINCT + the same slide; short docs
    # (< n tokens) contribute their full token join, matching shingles();
    # self-join closed form — values identical to the collect_set path
    return """
WITH t AS (
  SELECT source, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT DISTINCT source,
    array_to_string(
      list_slice(toks, CAST(i AS BIGINT), CAST(i AS BIGINT) + 2), ' '
    ) AS gram
  FROM t, unnest(range(1, greatest(len(toks) - 1, 2))) AS u(i)
),
totals AS (SELECT source, count(*) AS n FROM g GROUP BY 1),
p AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b,
  CAST(p.n AS BIGINT) AS n_shared_grams,
  CAST(CAST(p.n * 10000 AS BIGINT)
       // CAST(ta.n + tb.n - p.n AS BIGINT) AS BIGINT) AS jaccard_bp
FROM p
JOIN totals ta ON ta.source = p.source_a
JOIN totals tb ON tb.source = p.source_b
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (r8): near-dup clusters resolved
    over the ngram-jaccard pair graph, then each cluster keeps its
    highest-quality member (0..4 quality_signals score; ties to the
    lowest id) instead of blindly keeping the lowest id — the production
    dedup decision when duplicates differ in extraction quality.  Full
    audit output: every doc with its cluster, quality, and the keep
    decision.  The oracle closes the identical pair set with a recursive
    CTE and applies the same argmax window.

    The quality projection is ``localCheckpoint``-ed (r18, guide §1.2):
    ``keep_best_per_cluster`` consumes its docs frame TWICE (the member
    inner join and the singleton anti join), and without the barrier
    each consumer re-ran the full text scan + quality regex — the plan
    audit's regex ×2.  The materialized table is two integer columns
    per doc (16 B/row), far cheaper at any scale than a second full
    pass over the document text.  (The remaining text consumer is the
    pair path — a genuinely separate read.)"""
    from grower_spark.operators.dedup import (
        keep_best_per_cluster,
        ngram_jaccard_pairs,
    )
    from grower_spark.operators.text import quality_signals

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    pairs = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )
    docs_q = quality_signals(docs).select(
        "doc_id", "quality_score"
    ).localCheckpoint()
    return keep_best_per_cluster(docs_q, pairs, "quality_score",
                                 backend="star")


def oracle_dedup_keep_best() -> str:
    return f"""
WITH RECURSIVE jp AS (SELECT id_a, id_b FROM ({oracle_dedup_ngram_jaccard()}) p),
edges AS (SELECT id_a AS a, id_b AS b FROM jp
          UNION SELECT id_b AS a, id_a AS b FROM jp),
reach(n, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n
),
cl AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
d AS (
  SELECT doc_id, {_duck_quality_score()} AS quality_score
  FROM documents WHERE text IS NOT NULL
),
k AS (
  SELECT d.doc_id,
    CAST(coalesce(cl.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
    CAST(d.quality_score AS INTEGER) AS quality_score
  FROM d LEFT JOIN cl USING (doc_id)
)
SELECT doc_id, cluster_id, quality_score,
  CAST(CASE WHEN row_number() OVER (
         PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id
       ) = 1 THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM k
"""


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc n-gram novelty (r8): the share of a document's distinct
    3-grams with corpus document frequency 1 — the novelty-weighted
    sampling / curriculum signal (operators/text.py::ngram_novelty).
    One df shuffle + one gram join + one doc rollup."""
    from grower_spark.operators.text import ngram_novelty

    docs = load_table(spark, sf_dir, "documents")
    return ngram_novelty(docs, shingle_n=3)


def oracle_doc_novelty() -> str:
    # DISTINCT per-doc grams (the shingles contract, short docs -> full
    # join), df = docs per gram, unique = df 1
    return """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT DISTINCT doc_id,
    array_to_string(
      list_slice(toks, CAST(i AS BIGINT), CAST(i AS BIGINT) + 2), ' '
    ) AS gram
  FROM t, unnest(range(1, greatest(len(toks) - 1, 2))) AS u(i)
),
dfreq AS (SELECT gram, count(*) AS df FROM g GROUP BY 1)
SELECT g.doc_id,
  CAST(count(*) AS BIGINT) AS n_grams,
  CAST(sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unique_grams,
  CAST((sum(CASE WHEN dfreq.df = 1 THEN 1 ELSE 0 END) * 10000)
       // count(*) AS BIGINT) AS novelty_bp
FROM g JOIN dfreq USING (gram)
GROUP BY 1
"""


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 TF-IDF terms (r8): keyword extraction with the
    integer-micro score contract (operators/text.py::top_terms_tfidf).
    tf shuffle + df rollup + term join + doc top-k window — linear in
    corpus tokens."""
    from grower_spark.operators.text import top_terms_tfidf

    docs = load_table(spark, sf_dir, "documents")
    return top_terms_tfidf(docs, k=3)


def oracle_doc_top_terms() -> str:
    return """
WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
n AS (SELECT count(*) AS n FROM docs),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM docs
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
idf AS (
  SELECT term,
    CAST(floor(ln(CAST((SELECT n FROM n) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT)
      AS idf_micro
  FROM tf GROUP BY 1
)
SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
  CAST(tf.tf * idf.idf_micro AS BIGINT) AS score_micro,
  CAST(row_number() OVER (
    PARTITION BY tf.doc_id ORDER BY tf.tf * idf.idf_micro DESC, tf.term
  ) AS INTEGER) AS rank
FROM tf JOIN idf USING (term)
QUALIFY rank <= 3
"""


BM25_QUERIES = [
    (0, "fast hash join"),
    (1, "window agg stream"),
    (2, "slow scan filter table"),
    (3, "vector merge sort"),
]
BM25_TOPK = 5


def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (r9): rank documents against a literal query
    set with the exact-integer BM25 contract (operators/text.py::
    bm25_topk — k1=1.2/b=0.75 folded into an integer ratio, idf_micro
    floored).  One tf shuffle + a query-term-bounded df rollup + the
    1-row totals broadcast; candidates bounded by documents containing
    query terms.  No reference counterpart (superset surface)."""
    from grower_spark.operators.text import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=BM25_TOPK)


def oracle_doc_bm25() -> str:
    qvalues = ", ".join(f"({qid}, '{qtext}')" for qid, qtext in BM25_QUERIES)
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(toks)) AS BIGINT) AS sum_len
  FROM docs
),
tok AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS term
  FROM docs
),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY 1, 2, 3
),
q(qid, qtext) AS (VALUES {qvalues}),
qt AS (
  SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS term FROM q
),
dfq AS (
  SELECT tf.term, CAST(count(*) AS BIGINT) AS df
  FROM tf JOIN (SELECT DISTINCT term FROM qt) qd ON qd.term = tf.term
  GROUP BY 1
),
cand AS (
  SELECT qt.qid, tf.doc_id,
    CAST(floor(ln((tot.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
               * 1000000) AS BIGINT) AS idf,
    tf.tf, tf.dl, tot.n_docs, tot.sum_len
  FROM tf
  JOIN qt ON qt.term = tf.term
  JOIN dfq ON dfq.term = tf.term
  CROSS JOIN tot
),
scored AS (
  SELECT qid, doc_id,
    CAST(sum((idf * 22 * tf * sum_len)
             // (10 * tf * sum_len + 3 * sum_len + 9 * dl * n_docs))
         AS BIGINT) AS score_micro
  FROM cand GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, doc_id, score_micro,
  CAST(row_number() OVER (
    PARTITION BY qid ORDER BY score_micro DESC, doc_id
  ) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {BM25_TOPK}
"""


def q_events_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal-profile anomaly detection (r9): every (type, day, hour)
    traffic cell scored against its (type, hour-of-day) median/MAD
    baseline (operators/anomaly.py::hourly_baseline_outliers) — the
    seasonal complement to CUSUM's changepoint view.  One event shuffle
    to bounded cells, two cell-level median passes."""
    from grower_spark.operators.anomaly import hourly_baseline_outliers

    ev = load_table(spark, sf_dir, "events")
    return hourly_baseline_outliers(ev)


def oracle_events_hourly_baseline() -> str:
    return """
WITH cells AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
    CAST(hour(ts) AS INTEGER) AS hod,
    CAST(count(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
),
m AS (
  SELECT event_type, hod, quantile_cont(n, 0.5) AS med
  FROM cells GROUP BY 1, 2
),
d AS (
  SELECT c.event_type, c.day, c.hod, c.n, abs(c.n - m.med) AS ad
  FROM cells c JOIN m USING (event_type, hod)
),
md AS (
  SELECT event_type, hod, quantile_cont(ad, 0.5) AS mad
  FROM d GROUP BY 1, 2
)
SELECT d.event_type, d.day, d.hod, d.n,
  m.med, md.mad,
  CAST((md.mad > 0 AND d.ad > 3.0 * md.mad) AS INTEGER) AS is_outlier
FROM d
JOIN m USING (event_type, hod)
JOIN md USING (event_type, hod)
"""


TOKEN_BUDGET = 20_000


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection (r9): the best documents by the 0..4
    quality score until 20k cumulative tokens — the "top N tokens by
    quality" curation cut, computed WITHOUT a global sort
    (operators/sampling.py::select_within_token_budget: a quality-
    cardinality rollup locates the boundary stratum; only that one
    stratum gets a per-doc running-sum window).  The oracle runs the
    global-sort definition directly — row-identity IS the check."""
    from grower_spark.operators.sampling import select_within_token_budget
    from grower_spark.operators.text import quality_signals

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    sig = quality_signals(docs).select("doc_id", "quality_score", "n_tokens")
    return select_within_token_budget(sig, TOKEN_BUDGET)


def oracle_corpus_token_budget() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, {_duck_quality_score()} AS quality_score,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
o AS (
  SELECT doc_id, quality_score, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, CAST(quality_score AS BIGINT) AS quality_score,
       n_tokens, cum_tokens
FROM o WHERE cum_tokens <= {TOKEN_BUDGET}
"""


def q_nginx_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship domain end-to-end, batch-certified (r9): raw nginx
    access-log lines -> the config-compiled parse pipeline (P1-P9) ->
    per-user gap sessionization -> in-session funnel over the request
    path (view -> click -> purchase in one sitting).  The streaming twin
    (streaming_session_funnel over the same parse) is pinned
    streaming-equals-batch in tests/test_streaming_funnel.py; this row
    certifies the composed batch semantics against a full SQL
    re-derivation: independent regex parse, lag-window sessions,
    min-chain funnel.  Users are the log's authenticated remote_user
    (hyphen-scrubbed anonymous lines carry no session identity and are
    excluded); timestamps are epoch seconds, gap 30 min."""
    from grower_spark.operators.funnel import sessionized_funnel_depth

    parsed = _parsed(spark, sf_dir)
    ev = parsed.where(F.col("remote_user") != "").select(
        F.col("remote_user").alias("visitor"),
        F.to_unix_timestamp("time_local").alias("t_epoch"),
        F.regexp_extract("request", r"^GET /([a-z]+)/", 1).alias("step"),
    )
    return sessionized_funnel_depth(
        ev, _FUNNEL_STEPS, gap=1800, user_col="visitor",
        ts_col="t_epoch", type_col="step",
    ).withColumnRenamed("user_id", "visitor")


def oracle_nginx_session_funnel() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    return (
        ORACLE_PARSED_CTE
        + f""",
pe AS (
  SELECT remote_user AS visitor, tl_epoch AS t,
    regexp_extract(request, '^GET /([a-z]+)/', 1) AS e
  FROM parsed WHERE remote_user <> ''
),
g AS (
  SELECT visitor, t, e,
    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
    THEN 1 ELSE 0 END AS new_session
  FROM pe
  WINDOW w AS (PARTITION BY visitor ORDER BY t)
),
s AS (
  SELECT visitor, t, e,
    sum(new_session) OVER (PARTITION BY visitor ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
),
t1 AS (
  SELECT visitor, session_seq, min(t) AS t FROM s
  WHERE e = '{s1}' GROUP BY 1, 2
),
t2 AS (
  SELECT s.visitor, s.session_seq, min(s.t) AS t
  FROM s JOIN t1 ON t1.visitor = s.visitor
              AND t1.session_seq = s.session_seq
  WHERE s.e = '{s2}' AND s.t > t1.t GROUP BY 1, 2
),
t3 AS (
  SELECT s.visitor, s.session_seq, min(s.t) AS t
  FROM s JOIN t2 ON t2.visitor = s.visitor
              AND t2.session_seq = s.session_seq
  WHERE s.e = '{s3}' AND s.t > t2.t GROUP BY 1, 2
),
sess AS (
  SELECT visitor, session_seq, count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT sess.visitor,
  CAST(sess.session_seq AS BIGINT) AS session_seq,
  CAST(sess.n_events AS BIGINT) AS n_events,
  CAST(CAST(t1.t IS NOT NULL AS INTEGER)
     + CAST(t2.t IS NOT NULL AS INTEGER)
     + CAST(t3.t IS NOT NULL AS INTEGER) AS INTEGER) AS funnel_depth
FROM sess
LEFT JOIN t1 USING (visitor, session_seq)
LEFT JOIN t2 USING (visitor, session_seq)
LEFT JOIN t3 USING (visitor, session_seq)
"""
    )


# unique memory-sink / checkpoint suffix per in-session replay run (the
# bench calls the query repeatedly; a reused checkpoint would replay
# nothing and a reused table name collides)
_REPLAY_SEQ = [0]


def q_streaming_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship STREAMING path, driver-certified (r10, VERDICT r9
    missing item 4): the same nginx lines as ``nginx_session_funnel``
    are staged as a bounded time-ordered file sequence and replayed
    through the real Structured Streaming pipeline — ``stream_lines``
    file source -> config-compiled parse (P1-P9) -> per-user
    ``applyInPandasWithState`` sessionized funnel — to completion, and
    the CLOSED sessions are the result.  A far-future sentinel line
    advances the watermark past every real session's end + gap, so all
    sessions close and the output is batch-expressible: the oracle is
    the batch SQL re-derivation (lag-window sessions + min-chain
    funnel) extended with session bounds.  The equals-batch pytest pins
    the operator; this row makes the DRIVER's oracle run against the
    stateful streaming path too.

    Replay contract: slices partition event time into contiguous ranges
    (every event in slice k+1 is >= every event in slice k), so each
    user's events arrive in non-decreasing event-time order across
    micro-batches — the regime where the incremental fold is exact.
    The staging writes are bounded (one tiny text file per slice); the
    only driver-side collects are two scalar time bounds."""
    import os
    import shutil
    from datetime import datetime, timezone
    from glob import glob

    from grower_spark.sources.file import stream_lines
    from grower_spark.streaming.stateful import streaming_session_funnel

    gap_s, wm_s, n_slices = 1800, 3600, 3
    sentinel_uid = 9_999_999_999

    # --- stage: time-sliced line files + sentinel -----------------------
    _synth_lines(spark, sf_dir)  # registers the events_src view
    base = "/tmp/grower_replay_{}_{}".format(
        spark.sparkContext.applicationId.replace("-", "_"),
        os.path.basename(os.path.abspath(sf_dir)),
    )
    replay, staging = os.path.join(base, "replay"), os.path.join(base, "stage")
    # the staged replay is a pure function of sf_dir (deterministic synth
    # + deterministic slicing), so within a session it is built once and
    # re-streamed on every call (the bench runs this row 7x); the
    # checkpoint below is always fresh, so each call replays fully.  The
    # time-bounds scan below is STAGING-ONLY input (slice boundaries +
    # sentinel timestamp), so it lives behind this early return — it used
    # to run unconditionally, charging every replay run one needless
    # full-table agg (guide §1.2: don't compute things you throw away).
    if len(glob(os.path.join(replay, "*.log"))) == n_slices + 1:
        return _run_funnel_replay(spark, base, replay, gap_s, wm_s,
                                  sentinel_uid)
    # the shared template renders only `value`; slicing needs the event
    # time, so re-render with ts carried alongside
    head, tail = SYNTH_LINES_SPARK_SQL.rsplit("FROM", 1)
    lines_ts = spark.sql(head + ", ts FROM" + tail)
    b = lines_ts.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).collect()[0]  # bounded: two scalars
    lo_us, hi_us = int(b["lo"]), int(b["hi"])
    span = max(hi_us - lo_us + 1, 1)
    sl = F.least(
        F.floor(((F.unix_micros("ts") - F.lit(lo_us)) * n_slices) / F.lit(span)),
        F.lit(n_slices - 1),
    )

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(replay)
    for i in range(n_slices):
        lines_ts.where(sl == i).select("value").coalesce(1).write.mode(
            "overwrite"
        ).text(staging)
        shutil.move(
            glob(os.path.join(staging, "part-*"))[0],
            os.path.join(replay, f"{i:03d}.log"),
        )
    # sentinel: one parseable line far enough out that watermark(sentinel)
    # = sentinel - wm_s > hi + gap_s, timing out every real session
    sent_dt = datetime.fromtimestamp(
        hi_us // 1_000_000 + gap_s + wm_s + 3600, tz=timezone.utc
    )
    sent_tl = sent_dt.strftime("%d/%b/%Y:%H:%M:%S")
    with open(os.path.join(replay, f"{n_slices:03d}.log"), "w") as f:
        f.write(
            f"10.0.0.1 - u{sentinel_uid} [{sent_tl} +0000] "
            f'"GET /view/0 HTTP/1.1" 200 1 0.01 "GET"\n'
        )
    # the file source picks files oldest-mtime-first: pin the replay order
    t0 = 1_000_000_000
    for i, path in enumerate(sorted(glob(os.path.join(replay, "*.log")))):
        os.utime(path, (t0 + i, t0 + i))
    return _run_funnel_replay(spark, base, replay, gap_s, wm_s, sentinel_uid)


def _run_funnel_replay(spark: SparkSession, base: str, replay: str,
                       gap_s: int, wm_s: int, sentinel_uid: int) -> DataFrame:
    import os

    from grower_spark.sources.file import stream_lines
    from grower_spark.streaming.stateful import streaming_session_funnel

    raw = stream_lines(spark, replay, max_files_per_trigger=1)
    parsed = _pipeline().parse(raw)
    ev = parsed.where(F.col("remote_user") != "").select(
        F.substring("remote_user", 2, 18).cast("long").alias("user_id"),
        F.col("time_local").alias("ts"),
        F.regexp_extract("request", r"^GET /([a-z]+)/", 1).alias("event_type"),
    )
    out = streaming_session_funnel(
        ev, _FUNNEL_STEPS, gap_seconds=gap_s, watermark=f"{wm_s} seconds"
    )
    _REPLAY_SEQ[0] += 1
    name = f"ssf_replay_{_REPLAY_SEQ[0]}"
    # state partitions sized by the replay's input bytes, not the core
    # count (session.stream_state_partitions): the state-store commit is
    # per-partition-per-batch fixed cost, and this replay's state is
    # kilobytes.  The conf is scoped to the stream (state partition
    # count is pinned into the checkpoint at first batch) and restored
    # for the batch queries around it.
    from grower_spark.session import stream_state_partitions

    rbytes = sum(
        os.path.getsize(os.path.join(replay, f)) for f in os.listdir(replay)
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, rbytes)),
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.table(name)
        .where(F.col("user_id") != sentinel_uid)
        .select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias(
                "visitor"
            ),
            "session_start_us",
            "session_end_us",
            F.col("n_events").cast("long").alias("n_events"),
            F.col("funnel_depth").cast("int").alias("funnel_depth"),
        )
    )


def oracle_streaming_session_funnel() -> str:
    # identical session/funnel derivation as oracle_nginx_session_funnel,
    # plus the session bounds the streaming operator emits; the sentinel
    # exists only in the replay directory, never in the oracle's tables
    s1, s2, s3 = _FUNNEL_STEPS
    return (
        ORACLE_PARSED_CTE
        + f""",
pe AS (
  SELECT remote_user AS visitor, tl_epoch AS t,
    regexp_extract(request, '^GET /([a-z]+)/', 1) AS e
  FROM parsed WHERE remote_user <> ''
),
g AS (
  SELECT visitor, t, e,
    CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800
    THEN 1 ELSE 0 END AS new_session
  FROM pe
  WINDOW w AS (PARTITION BY visitor ORDER BY t)
),
s AS (
  SELECT visitor, t, e,
    sum(new_session) OVER (PARTITION BY visitor ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
),
t1 AS (
  SELECT visitor, session_seq, min(t) AS t FROM s
  WHERE e = '{s1}' GROUP BY 1, 2
),
t2 AS (
  SELECT s.visitor, s.session_seq, min(s.t) AS t
  FROM s JOIN t1 ON t1.visitor = s.visitor
              AND t1.session_seq = s.session_seq
  WHERE s.e = '{s2}' AND s.t > t1.t GROUP BY 1, 2
),
t3 AS (
  SELECT s.visitor, s.session_seq, min(s.t) AS t
  FROM s JOIN t2 ON t2.visitor = s.visitor
              AND t2.session_seq = s.session_seq
  WHERE s.e = '{s3}' AND s.t > t2.t GROUP BY 1, 2
),
sess AS (
  SELECT visitor, session_seq, count(*) AS n_events,
    min(t) AS t_lo, max(t) AS t_hi
  FROM s GROUP BY 1, 2
)
SELECT sess.visitor,
  CAST(sess.t_lo * 1000000 AS BIGINT) AS session_start_us,
  CAST(sess.t_hi * 1000000 AS BIGINT) AS session_end_us,
  CAST(sess.n_events AS BIGINT) AS n_events,
  CAST(CAST(t1.t IS NOT NULL AS INTEGER)
     + CAST(t2.t IS NOT NULL AS INTEGER)
     + CAST(t3.t IS NOT NULL AS INTEGER) AS INTEGER) AS funnel_depth
FROM sess
LEFT JOIN t1 USING (visitor, session_seq)
LEFT JOIN t2 USING (visitor, session_seq)
LEFT JOIN t3 USING (visitor, session_seq)
"""
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit-ish (60-bit) content fingerprint: md5 prefix as bigint."""
    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    fp = F.conv(F.substring(F.md5(F.lower(F.trim("text")).cast("binary")), 1, 15), 16, 10)
    return docs.select("doc_id", fp.cast("long").alias("fp60"))


def oracle_doc_fingerprint() -> str:
    return """
SELECT doc_id,
  CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT) AS fp60
FROM documents
"""


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    """sqrt of the same left-to-right squared fold _cosine used — kept
    as its own helper so the pair joins below can compute each side's
    norm ONCE per row instead of once per pair (bit-identical: same
    fold, same sqrt, same division order downstream)."""
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


N_ANN_QUERIES = 8
ANN_TOPK = 10


# (The HOF brute-force wrapper formerly registered as `ann_cosine_topk` was
# retired in round 4: `ann_cosine_topk_np` runs the same contract through the
# BLAS kernel and shares this oracle, and test_operators pins HOF-vs-BLAS rank
# parity at the operator level — one driver row for two identical answers was
# a slot the registry's 50-query window couldn't spare.)
def oracle_ann_cosine_topk() -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_ANN_QUERIES}
),
scored AS (
  SELECT q.qid, e.vec_id,
    round(
      list_dot_product(q.qvec, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(q.qvec, q.qvec))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))),
      4) AS sim_r4
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid
)
SELECT qid, vec_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id) AS INTEGER) AS rank,
       sim_r4
FROM scored
QUALIFY rank <= {ANN_TOPK}
"""


# testdata embeddings are random (max within-block cosine ~0.45 at sf0.001),
# so a realistic 0.9+ near-dup threshold would select nothing; 0.30 keeps the
# operator's output non-trivial while the plan shape is unchanged.
NEARDUP_THRESHOLD = 0.30


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by label — the
    ORACLE VEHICLE, not the production plan (r10 verdict item 4:
    ``embedding_neardup_lsh`` is the canonical near-dup row and leads
    in the certification window).

    Label blocking is O(sum block^2): sound only while every block is
    bounded, which a trusted label column does NOT guarantee at 100 TB
    (one dominant label = quadratic blowup).  It exists because a
    label-equality join is what the DuckDB oracle can express exactly;
    the LSH twin (bounded hyperplane buckets, same join shape,
    measured recall contract) is the plan to run at scale.
    tests/test_ann_recall.py pins the twins' pair-set relationship."""
    emb = load_table(spark, sf_dir, "embeddings")
    # norms hoisted to the join SIDES: per-row instead of per-pair (the
    # O(block²) pair stream paid two extra 64-element folds each; the
    # float result is bit-identical — same fold, same division order)
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"),
        "label", _norm(F.col("embedding")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"),
        "label", _norm(F.col("embedding")).alias("_nb"),
    )
    pairs = a.join(b, "label").where(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("_na") * F.col("_nb"))
    return (
        pairs.select("label", "id_a", "id_b", F.round(sim, 4).alias("sim_r4"))
        .where(F.col("sim_r4") >= NEARDUP_THRESHOLD)
    )


def oracle_embedding_neardup() -> str:
    return f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
  round(
    list_dot_product(a.vec, b.vec)
    / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))),
    4) AS sim_r4
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(
    list_dot_product(a.vec, b.vec)
    / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))),
    4) >= {NEARDUP_THRESHOLD}
"""


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup with the PRODUCTION blocking key: the LSH bucket
    (hyperplane sign bits) instead of a trusted label column.  Same plan
    shape — shuffle on the bounded bucket key only, never all-pairs; recall
    is the standard LSH tradeoff (same-bucket requires all sign bits to
    agree; band the planes or multi-probe to raise it)."""
    from grower_spark.operators.similarity import _bucket_expr, lsh_planes

    planes = lsh_planes(ANN_LSH_PLANES, EMB_DIM)
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "_bkt", _bucket_expr("embedding", planes)
    )
    # same per-side norm hoist as q_embedding_neardup (bit-identical)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), "_bkt", _norm(F.col("embedding")).alias("_na"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "_bkt", _norm(F.col("embedding")).alias("_nb"))
    pairs = a.join(b, "_bkt").where(F.col("id_a") < F.col("id_b"))
    sim = _dot(F.col("vec_a"), F.col("vec_b")) / (F.col("_na") * F.col("_nb"))
    return (
        pairs.select(
            F.col("_bkt").alias("bucket"), "id_a", "id_b", F.round(sim, 4).alias("sim_r4")
        )
        .where(F.col("sim_r4") >= NEARDUP_THRESHOLD)
    )


def oracle_embedding_neardup_lsh() -> str:
    from grower_spark.operators.similarity import lsh_planes

    planes = lsh_planes(ANN_LSH_PLANES, EMB_DIM)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec, CAST([{', '.join(repr(v) for v in plane)}] AS DOUBLE[])) > 0"
        f" THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    sim = (
        "round(list_dot_product(a.vec, b.vec)"
        " / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 4)"
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
bkt AS (SELECT vec_id, vec, {bucket_terms} AS bucket FROM v)
SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b, {sim} AS sim_r4
FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {sim} >= {NEARDUP_THRESHOLD}
"""


def q_events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate change-point detection (r7): one-sided CUSUM of per-minute
    bucket-count deviations per event type, via the closed window form
    S_k = P_k - min(0, running-min P) — prefix sum + running min over ONE
    type-keyed sort, no recursion (operators/anomaly.py).  Integer
    cross-multiplied deviations; earliest-bucket tie-break."""
    from grower_spark.operators.anomaly import rate_cusum

    ev = load_table(spark, sf_dir, "events")
    return rate_cusum(ev, bucket_secs=60)


def oracle_events_cusum() -> str:
    return """
WITH counts AS (
  -- FLOORED bucket start (engine-neutral): DuckDB's integer `//`
  -- TRUNCATES toward zero (probed r8: (-7)//2 = -3), so the bare
  -- `// 1000000 // 60` form would split the [-60, 0) minute in two on
  -- pre-1970 data.  `x - ((x % m) + m) % m` is the floored multiple of
  -- m for any sign (the same pmod identity the Spark side uses); the
  -- final `// 1000000` only ever sees an exact multiple, so truncation
  -- is exact there.
  SELECT event_type AS ty,
    (epoch_us(ts) - ((epoch_us(ts) % 60000000) + 60000000) % 60000000)
      // 1000000 AS bk,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT ty, min(bk) AS lo, max(bk) AS hi, sum(c) AS total
  FROM counts GROUP BY 1
),
spine AS (
  SELECT ty, total, (hi - lo) // 60 + 1 AS nb,
    unnest(range(lo, hi + 60, 60)) AS bk
  FROM span
),
filled AS (
  SELECT s.ty, s.bk, s.total, s.nb, coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN counts c ON c.ty = s.ty AND c.bk = s.bk
),
pre AS (
  SELECT ty, bk, total, nb,
    sum(nb * c - total) OVER (PARTITION BY ty ORDER BY bk) AS p
  FROM filled
),
sc AS (
  SELECT ty, bk, total, nb,
    p - least(0, min(p) OVER (PARTITION BY ty ORDER BY bk)) AS s
  FROM pre
),
mx AS (SELECT ty, max(s) AS m FROM sc GROUP BY 1)
SELECT sc.ty AS event_type,
  CAST(sc.nb AS BIGINT) AS n_buckets,
  CAST(sc.total AS BIGINT) AS total,
  CAST(mx.m AS BIGINT) AS cusum_max,
  CAST(min(sc.bk) AS BIGINT) AS peak_bucket
FROM sc JOIN mx ON mx.ty = sc.ty AND sc.s = mx.m
GROUP BY 1, 2, 3, 4
"""


def q_events_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization audit (r7): per event type, the exact p01/p99
    clamp band over value centis and how many rows each side clamps —
    the heavy-tail guard a metric column gets before aggregation
    (operators/robust.py)."""
    from grower_spark.operators.robust import winsorize

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    w = winsorize(ev, "v", "event_type", lo=0.01, hi=0.99)
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("p_lo").alias("p01"),
        F.first("p_hi").alias("p99"),
        F.sum((F.col("v") < F.col("p_lo")).cast("int")).cast("long").alias(
            "n_clamped_lo"
        ),
        F.sum((F.col("v") > F.col("p_hi")).cast("int")).cast("long").alias(
            "n_clamped_hi"
        ),
    )


def oracle_events_winsorized() -> str:
    return """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
b AS (
  SELECT event_type,
    quantile_cont(v, 0.01) AS p01, quantile_cont(v, 0.99) AS p99
  FROM v GROUP BY 1
)
SELECT v.event_type,
  CAST(count(*) AS BIGINT) AS n,
  first(b.p01) AS p01,
  first(b.p99) AS p99,
  CAST(sum(CASE WHEN v.v < b.p01 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
  CAST(sum(CASE WHEN v.v > b.p99 THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi
FROM v JOIN b USING (event_type)
GROUP BY 1
"""


def q_events_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier statistics per event type (r7): unlike
    the mean/stddev z-score (events_outliers), the estimator itself is
    immune to the outliers it hunts; zero-MAD groups flag nothing (the
    comparison is cross-multiplied, never divided)."""
    from grower_spark.operators.robust import robust_stats

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    return robust_stats(ev, "v", "event_type", z_cut=3.0)


def oracle_events_robust_stats() -> str:
    return """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
m AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM v GROUP BY 1),
d AS (
  SELECT v.event_type, abs(v.v - m.med) AS ad, m.med
  FROM v JOIN m USING (event_type)
),
md AS (
  SELECT event_type, first(med) AS med, quantile_cont(ad, 0.5) AS mad
  FROM d GROUP BY 1
)
SELECT d.event_type,
  CAST(count(*) AS BIGINT) AS n,
  first(md.med) AS med,
  first(md.mad) AS mad,
  CAST(sum(CASE WHEN md.mad > 0 AND d.ad > 3.0 * md.mad THEN 1 ELSE 0 END)
    AS BIGINT) AS n_outliers
FROM d JOIN md USING (event_type)
GROUP BY 1
"""


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level aggregate in one shuffle: ROLLUP over (event_type, day)
    produces per-(type, day), per-type, and grand-total rows with a single
    grouping-sets exchange — the hypertable-rollup shape, Catalyst-native."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("v_centis"),
        )
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_centis").alias("sum_centis"),
            F.grouping_id().alias("gid"),
        )
    )


def oracle_events_rollup() -> str:
    return """
SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_centis,
  CAST(grouping(event_type) * 2 + grouping(strftime(ts, '%Y-%m-%d')) AS BIGINT) AS gid
FROM events
GROUP BY ROLLUP(event_type, strftime(ts, '%Y-%m-%d'))
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs -> clusters: connected components over the ngram-jaccard
    near-dup pair graph (min-label propagation, one shuffle per round,
    converged — iterative, so the oracle is a recursive closure)."""
    from grower_spark.operators.dedup import duplicate_clusters, ngram_jaccard_pairs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )
    # star backend (r4): O(log^2 n) rounds instead of diameter rounds —
    # the oracle (recursive min-reachability CTE) is backend-agnostic, so
    # this also proves the star rewrite end-to-end on real pair graphs
    return duplicate_clusters(pairs, backend="star")


def oracle_dedup_clusters() -> str:
    # same pair set as dedup_ngram_jaccard, closed into components by a
    # recursive min-reachability CTE (min reachable id == the propagated
    # min label at convergence)
    return f"""
WITH RECURSIVE jp AS (SELECT id_a, id_b FROM ({oracle_dedup_ngram_jaccard()}) p),
edges AS (SELECT id_a AS a, id_b AS b FROM jp
          UNION SELECT id_b AS a, id_a AS b FROM jp),
reach(n, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n
)
SELECT n AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY n
"""


_SPLIT_SALT = "cs"
_SPLIT_HOLDOUT = 200


def q_cluster_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/holdout split (r7): documents are split by the
    hash of their near-dup CLUSTER representative (connected components
    over the ngram-jaccard pair graph, singletons self-representing), so
    paraphrase families can never straddle the split boundary.  The
    oracle closes the same pair set with a recursive CTE and applies the
    identical md5-permille label."""
    from grower_spark.operators.dedup import ngram_jaccard_pairs
    from grower_spark.operators.sampling import cluster_safe_split

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )
    return cluster_safe_split(
        docs, pairs, _SPLIT_HOLDOUT, salt=_SPLIT_SALT, backend="star"
    )


def oracle_cluster_split() -> str:
    bucket = _DUCK_MD5_60.format(
        x=f"'{_SPLIT_SALT}|' || CAST(split_key AS VARCHAR)"
    )
    return f"""
WITH RECURSIVE jp AS (SELECT id_a, id_b FROM ({oracle_dedup_ngram_jaccard()}) p),
edges AS (SELECT id_a AS a, id_b AS b FROM jp
          UNION SELECT id_b AS a, id_a AS b FROM jp),
reach(n, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n
),
cl AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
k AS (
  SELECT d.doc_id,
    CAST(coalesce(cl.cluster_id, d.doc_id) AS BIGINT) AS split_key
  FROM documents d LEFT JOIN cl USING (doc_id)
)
SELECT doc_id, split_key,
  CASE WHEN {bucket} % 1000 < {_SPLIT_HOLDOUT} THEN 'holdout'
       ELSE 'train' END AS split
FROM k
"""


def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1h window, 15m slide): each event lands
    in window_len/slide = 4 overlapping windows — F.window handles the
    fan-out before one (window, type) aggregation; partial aggregation
    keeps the shuffle tiny."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start_epoch"),
            "event_type",
            "n",
        )
    )


def oracle_events_sliding_window() -> str:
    # each event belongs to the 4 slide-aligned windows covering it:
    # starts at floor((t - k*900)/900)*900 for k in 0..3 where the 1h
    # window starting there still contains t
    return """
WITH t AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS te, event_type FROM events
),
expanded AS (
  SELECT te, event_type,
    (te // 900) * 900 - 900 * k.k AS w_start
  FROM t, (SELECT unnest(range(0, 4)) AS k) k
  WHERE (te // 900) * 900 - 900 * k.k + 3600 > te
)
SELECT w_start AS w_start_epoch, event_type, CAST(count(*) AS BIGINT) AS n
FROM expanded GROUP BY 1, 2
"""


def q_events_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped distinct count + exact interpolated quantiles in ONE
    aggregation (round-4 consolidation of the former events_distinct_users
    and events_quantiles rows — same group key, so two queries were one
    shuffle too many).

    count(DISTINCT): Catalyst plans it as a two-phase expand+agg — partial
    dedup map-side, so the shuffle carries (group, user) pairs, not raw
    rows.  `percentile` == SQL percentile_cont semantics (rank p*(n-1),
    linear interpolation — the same definition DuckDB's quantile_cont
    uses); inputs are integer centis so the interpolated midpoints are
    exact binary fractions and both engines agree bit-for-bit.  The
    approximate analogs (HLL++/t-digest) are engine-specific sketches and
    live in events_sketches with tolerance gates."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    src = ev.select("event_type", "user_id", v.alias("v"))
    # split as in q_events_sketches: a DISTINCT aggregate beside buffered
    # percentiles plans an Expand that doubles the percentile input rows;
    # two passes joined on the tiny group key avoid it, and one
    # array-of-fractions percentile shares a single sort buffer
    dist = src.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    pcts = src.groupBy("event_type").agg(
        F.expr("percentile(v, array(0.5D, 0.9D, 0.99D))").alias("_p")
    )
    return dist.join(pcts, "event_type").select(
        "event_type",
        "n_users",
        "n_events",
        F.col("_p")[0].alias("p50"),
        F.col("_p")[1].alias("p90"),
        F.col("_p")[2].alias("p99"),
    )


def oracle_events_exact_stats() -> str:
    return """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT) AS n_events,
  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.9) AS p90,
  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.99) AS p99
FROM events GROUP BY event_type
"""


def q_events_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates validated against themselves: HLL++ distinct
    count and t-digest quantiles are engine-specific sketches whose raw
    estimates can never hash-match another engine — so the query emits the
    EXACT values plus booleans asserting the sketch landed within
    tolerance.  The oracle expects (exact, true, true): if Spark's sketch
    drifts out of tolerance the booleans flip and the hash check fails,
    making even the approximate path oracle-gated."""
    ev = load_table(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("long")
    # Two aggregations joined on the (tiny) group key, NOT one: mixing
    # count_distinct with buffered aggregates makes Spark plan an Expand
    # that doubles every input row through the percentile buffers
    # (measured 2.19s combined vs 0.77s split at sf0.1 — and the 2x row
    # expansion only gets worse at 100 TB).  The join side is one row per
    # event_type, so AQE broadcasts it for free.
    dist = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", 0.02).alias("n_hll"),
    )
    # one percentile() over an array of fractions shares a single sort
    # buffer; three separate percentile() aggregates each carry their own
    # copy of every value in the group
    pcts = ev.groupBy("event_type").agg(
        F.expr(
            "percentile(CAST(round(value * 100) AS BIGINT),"
            " array(0.49D, 0.5D, 0.51D))"
        ).alias("_pcts"),
        F.percentile_approx(v, F.lit(0.5), F.lit(10000)).alias("p50_td"),
    )
    agg = dist.join(pcts, "event_type").withColumns(
        {
            "_p49": F.col("_pcts")[0],
            "p50_exact": F.col("_pcts")[1],
            "_p51": F.col("_pcts")[2],
        }
    )
    return agg.select(
        "event_type",
        "n_exact",
        (F.abs(F.col("n_hll") - F.col("n_exact")) <= F.col("n_exact") * 0.05).alias(
            "hll_within_5pct"
        ),
        "p50_exact",
        # rank-based tolerance: the t-digest median must land between the
        # exact 49th and 51st percentiles (value-based slack breaks when
        # adjacent members are far apart in a discrete distribution)
        (
            (F.col("p50_td") >= F.col("_p49")) & (F.col("p50_td") <= F.col("_p51"))
        ).alias("tdigest_within_rank_1pct"),
    )


def oracle_events_sketches() -> str:
    return """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
  true AS hll_within_5pct,
  quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50_exact,
  true AS tdigest_within_rank_1pct
FROM events GROUP BY event_type
"""


RANGE_WIN_US = 30 * 60 * 1_000_000  # 30-minute windows in epoch micros


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join: every 20th event opens a 30-minute window
    per user; each event matches every window containing it (bucketed
    range join, operators/ranges.py — one equi-join shuffle on
    (user, time bucket), never a nested-loop)."""
    from grower_spark.operators.ranges import range_join

    ev = load_table(spark, sf_dir, "events")
    points = ev.select("event_id", "user_id", F.unix_micros("ts").alias("t_us"))
    windows = ev.where(F.col("event_id") % 20 == 0).select(
        "user_id",
        F.col("event_id").alias("win_id"),
        F.unix_micros("ts").alias("win_start_us"),
        (F.unix_micros("ts") + F.lit(RANGE_WIN_US)).alias("win_end_us"),
    )
    return range_join(
        points, windows, "t_us", "win_start_us", "win_end_us",
        bucket_width=RANGE_WIN_US, keys=["user_id"],
    )


def oracle_events_range_join() -> str:
    return f"""
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
r AS (SELECT user_id, event_id AS win_id, epoch_us(ts) AS win_start_us,
             epoch_us(ts) + {RANGE_WIN_US} AS win_end_us
      FROM events WHERE event_id % 20 = 0)
SELECT l.event_id, l.user_id, l.t_us, r.win_id, r.win_start_us, r.win_end_us
FROM l JOIN r ON l.user_id = r.user_id
            AND l.t_us >= r.win_start_us AND l.t_us < r.win_end_us
"""


SESSION_GAP_MIN = 30


def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst-native session windows (F.session_window): same gap
    semantics as the hand-rolled gaps-and-islands sessionizer but as ONE
    aggregate the planner understands — and the identical expression works
    under readStream with a watermark (streaming/stateful.py uses the
    hand-rolled variant where per-event rows are needed)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_centis"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("sess_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("sess_end_us"),
            "n_events",
            "sum_centis",
        )
    )


def oracle_events_session_window() -> str:
    # gaps-and-islands: a new session starts when the gap from the previous
    # event reaches the gap duration (Spark sessions are [start, last+gap),
    # so an event exactly at prev+gap opens a new session); end = last+gap.
    return f"""
WITH marked AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS v,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              >= INTERVAL {SESSION_GAP_MIN} MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
ids AS (
  SELECT user_id, ts, v,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
  epoch_us(min(ts)) AS sess_start_us,
  epoch_us(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE) AS sess_end_us,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(v) AS BIGINT) AS sum_centis
FROM ids
GROUP BY user_id, sid
"""


# --- JSON log path (P3 — stubbed in the reference, implemented here) ---------

SYNTH_JSON_CONFIG = PipelineConfig.from_dict(
    {
        "nginx": {
            "log_type": "json",
            "log_time_format": "02/Jan/2006:15:04:05 -0700",
            "log_format": "",
        },
        "scheme": {
            "logs_table": "synthetic.access_log_json",
            "columns": dict(SYNTH_CONFIG.scheme.columns),
        },
    }
)

_SYNTH_JSON_SPARK_SQL = """
SELECT CASE WHEN event_id % 53 = 0 THEN '{"broken": '
ELSE to_json(named_struct(
  'remote_addr', '10.' || CAST(user_id % 200 AS STRING) || '.'
      || CAST(event_id % 250 AS STRING) || '.' || CAST((event_id * 7) % 250 AS STRING),
  'remote_user', CASE WHEN event_id % 10 = 0 THEN '-' ELSE 'u' || CAST(user_id AS STRING) END,
  'time_local', date_format(ts, 'dd/MMM/yyyy:HH:mm:ss') || ' +0000',
  'request', 'GET /' || event_type || '/' || CAST(event_id AS STRING) || ' HTTP/1.1',
  'status', CAST(200 + (event_id % 5) * 100 AS STRING),
  'bytes_sent', CASE WHEN event_id % 13 = 0 THEN '-'
      ELSE CAST(CAST(floor(abs(value) * 100) AS BIGINT) AS STRING) END,
  'request_time', CAST(CAST(floor(abs(value)) AS BIGINT) AS STRING) || '.'
      || lpad(CAST(CAST(floor(abs(value) * 100) AS BIGINT) % 100 AS STRING), 2, '0'),
  'request_method', 'GET'
)) END AS value
FROM events_src
"""


def q_nginx_parse_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-framed logs through the same cast pipeline (from_json path)."""
    events = _cpu_spread(spark, load_table(spark, sf_dir, "events"))
    events.createOrReplaceTempView("events_src")
    lines = spark.sql(_SYNTH_JSON_SPARK_SQL)
    pipeline = LogPipeline(SYNTH_JSON_CONFIG, now=F.lit(FIXED_NOW).cast("timestamp"))
    parsed = pipeline.parse(lines)
    return parsed.select(
        "remote_addr",
        "remote_user",
        "request",
        "status",
        "bytes_sent",
        F.round(F.col("request_time").cast("double") * 100).cast("long").alias("rt_centis"),
        F.to_unix_timestamp("time_local").alias("tl_epoch"),
    )


def oracle_nginx_parse_json() -> str:
    # Independent ground truth: the JSON framing round-trips the same field
    # values the csv flagship uses, so the oracle derives them straight from
    # events (rows with event_id % 53 = 0 are unparseable -> dropped).
    return """
SELECT
  '10.' || CAST(user_id % 200 AS VARCHAR) || '.' || CAST(event_id % 250 AS VARCHAR)
      || '.' || CAST((event_id * 7) % 250 AS VARCHAR) AS remote_addr,
  CASE WHEN event_id % 10 = 0 THEN '' ELSE 'u' || CAST(user_id AS VARCHAR) END AS remote_user,
  'GET /' || event_type || '/' || CAST(event_id AS VARCHAR) || ' HTTP/1.1' AS request,
  CAST(200 + (event_id % 5) * 100 AS INTEGER) AS status,
  CAST(CASE WHEN event_id % 13 = 0 THEN 0
       ELSE CAST(floor(abs(value) * 100) AS BIGINT) END AS BIGINT) AS bytes_sent,
  CAST(round(CAST(CAST(
      CAST(CAST(floor(abs(value)) AS BIGINT) AS VARCHAR) || '.'
      || lpad(CAST(CAST(floor(abs(value) * 100) AS BIGINT) % 100 AS VARCHAR), 2, '0')
    AS REAL) AS DOUBLE) * 100) AS BIGINT) AS rt_centis,
  CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tl_epoch
FROM events
WHERE event_id % 53 <> 0
"""


# --- engine capability: event-time windows, sessionization, top-k ------------

def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (batch form of the streaming
    windowed agg; same F.window operator powers watermarked streams)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_centis"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.to_unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "cnt",
            "sum_value_centis",
            "n_users",
        )
    )


def oracle_events_window_agg() -> str:
    return """
SELECT
  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start_epoch,
  event_type,
  CAST(count(*) AS BIGINT) AS cnt,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_centis,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""


_FUNNEL_STEPS = ["view", "click", "purchase"]


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel progression (r7): view -> click -> purchase, each
    step strictly after the previous.  One user shuffle + a single
    left-to-right fold over each user's time-sorted step events
    (operators/funnel.py) — vs the k-shuffle min-per-step alternative
    the oracle uses as the independent closed form."""
    from grower_spark.operators.funnel import funnel_depth

    ev = load_table(spark, sf_dir, "events")
    return funnel_depth(ev, _FUNNEL_STEPS)


def oracle_events_funnel() -> str:
    # the min-chain closed form: t_k = earliest step-k event strictly
    # after t_{k-1}; depth = how many t_k exist
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
WITH t1 AS (
  SELECT user_id, min(epoch_ns(ts)) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = '{s2}' AND epoch_ns(e.ts) > t1.t GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = '{s3}' AND epoch_ns(e.ts) > t2.t GROUP BY 1
),
u AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id,
  CAST(CAST(t1.t IS NOT NULL AS INTEGER)
     + CAST(t2.t IS NOT NULL AS INTEGER)
     + CAST(t3.t IS NOT NULL AS INTEGER) AS INTEGER) AS funnel_depth
FROM u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)
"""


def q_events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionized funnel (r8, VERDICT r7 item 7): funnel progression
    WITHIN 30-min gap-sessions — "view -> click -> purchase in one
    sitting", the per-session composition of the sessionize window and
    the single-fold funnel.  ONE shuffle total: the user-keyed session
    window's partitioning is reused by the per-(user, session) fold
    aggregation (plan-pinned).  The oracle re-derives sessions in SQL
    and applies the tie-order-independent min-chain closed form per
    session."""
    from grower_spark.operators.funnel import sessionized_funnel_depth

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    return sessionized_funnel_depth(
        ev, _FUNNEL_STEPS, gap=SESSION_GAP_US, ts_col="ts_us"
    )


def oracle_events_session_funnel() -> str:
    # sessionize exactly as oracle_events_sessionize, then the min-chain
    # closed form (t_k = earliest step-k event strictly after t_{k-1})
    # per (user, session) — independent of tie order within the session
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
WITH g AS (
  SELECT user_id, epoch_us(ts) AS t, event_type AS e,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
    THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
s AS (
  SELECT user_id, t, e,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
),
t1 AS (
  SELECT user_id, session_seq, min(t) AS t FROM s
  WHERE e = '{s1}' GROUP BY 1, 2
),
t2 AS (
  SELECT s.user_id, s.session_seq, min(s.t) AS t
  FROM s JOIN t1 ON t1.user_id = s.user_id
              AND t1.session_seq = s.session_seq
  WHERE s.e = '{s2}' AND s.t > t1.t GROUP BY 1, 2
),
t3 AS (
  SELECT s.user_id, s.session_seq, min(s.t) AS t
  FROM s JOIN t2 ON t2.user_id = s.user_id
              AND t2.session_seq = s.session_seq
  WHERE s.e = '{s3}' AND s.t > t2.t GROUP BY 1, 2
),
sess AS (
  SELECT user_id, session_seq, count(*) AS n_events
  FROM s GROUP BY 1, 2
)
SELECT sess.user_id,
  CAST(sess.session_seq AS BIGINT) AS session_seq,
  CAST(sess.n_events AS BIGINT) AS n_events,
  CAST(CAST(t1.t IS NOT NULL AS INTEGER)
     + CAST(t2.t IS NOT NULL AS INTEGER)
     + CAST(t3.t IS NOT NULL AS INTEGER) AS INTEGER) AS funnel_depth
FROM sess
LEFT JOIN t1 USING (user_id, session_seq)
LEFT JOIN t2 USING (user_id, session_seq)
LEFT JOIN t3 USING (user_id, session_seq)
"""


def q_events_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step timing (r8): per step, users reached and the exact
    median time from the previous step — the same single-fold funnel
    pass carrying advance TIMES (greedy == min-chain, so the oracle's
    closed form re-derives identical gaps), then a step-cardinality
    rollup with percentile_disc."""
    from grower_spark.operators.funnel import funnel_step_times

    ev = load_table(spark, sf_dir, "events")
    return funnel_step_times(ev, _FUNNEL_STEPS)


def oracle_events_funnel_timing() -> str:
    s1, s2, s3 = _FUNNEL_STEPS
    return f"""
WITH t1 AS (
  SELECT user_id, min(epoch_ns(ts)) AS t FROM events
  WHERE event_type = '{s1}' GROUP BY 1
),
t2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
  FROM events e JOIN t1 ON t1.user_id = e.user_id
  WHERE e.event_type = '{s2}' AND epoch_ns(e.ts) > t1.t GROUP BY 1
),
t3 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS t
  FROM events e JOIN t2 ON t2.user_id = e.user_id
  WHERE e.event_type = '{s3}' AND epoch_ns(e.ts) > t2.t GROUP BY 1
),
g2 AS (
  SELECT t2.t - t1.t AS gap FROM t2 JOIN t1 USING (user_id)
),
g3 AS (
  SELECT t3.t - t2.t AS gap FROM t3 JOIN t2 USING (user_id)
)
SELECT CAST(2 AS INTEGER) AS step, '{s2}' AS step_name,
  CAST(count(*) AS BIGINT) AS n_reached,
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
    AS p50_gap
FROM g2 HAVING count(*) > 0
UNION ALL
SELECT CAST(3 AS INTEGER), '{s3}',
  CAST(count(*) AS BIGINT),
  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
FROM g3 HAVING count(*) > 0
"""


def q_events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/stickiness engagement panel (r8): per calendar day,
    distinct actives, trailing-7-day distinct actives, and DAU/WAU in
    basis points (operators/retention.py::active_user_stats).  The
    trailing distinct is an explode-into-window-ends pass — linear,
    never a day-range self-join."""
    from grower_spark.operators.retention import active_user_stats

    ev = load_table(spark, sf_dir, "events")
    return active_user_stats(ev, window_days=7)


def oracle_events_dau_wau() -> str:
    return """
WITH act AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM act),
spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
    AS day
  FROM b
),
dau AS (SELECT day, count(*) AS n FROM act GROUP BY 1),
trail AS (
  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
  FROM act, unnest(range(0, 7)) AS u(i)
),
wau AS (SELECT day, count(*) AS n FROM trail GROUP BY 1)
SELECT strftime(s.day, '%Y-%m-%d') AS day,
  CAST(coalesce(dau.n, 0) AS BIGINT) AS dau,
  CAST(coalesce(wau.n, 0) AS BIGINT) AS wau,
  CAST(CASE WHEN coalesce(wau.n, 0) > 0
       THEN (coalesce(dau.n, 0) * 10000) // wau.n ELSE 0 END AS BIGINT)
    AS stickiness_bp
FROM spine s LEFT JOIN dau USING (day) LEFT JOIN wau USING (day)
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (r7): users bucketed by first-activity
    week, counted per (cohort, week offset) — the companion report to
    the funnel.  Aggregations shrink to user- then cohort-cardinality
    after one map-side week truncation (operators/retention.py)."""
    from grower_spark.operators.retention import retention_cohorts

    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev)


def oracle_events_retention() -> str:
    # same derivation: distinct (user, monday-truncated week), first week
    # per user, counts by (cohort, week diff / 7)
    return """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
),
first AS (SELECT user_id, min(week) AS cohort FROM act GROUP BY 1),
j AS (
  SELECT f.cohort,
    CAST(date_diff('day', f.cohort, a.week) // 7 AS INTEGER) AS week_offset
  FROM act a JOIN first f USING (user_id)
)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week, week_offset,
  CAST(count(*) AS BIGINT) AS n_users
FROM j GROUP BY 1, 2
"""


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (r7): consecutive event-type
    pairs per user's time-ordered stream, counted — one user-keyed lag
    window + a type²-cardinality rollup (operators/retention.py).  Tie
    order (ts, type) pinned on both engines."""
    from grower_spark.operators.retention import event_transitions

    ev = load_table(spark, sf_dir, "events")
    return event_transitions(ev)


def oracle_events_transitions() -> str:
    return """
WITH seq AS (
  SELECT event_type AS to_type,
    lag(event_type) OVER (
      PARTITION BY user_id ORDER BY epoch_ns(ts), event_type
    ) AS from_type
  FROM events
)
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE from_type IS NOT NULL
GROUP BY 1, 2
"""


def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 3-step event paths (r8): the order-sensitive journey
    report over (ts, type)-ordered per-user streams
    (operators/retention.py::top_event_paths).  One user-keyed window
    shuffle + a type^3-bounded rollup + a bounded top-k sort."""
    from grower_spark.operators.retention import top_event_paths

    ev = load_table(spark, sf_dir, "events")
    return top_event_paths(ev, length=3, k=20)


def oracle_events_top_paths() -> str:
    return """
WITH seq AS (
  SELECT
    lag(event_type, 2) OVER w AS a,
    lag(event_type, 1) OVER w AS b,
    event_type AS c
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_type)
),
counts AS (
  SELECT a || '>' || b || '>' || c AS path, count(*) AS n
  FROM seq WHERE a IS NOT NULL
  GROUP BY 1
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS INTEGER) AS rank,
  path, CAST(n AS BIGINT) AS n
FROM counts
QUALIFY rank <= 20
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    after >30min inactivity per user.  One shuffle on user_id; both window
    functions reuse the same partitioning."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gapped = ev.withColumn("prev_us", F.lag("ts_us").over(w)).withColumn(
        "new_session",
        (F.col("prev_us").isNull() | (F.col("ts_us") - F.col("prev_us") > SESSION_GAP_US)).cast("int"),
    )
    sessions = gapped.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_centis"),
    )


def oracle_events_sessionize() -> str:
    return f"""
WITH g AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
    THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
s AS (
  SELECT user_id, ts_us, value,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  CAST(min(ts_us) AS BIGINT) AS session_start_us,
  CAST(max(ts_us) AS BIGINT) AS session_end_us,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_centis
FROM s GROUP BY user_id, session_seq
"""


def q_events_topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events by value per user (window row_number; the grouped
    top-k building block)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_centis", F.round(F.col("value") * 100).cast("long")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value_centis"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("user_id", "event_id", "event_type", "value_centis", "rank")
    )


def oracle_events_topk_per_user() -> str:
    return """
SELECT user_id, event_id, event_type,
  CAST(round(value * 100) AS BIGINT) AS value_centis,
  CAST(row_number() OVER (PARTITION BY user_id
       ORDER BY CAST(round(value * 100) AS BIGINT) DESC, event_id) AS INTEGER) AS rank
FROM events
QUALIFY rank <= 3
"""


# ---------------------------------------------------------------------------
# Operator queries: dedup / similarity / text analysis / multimodal
# (grower_spark.operators) with generated DuckDB oracles.  The shared
# md5-60bit hash makes the probabilistic operators (MinHash, SimHash, LSH)
# bit-for-bit reproducible on both engines.
# ---------------------------------------------------------------------------

_DUCK_MD5_60 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"

MINHASH_PERMS = 16
MINHASH_BANDS = 4
SHINGLE_N = 3


def _duck_shingles(text: str = "text") -> str:
    toks = f"string_split({text}, ' ')"
    n_sh = f"greatest(len({toks}) - {SHINGLE_N - 1}, 1)"
    return (
        f"list_distinct(list_transform(range(1, {n_sh} + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {SHINGLE_N - 1}), ' ')))"
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.dedup import minhash_lsh_pairs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return minhash_lsh_pairs(
        docs, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, hash_fn="md5",
    )


def oracle_dedup_minhash_lsh() -> str:
    from grower_spark.operators.dedup import MINHASH_PRIME, minhash_perm_params

    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    params = minhash_perm_params(MINHASH_PERMS)
    base = "list_transform(sh, s -> " + _DUCK_MD5_60.format(x="s") + " % 1073741824)"
    sig_exprs = ", ".join(
        f"list_min(list_transform(bh, h -> (h * {a} + {b}) % {MINHASH_PRIME})) AS sig{p}"
        for p, (a, b) in enumerate(params)
    )
    band_exprs = ", ".join(
        "'" + str(b) + "_' || "
        + " || '_' || ".join(
            f"CAST(sig{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH shing AS (
  SELECT doc_id, {_duck_shingles()} AS sh FROM documents
),
based AS (
  SELECT doc_id, {base} AS bh FROM shing
),
sigs AS (
  SELECT doc_id, {sig_exprs} FROM based
),
buckets AS (
  SELECT doc_id, unnest([{band_exprs}]) AS bucket FROM sigs
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_bands
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
"""


SIMHASH_BITS = 32


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.dedup import simhash

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return simhash(docs, bits=SIMHASH_BITS, hash_fn="md5").select("doc_id", "simhash")


def oracle_dedup_simhash(bits: int = SIMHASH_BITS) -> str:
    th = (
        "list_transform(string_split(text, ' '), t -> "
        + _DUCK_MD5_60.format(x="t")
        + ")"
    )
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(th, h -> (h >> {i}) % 2 = 1)) > len(th)"
        f" THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
WITH hashed AS (SELECT doc_id, {th} AS th FROM documents)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM hashed
"""


# Pair-blocking config (r10 rework): the r9 row used bits=32 with 8
# single-block keys of 4 bits each — 16 possible values per key, so every
# bucket held ~n/16 docs and the posting-list pair emit was quadratic in
# the corpus (measured 26.6 s / ~6M candidate pairs at sf0.1 the first
# time the row was benched).  Now: 56-bit simhash (within the 60-bit md5
# token hash), 8 blocks of 7 bits, keys = all C(8,2)=28 two-block
# combinations -> 14-bit keys (16,384 values), so bucket load scales as
# n/2^14 per key space and the candidate set approaches the true near-dup
# count.  Recall guarantee intact: 6 flips corrupt <= 6 of 8 blocks,
# leaving >= 2 clean blocks = one emitted combination (combo <= bands -
# max_hamming).
SIMHASH_PAIR_BITS = 56
SIMHASH_PAIR_BANDS = 8
SIMHASH_PAIR_COMBO = 2
SIMHASH_MAX_HAMMING = 6


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded simhash near-dup pairs: blocking on every C(bands, combo)
    block combination with combo <= bands - max_hamming gives total
    recall by pigeonhole (Manku et al., WWW 2007), so the oracle is the
    naive all-pairs hamming filter while the Spark plan only ever
    shuffles on combination keys."""
    from grower_spark.operators.dedup import simhash_banded_pairs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return simhash_banded_pairs(
        docs, bits=SIMHASH_PAIR_BITS, bands=SIMHASH_PAIR_BANDS,
        max_hamming=SIMHASH_MAX_HAMMING, hash_fn="md5",
        combo=SIMHASH_PAIR_COMBO,
    )


def oracle_dedup_simhash_pairs() -> str:
    return f"""
WITH sh AS ({oracle_dedup_simhash(bits=SIMHASH_PAIR_BITS)})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""


JACCARD_THRESHOLD = 0.12
# stop-shingle cap: drops shingles shared by more docs than this before the
# self-join (the skew guard that keeps the join subquadratic); mirrored in
# the oracle so both engines see the same candidate set
JACCARD_MAX_DF = 100


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.dedup import ngram_jaccard_pairs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )


def oracle_dedup_ngram_jaccard() -> str:
    return f"""
WITH shing AS (
  SELECT doc_id, {_duck_shingles()} AS sh FROM documents
),
inv0 AS (
  SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM shing
),
rare AS (
  SELECT s FROM inv0 GROUP BY s HAVING count(DISTINCT doc_id) <= {JACCARD_MAX_DF}
),
inv AS (
  SELECT inv0.* FROM inv0 JOIN rare ON inv0.s = rare.s
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS size_a, b.sz AS size_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, inter, CAST(size_a AS INTEGER) AS size_a,
       CAST(size_b AS INTEGER) AS size_b,
       round(inter / (size_a + size_b - inter), 4) AS jaccard_r4
FROM pairs
WHERE round(inter / (size_a + size_b - inter), 4) >= {JACCARD_THRESHOLD}
"""


ANN_LSH_PLANES = 8
EMB_DIM = 64


def _ann_queries(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return emb, q


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.similarity import lsh_ann_topk

    emb, q = _ann_queries(spark, sf_dir)
    return lsh_ann_topk(emb, q, k=ANN_TOPK, n_planes=ANN_LSH_PLANES, dim=EMB_DIM)


def oracle_ann_lsh() -> str:
    from grower_spark.operators.similarity import lsh_planes

    planes = lsh_planes(ANN_LSH_PLANES, EMB_DIM)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(vec, CAST([{', '.join(repr(v) for v in plane)}] AS DOUBLE[])) > 0"
        f" THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
b AS (SELECT vec_id, vec, {bucket_terms} AS bkt FROM v),
q AS (SELECT vec_id AS qid, vec AS qvec, bkt FROM b WHERE vec_id < {N_ANN_QUERIES}),
cand AS (
  SELECT q.qid, c.vec_id,
    round(list_dot_product(q.qvec, c.vec)
      / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))), 4) AS sim_r4
  FROM b c JOIN q ON c.bkt = q.bkt AND c.vec_id <> q.qid
)
SELECT qid, vec_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id) AS INTEGER) AS rank,
       sim_r4
FROM cand
QUALIFY rank <= {ANN_TOPK}
"""


def q_ann_cosine_topk_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k through the BLAS-matmul Pandas-UDF scorer
    (operators/similarity.py::cosine_topk_np): one matmul per Arrow batch,
    map-side partial top-k, same output contract as ann_cosine_topk — so
    it shares that query's oracle verbatim.  Measured vs the Catalyst-HOF
    scorer at sf0.1: 1.56s -> 0.64s at dim 64, 7.4s -> 1.6s at dim 768."""
    from grower_spark.operators.similarity import cosine_topk_np

    emb, q = _ann_queries(spark, sf_dir)
    return cosine_topk_np(emb, q, k=ANN_TOPK)


ANN_PROBES = 4


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-directed multi-probe LSH: each query also searches the buckets
    reached by flipping its ANN_PROBES lowest-|margin| sign bits.  Measured
    at sf0.01: recall@10 vs brute force rises 0.01 -> 0.09 from probes 0->4
    at ~5x candidate volume (still a vanishing fraction of the corpus)."""
    from grower_spark.operators.similarity import lsh_ann_topk

    emb, q = _ann_queries(spark, sf_dir)
    return lsh_ann_topk(
        emb, q, k=ANN_TOPK, n_planes=ANN_LSH_PLANES, dim=EMB_DIM, n_probes=ANN_PROBES
    )


def oracle_ann_lsh_multiprobe() -> str:
    from grower_spark.operators.similarity import lsh_planes

    planes = lsh_planes(ANN_LSH_PLANES, EMB_DIM)

    def dot(plane):
        return f"list_dot_product(vec, CAST([{', '.join(repr(v) for v in plane)}] AS DOUBLE[]))"

    bucket_terms = " + ".join(
        f"(CASE WHEN {dot(plane)} > 0 THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p, plane in enumerate(planes)
    )
    margin_terms = ", ".join(
        f"{{'m': abs({dot(plane)}), 'pw': CAST({1 << p} AS BIGINT)}}"
        for p, plane in enumerate(planes)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
b AS (SELECT vec_id, vec, {bucket_terms} AS bkt FROM v),
bm AS (SELECT vec_id, vec, bkt, [{margin_terms}] AS margins FROM v
       JOIN (SELECT vec_id AS vid2, bkt FROM b) ON vec_id = vid2
       WHERE vec_id < {N_ANN_QUERIES}),
q AS (SELECT vec_id AS qid, vec AS qvec,
        list_concat([bkt],
          list_transform(list_slice(list_sort(margins), 1, {ANN_PROBES}),
                         s -> xor(bkt, s.pw))) AS probes
      FROM bm),
qp AS (SELECT qid, qvec, unnest(probes) AS bkt FROM q),
cand AS (
  SELECT qp.qid, c.vec_id,
    round(list_dot_product(qp.qvec, c.vec)
      / (sqrt(list_dot_product(qp.qvec, qp.qvec)) * sqrt(list_dot_product(c.vec, c.vec))), 4) AS sim_r4
  FROM b c JOIN qp ON c.bkt = qp.bkt AND c.vec_id <> qp.qid
)
SELECT qid, vec_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id) AS INTEGER) AS rank,
       sim_r4
FROM cand
QUALIFY rank <= {ANN_TOPK}
"""


IVF_CELLS = 16
IVF_PROBE = 2


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse quantizer (16 unit-norm cells),
    map-side cell assignment, 2-cell probe per query, exact re-rank."""
    from grower_spark.operators.similarity import ivf_ann_topk

    emb, q = _ann_queries(spark, sf_dir)
    return ivf_ann_topk(
        emb, q, k=ANN_TOPK, n_cells=IVF_CELLS, n_probe=IVF_PROBE, dim=EMB_DIM
    )


def oracle_ann_ivf() -> str:
    from grower_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(IVF_CELLS, EMB_DIM)
    ranked_terms = ", ".join(
        f"{{'m': -list_dot_product(vec, CAST([{', '.join(repr(v) for v in cent)}] AS DOUBLE[])), "
        f"'i': CAST({i} AS INTEGER)}}"
        for i, cent in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
ranked AS (SELECT vec_id, vec,
             list_transform(list_sort([{ranked_terms}]), s -> s.i) AS cells
           FROM v),
c AS (SELECT vec_id, vec, cells[1] AS cell FROM ranked),
q AS (SELECT vec_id AS qid, vec AS qvec, unnest(list_slice(cells, 1, {IVF_PROBE})) AS cell
      FROM ranked WHERE vec_id < {N_ANN_QUERIES}),
cand AS (
  SELECT q.qid, c.vec_id,
    round(list_dot_product(q.qvec, c.vec)
      / (sqrt(list_dot_product(q.qvec, q.qvec)) * sqrt(list_dot_product(c.vec, c.vec))), 4) AS sim_r4
  FROM c JOIN q ON c.cell = q.cell AND c.vec_id <> q.qid
)
SELECT qid, vec_id,
       CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id) AS INTEGER) AS rank,
       sim_r4
FROM cand
QUALIFY rank <= {ANN_TOPK}
"""


_KMEANS_K = 8
_KMEANS_ITER = 2


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means topic clustering (r8): 2 Lloyd passes over
    integer-micro-quantized embeddings, seeded by the 8 lowest vec_ids —
    every float source of nondeterminism pinned (exact int64 distances,
    floored integer centroid means, (dist, cid) ties), so the full
    iterative algorithm certifies against a SQL re-derivation.  Each pass
    is a zero-join map assignment (centroids as plan literals) plus one
    k*dim-bounded rollup (operators/clustering.py)."""
    from grower_spark.operators.clustering import kmeans_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_quantized(emb, k=_KMEANS_K, n_iter=_KMEANS_ITER)


def oracle_embedding_kmeans() -> str:
    # the same two passes re-derived: quantize, assign to seed argmin
    # (dist, cid), floored-integer-mean centroid update with empty
    # clusters keeping their seed, reassign
    k, dim = _KMEANS_K, EMB_DIM
    return f"""
WITH q AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]),
                   x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xq
  FROM embeddings WHERE embedding IS NOT NULL
),
seeds AS (
  SELECT xq AS cq,
    CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid
  FROM q ORDER BY vec_id LIMIT {k}
),
a1 AS (
  SELECT q.vec_id, q.xq, s.cid,
    list_sum(list_transform(range(1, {dim + 1}),
      i -> (q.xq[i] - s.cq[i]) * (q.xq[i] - s.cq[i]))) AS d
  FROM q CROSS JOIN seeds s
),
asg1 AS (
  SELECT vec_id, xq, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM a1
  ) WHERE rn = 1
),
comp AS (
  SELECT cid, CAST(i AS INTEGER) AS pos, xq[CAST(i AS BIGINT)] AS v
  FROM asg1, unnest(range(1, {dim + 1})) AS u(i)
),
m AS (
  -- floored integer mean: DuckDB // truncates, so apply the pmod floor
  -- identity before dividing by the (positive) count
  SELECT cid, pos,
    (sum(v) - ((sum(v) % count(*)) + count(*)) % count(*)) // count(*) AS c
  FROM comp GROUP BY 1, 2
),
mv AS (SELECT cid, list(c ORDER BY pos) AS cq FROM m GROUP BY 1),
cent2 AS (
  SELECT s.cid, coalesce(mv.cq, s.cq) AS cq
  FROM seeds s LEFT JOIN mv USING (cid)
),
a2 AS (
  SELECT q.vec_id, c.cid,
    list_sum(list_transform(range(1, {dim + 1}),
      i -> (q.xq[i] - c.cq[i]) * (q.xq[i] - c.cq[i]))) AS d
  FROM q CROSS JOIN cent2 c
)
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, CAST(d AS BIGINT) AS dist_sq_q
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM a2
) WHERE rn = 1
"""


def q_kmeans_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced representatives (r8): the 10 most-central members
    of each k-means cluster — deterministic coreset selection
    (operators/clustering.py::kmeans_representatives).  The k-means
    passes + one cluster-keyed top-m window."""
    from grower_spark.operators.clustering import kmeans_representatives

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_representatives(emb, k=_KMEANS_K, n_iter=_KMEANS_ITER,
                                  m=10)


def oracle_kmeans_representatives() -> str:
    return f"""
SELECT vec_id, cluster, dist_sq_q,
  CAST(row_number() OVER (
    PARTITION BY cluster ORDER BY dist_sq_q, vec_id
  ) AS INTEGER) AS rank
FROM ({oracle_embedding_kmeans()})
QUALIFY rank <= 10
"""


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic-balanced downsampling (r9): every k-means cluster contributes
    the same number of vectors (the smallest cluster's size), members
    picked by engine-portable md5 rank within the cluster
    (operators/sampling.py::cluster_balanced_sample over the certified
    kmeans_quantized assignment) — the curation step that stops a
    majority topic from dominating a training mix."""
    from grower_spark.operators.clustering import kmeans_quantized
    from grower_spark.operators.sampling import cluster_balanced_sample

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_quantized(emb, k=_KMEANS_K, n_iter=_KMEANS_ITER)
    return cluster_balanced_sample(assigned, salt="cbs")


def oracle_cluster_balanced_sample() -> str:
    h = _DUCK_MD5_60.format(x="'cbs|' || CAST(vec_id AS VARCHAR)")
    return f"""
WITH asg AS (SELECT vec_id, cluster FROM ({oracle_embedding_kmeans()})),
target AS (
  SELECT min(n) AS t FROM (
    SELECT cluster, count(*) AS n FROM asg GROUP BY 1
  )
),
ranked AS (
  SELECT vec_id, cluster,
    CAST(row_number() OVER (
      PARTITION BY cluster ORDER BY {h}, vec_id
    ) AS INTEGER) AS pick_rank
  FROM asg
)
SELECT vec_id, cluster, pick_rank
FROM ranked CROSS JOIN target
WHERE pick_rank <= target.t
"""


def q_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim equi-join (operators/skew.py::salted_join): the
    events fact is salted, the customer dim replicated per salt, so one hot
    user cannot pin a single reducer.  Output is salt-invariant — exactly a
    plain join — which is precisely what the oracle checks."""
    from grower_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("user_name"),
        F.col("c_nationkey").alias("user_nation"),
    )
    return salted_join(ev, dim, ["user_id"], n_salts=8)


def oracle_salted_join_events() -> str:
    return """
SELECT e.user_id, e.event_id, c.c_name AS user_name,
       c.c_nationkey AS user_nation
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup: stamp every event with the latest 'mark'
    (every 20th event) at-or-before it for the same user — the as-of join
    a pipeline needs for config-change / deploy-marker attribution.
    (user_id, ts) is unique among marks in this dataset, so the match is
    well-defined; epoch micros is the asof time on both engines."""
    from grower_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("event_id", "user_id", F.unix_micros("ts").alias("t_us"))
    right = ev.where(F.col("event_id") % 20 == 0).select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        F.col("event_id").alias("mark_id"),
        F.round(F.col("value") * 100).cast("long").alias("mark_value_centis"),
    )
    return asof_join(
        left, right, ["user_id"], "t_us", ["mark_id", "mark_value_centis"]
    )


def oracle_events_asof_join() -> str:
    return """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
r AS (SELECT user_id, epoch_us(ts) AS t_us, event_id AS mark_id,
             CAST(round(value * 100) AS BIGINT) AS mark_value_centis
      FROM events WHERE event_id % 20 = 0)
SELECT l.event_id, l.user_id, l.t_us, r.mark_id, r.mark_value_centis
FROM l ASOF LEFT JOIN r
  ON l.user_id = r.user_id AND l.t_us >= r.t_us
"""


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.text import language_id

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return language_id(docs).select("doc_id", "lang_guess")


def oracle_text_lang_id() -> str:
    from grower_spark.operators.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    counts = ", ".join(
        "len(list_filter(string_split(text, ' '), t -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        + f"], t))) AS c_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
WITH counts AS (SELECT doc_id, {counts} FROM documents)
SELECT doc_id, CASE {case} END AS lang_guess FROM counts
"""


_PARA_SEP = " a "
_PARA_MIN_DF = 2


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level common-paragraph removal (C4/RefinedWeb line-level
    dedup): every segment occurring >= min_df times across the corpus is
    dropped from every document; the rest of each document survives in
    order.

    The synthetic documents fixture has no newline paragraphs, so the
    driver row segments on the literal token separator ``" a "`` — an
    arbitrary but deterministic boundary that exercises the identical
    plumbing (split -> corpus hash-count -> AQE-broadcast common set ->
    ordered reassembly) a real ``"\\n\\n"`` corpus would."""
    from grower_spark.operators.dedup import drop_common_paragraphs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return drop_common_paragraphs(
        docs, min_df=_PARA_MIN_DF, sep=_PARA_SEP
    )


def oracle_dedup_paragraphs() -> str:
    # Same split (literal separator), same 60-bit md5 count key, same
    # keep/drop rule, reassembly ordered by original segment position.
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, '{_PARA_SEP}') AS l
  FROM documents WHERE text IS NOT NULL
),
paras AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) AS pos, l
  FROM t
),
p2 AS (
  SELECT doc_id, pos, l[pos] AS para,
    CAST(('0x' || substr(md5(l[pos]), 1, 15)) AS BIGINT) AS h
  FROM paras
),
common AS (
  SELECT h FROM p2 GROUP BY h HAVING count(*) >= {_PARA_MIN_DF}
),
flagged AS (
  SELECT p2.*, (c.h IS NOT NULL) AS is_common
  FROM p2 LEFT JOIN common c USING (h)
)
SELECT doc_id,
  coalesce(array_to_string(list(para ORDER BY pos) FILTER (WHERE NOT is_common),
                           '{_PARA_SEP}'), '') AS text_clean,
  CAST(count(*) FILTER (WHERE NOT is_common) AS INTEGER) AS n_kept,
  CAST(count(*) FILTER (WHERE is_common) AS INTEGER) AS n_dropped
FROM flagged
GROUP BY doc_id
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from grower_spark.operators.text import regex_token_count

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return regex_token_count(docs).select("doc_id", "n_bpe_tokens")


def oracle_text_bpe_tokens() -> str:
    from grower_spark.operators.text import BPE_ISH_PATTERN

    return f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER) AS n_bpe_tokens
FROM documents
"""


def q_multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal surface in one driver row: JVM-side binary
    metadata (byte_len / sha256 / magic sniff), the stub image-decode
    kernel, the byte-histogram + entropy kernel, and the 1:N frame
    sampler, all joined on doc_id (round-5 consolidation of the former
    multimodal_meta and multimodal_hist rows into the r4 pipeline row —
    every kernel's output is still independently oracle-checked through
    the join).

    decoder pinned to "stub": the oracle encodes the stub kernel's fake
    metadata, so the query must not silently switch to a real codec if one
    appears in a future container.  The doc_id joins are same-key shuffles
    of derivations of one scan; the 100 TB production path is the FUSED
    one-pass kernel (`operators.multimodal.multimodal_features`, pytest-
    pinned equal to decode JOIN histogram) — kept separate here precisely
    so each UDF plumbing path stays driver-verified."""
    from grower_spark.operators.multimodal import (
        attach_binary,
        binary_meta,
        byte_histogram,
        decode_images,
        sample_frames,
    )

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    b = attach_binary(docs)
    bmeta = binary_meta(b).select(
        "doc_id", "byte_len", "sha256_hex", F.upper("magic_hex").alias("magic_hex")
    )
    meta = decode_images(b, decoder="stub").select(
        "doc_id", "width", "height", "n_channels", "mean_luma", "decoder"
    )
    hist = byte_histogram(b).select(
        "doc_id",
        "n_bytes",
        # contract column as text: pandas renders Spark lists "[1, 2]" but
        # DuckDB arrays "[1 2]", so an array column can't survive the
        # driver's pandas-normalized hash
        F.array_join(F.transform("hist16", lambda x: x.cast("string")), ",").alias(
            "hist16_csv"
        ),
        "entropy_milli",
    )
    frames = sample_frames(b)
    return meta.join(bmeta, "doc_id").join(hist, "doc_id").join(frames, "doc_id")


def oracle_multimodal_pipeline() -> str:
    # The stub decoder's fake metadata re-expressed in SQL (ASCII text, so
    # codepoints == bytes and sha256(chars) == sha256(bytes)), plus binary
    # metadata, nibble histogram/entropy (same double ops in bin order,
    # same libm log2), and the 1:N frame-sampling expansion.
    return """
WITH b AS (
  SELECT doc_id,
    octet_length(encode(text)) AS n,
    list_sum(list_transform(range(1, least(length(text), 256) + 1),
                            i -> unicode(substr(text, i, 1)))) AS s
  FROM documents
),
meta AS (
  SELECT doc_id,
    CAST((s % 1024) + 1 AS INTEGER) AS width,
    CAST((n % 1024) + 1 AS INTEGER) AS height,
    CAST(3 AS INTEGER) AS n_channels,
    CAST((s + n) % 256 AS REAL) AS mean_luma,
    'stub' AS decoder
  FROM b
),
bm AS (
  SELECT doc_id,
    CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
    sha256(text) AS sha256_hex,
    upper(hex(encode(substr(text, 1, 4)))) AS magic_hex
  FROM documents
),
pre AS (
  SELECT doc_id,
    list_transform(range(1, least(length(text), 256) + 1),
                   i -> unicode(substr(text, i, 1)) // 16) AS nib
  FROM documents
),
h AS (
  SELECT doc_id,
    list_transform(range(0, 16), b -> len(list_filter(nib, x -> x = b))) AS hl,
    len(nib) AS hn
  FROM pre
),
hist AS (
  SELECT doc_id,
    CAST(hn AS INTEGER) AS n_bytes,
    array_to_string(hl, ',') AS hist16_csv,
    CAST(floor(1000 * list_reduce(
        list_prepend(CAST(0 AS DOUBLE),
          list_transform(hl, k -> CASE WHEN k > 0
            THEN -(k / CAST(hn AS DOUBLE)) * log2(k / CAST(hn AS DOUBLE))
            ELSE 0.0 END)),
        (a, b) -> a + b)) AS BIGINT) AS entropy_milli
  FROM h
),
idx AS (
  SELECT doc_id, text,
    unnest(range(0, least(8, greatest(octet_length(encode(text)) // 64, 1)))) AS i
  FROM documents
),
frames AS (
  SELECT doc_id,
    CAST(i AS INTEGER) AS frame_idx,
    CAST(i * 64 AS BIGINT) AS frame_off_bytes,
    substr(sha256(substr(text, i * 64 + 1, 64)), 1, 8) AS frame_sha8
  FROM idx
)
SELECT m.doc_id, m.width, m.height, m.n_channels, m.mean_luma, m.decoder,
       bm.byte_len, bm.sha256_hex, bm.magic_hex,
       hi.n_bytes, hi.hist16_csv, hi.entropy_milli,
       f.frame_idx, f.frame_off_bytes, f.frame_sha8
FROM meta m
JOIN bm USING (doc_id)
JOIN hist hi USING (doc_id)
JOIN frames f USING (doc_id)
"""


def q_multimodal_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FUSED one-pass multimodal kernel (`multimodal_features`) as its
    own driver row (r7): decode metadata AND byte-histogram features in a
    single mapInPandas — bytes cross the Arrow boundary once, no doc_id
    re-join.  Previously pytest-pinned equal to decode ⋈ histogram; this
    row gives the production path its own oracle (stub decode + nibble
    histogram/entropy re-derived in SQL)."""
    from grower_spark.operators.multimodal import attach_binary, multimodal_features

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    fused = multimodal_features(attach_binary(docs), decoder="stub")
    return fused.select(
        "doc_id", "width", "height", "n_channels", "mean_luma", "decoder",
        "n_bytes",
        F.array_join(F.transform("hist16", lambda x: x.cast("string")), ",").alias(
            "hist16_csv"
        ),
        "entropy_milli",
    )


def oracle_multimodal_fused() -> str:
    # stub-decode metadata + nibble histogram/entropy, same derivations as
    # the pipeline oracle minus the binary-meta and frame legs
    return """
WITH b AS (
  SELECT doc_id,
    octet_length(encode(text)) AS n,
    list_sum(list_transform(range(1, least(length(text), 256) + 1),
                            i -> unicode(substr(text, i, 1)))) AS s
  FROM documents
),
meta AS (
  SELECT doc_id,
    CAST((s % 1024) + 1 AS INTEGER) AS width,
    CAST((n % 1024) + 1 AS INTEGER) AS height,
    CAST(3 AS INTEGER) AS n_channels,
    CAST((s + n) % 256 AS REAL) AS mean_luma,
    'stub' AS decoder
  FROM b
),
pre AS (
  SELECT doc_id,
    list_transform(range(1, least(length(text), 256) + 1),
                   i -> unicode(substr(text, i, 1)) // 16) AS nib
  FROM documents
),
h AS (
  SELECT doc_id,
    list_transform(range(0, 16), b -> len(list_filter(nib, x -> x = b))) AS hl,
    len(nib) AS hn
  FROM pre
),
hist AS (
  SELECT doc_id,
    CAST(hn AS INTEGER) AS n_bytes,
    array_to_string(hl, ',') AS hist16_csv,
    CAST(floor(1000 * list_reduce(
        list_prepend(CAST(0 AS DOUBLE),
          list_transform(hl, k -> CASE WHEN k > 0
            THEN -(k / CAST(hn AS DOUBLE)) * log2(k / CAST(hn AS DOUBLE))
            ELSE 0.0 END)),
        (a, b) -> a + b)) AS BIGINT) AS entropy_milli
  FROM h
)
SELECT m.doc_id, m.width, m.height, m.n_channels, m.mean_luma, m.decoder,
       hi.n_bytes, hi.hist16_csv, hi.entropy_milli
FROM meta m JOIN hist hi USING (doc_id)
"""


def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode, driver-certified (r6 verdict item 3): synthesize a
    deterministic grayscale PNG per document (pixels are an integer formula
    of doc_id; scanline y uses filter type y % 5, so the decode exercises
    all five PNG filter reconstructions), run the pure-stdlib `_png_one`
    kernel via decode_images(decoder="png") — zlib inflate + full
    unfiltering, real pixels — and emit the decoded metadata.  The oracle
    recomputes width/height/mean-luma from the pixel formula in SQL, so a
    hash match proves the decoder reconstructed every pixel exactly.
    Plan: two chained mapInPandas over one scan, zero shuffles beyond the
    cpu-spread repartition."""
    from grower_spark.operators.multimodal import decode_images, synthesize_media

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    # fused synth+decode: one Python pass, payload never crosses the JVM
    # boundary (rows identical; the chained form paid a second
    # mapInPandas stage)
    return decode_images(docs, decoder="png", synth_kind="png").select(
        "doc_id", "width", "height", "n_channels", "mean_luma", "decoder"
    )


def oracle_multimodal_decode_png() -> str:
    # The synth formula re-derived in SQL: pixel[k] = (id*31 + k*17) % 256
    # over w*h pixels; integer sums are exact in float64, so the double
    # quotient (then REAL cast) is bit-identical to the decoder's
    # accumulate/divide.
    return """
WITH p AS (
  SELECT doc_id, doc_id % 8 + 4 AS w, (doc_id * 7) % 8 + 4 AS h
  FROM documents
)
SELECT doc_id,
  CAST(w AS INTEGER) AS width,
  CAST(h AS INTEGER) AS height,
  CAST(1 AS INTEGER) AS n_channels,
  CAST(CAST(list_sum(list_transform(range(0, w * h),
         k -> (doc_id * 31 + k * 17) % 256)) AS DOUBLE) / (w * h)
       AS REAL) AS mean_luma,
  'png' AS decoder
FROM p
"""


def q_multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG/GIF header parsing, driver-certified (r7): synthesize a
    JPEG header stream for even doc_ids and a GIF header for odd ones
    (dimensions are doc_id formulas), decode through the pinned ``magic``
    route — stdlib-only magic-byte dispatch that can never drift with
    environment packages (unlike ``auto``) — and emit the parsed
    metadata.  mean_luma is honestly NULL: header kernels read
    dimensions, not pixels."""
    from grower_spark.operators.multimodal import decode_images, synthesize_media

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    # fused synth+decode with a per-row kind (even ids JPEG, odd GIF) —
    # replaces the two-branch union + second mapInPandas stage, rows
    # identical
    return decode_images(
        docs, decoder="magic",
        synth_kind=lambda i: "jpeg" if i % 2 == 0 else "gif",
    ).select(
        "doc_id", "width", "height", "n_channels", "mean_luma", "decoder"
    )


def oracle_multimodal_decode_meta() -> str:
    return """
SELECT doc_id,
  CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 200 + 16
            ELSE doc_id % 300 + 1 END AS INTEGER) AS width,
  CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 13) % 200 + 16
            ELSE (doc_id * 7) % 300 + 1 END AS INTEGER) AS height,
  CAST(3 AS INTEGER) AS n_channels,
  CAST(NULL AS REAL) AS mean_luma,
  CASE WHEN doc_id % 2 = 0 THEN 'jpeg-meta' ELSE 'gif-meta' END AS decoder
FROM documents
"""


def q_multimodal_decode_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MP4 box walking, driver-certified (r7): synthesize a minimal
    ISO-BMFF container per document (mvhd duration / tkhd dimensions are
    doc_id formulas), parse with the pinned ``mp4`` kernel (`_mp4_meta_one`
    — pure struct box walking), and emit container metadata."""
    from grower_spark.operators.multimodal import synthesize_media, video_meta

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return video_meta(docs, decoder="mp4", synth_kind="mp4").select(
        "doc_id", "duration_ms", "width", "height", "n_tracks", "decoder"
    )


def oracle_multimodal_decode_mp4() -> str:
    # timescale 1000 => duration_ms == the mvhd duration formula
    return """
SELECT doc_id,
  CAST(doc_id % 5000 + 1000 AS BIGINT) AS duration_ms,
  CAST(doc_id % 640 + 16 AS INTEGER) AS width,
  CAST((doc_id * 3) % 480 + 16 AS INTEGER) AS height,
  CAST(1 AS INTEGER) AS n_tracks,
  'mp4-meta' AS decoder
FROM documents
"""


def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM WAV decode, driver-certified: synthesize a deterministic
    16-bit mono 8 kHz WAV per document (samples are an integer formula of
    doc_id), run the stdlib `wave` kernel via decode_audio(decoder="wav"),
    emit format metadata + integer-exact RMS.  The oracle recomputes the
    RMS from the sample formula in SQL — a hash match proves the kernel
    read back every sample."""
    from grower_spark.operators.multimodal import decode_audio, synthesize_media

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return decode_audio(docs, decoder="wav", synth_kind="wav").select(
        "doc_id", "sample_rate", "n_channels", "n_frames", "duration_ms",
        "rms_milli", "decoder"
    )


def oracle_multimodal_decode_wav() -> str:
    # sample[k] = (id*131 + k*977) % 65536 - 32768 over n = id%40+5 frames;
    # sum of squares is exact in float64 (< 2^53), sqrt/divide are both
    # correctly rounded, so the doubles agree bitwise before rounding.
    return """
WITH p AS (SELECT doc_id, doc_id % 40 + 5 AS n FROM documents),
s AS (
  SELECT doc_id, n,
    list_transform(range(0, n),
                   k -> (doc_id * 131 + k * 977) % 65536 - 32768) AS smp
  FROM p
)
SELECT doc_id,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(1 AS INTEGER) AS n_channels,
  CAST(n AS BIGINT) AS n_frames,
  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
  CAST(round(sqrt(CAST(list_sum(list_transform(smp, x -> x * x)) AS DOUBLE)
                  / n) / 32768 * 1000) AS BIGINT) AS rms_milli,
  'wav' AS decoder
FROM s
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form + its fingerprint — the dedup preprocessor."""
    from grower_spark.operators.text import normalize_text

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    out = normalize_text(docs)
    return out.select(
        "doc_id",
        "text_norm",
        F.length("text_norm").alias("n_norm_chars"),
    )


def oracle_text_normalize() -> str:
    return """
SELECT doc_id,
  trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS text_norm,
  CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS INTEGER)
    AS n_norm_chars
FROM documents
"""


_PACK_MAX_TOKENS = 256
_PACK_NUM_GROUPS = 8


def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (first-fit-decreasing) over whitespace token
    counts — the context-window binning step of a training pipeline.

    The packer itself (`operators/packing.py`) is a group-local Python
    kernel under applyInPandas: genuinely sequential bin packing, salted
    into hash groups for parallelism.  The oracle pins the EXACT FFD
    assignment via a recursive-CTE fold in DuckDB (one iteration per doc
    per group, bin state carried as a csv string), so the kernel's sort
    order, first-fit scan, and oversize handling are all hash-checked."""
    from grower_spark.operators.packing import pack_documents

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    sized = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    return pack_documents(
        sized, max_tokens=_PACK_MAX_TOKENS, num_groups=_PACK_NUM_GROUPS
    )


def oracle_pack_documents() -> str:
    # First-fit-decreasing re-expressed as a sequential fold: the
    # recursive CTE advances one document per group per iteration
    # (ordered by size desc, doc_id asc — the packer's exact sort), with
    # remaining bin capacities carried as a csv string (DuckDB v1.0's
    # list_reduce corrupts list-typed struct fields, so csv it is).
    # list_position returns 0 (not NULL) for no-fit in v1.0.  pack_pos is
    # recovered afterwards by row_number within (group, bin) in placement
    # order — identical to the kernel's per-bin fill counter.
    return f"""
WITH RECURSIVE sizes AS (
  SELECT doc_id,
    CAST(len(str_split(text, ' ')) AS BIGINT) AS sz,
    CAST(('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % {_PACK_NUM_GROUPS} AS grp
  FROM documents
),
ord AS (
  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY sz DESC, doc_id ASC) AS rn
  FROM sizes
),
fold AS (
  SELECT grp, rn, doc_id, sz,
    0 AS b,
    sz > {_PACK_MAX_TOKENS} AS over,
    CASE WHEN sz > {_PACK_MAX_TOKENS} THEN '-1'
         ELSE CAST({_PACK_MAX_TOKENS} - sz AS VARCHAR) END AS bins
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.grp, o.rn, o.doc_id, o.sz,
    CASE
      WHEN o.sz > {_PACK_MAX_TOKENS}
        THEN len(str_split(f.bins, ','))
      WHEN list_position(list_transform(str_split(f.bins, ','),
             s -> CAST(s AS BIGINT) >= o.sz), true) > 0
        THEN list_position(list_transform(str_split(f.bins, ','),
             s -> CAST(s AS BIGINT) >= o.sz), true) - 1
      ELSE len(str_split(f.bins, ','))
    END AS b,
    o.sz > {_PACK_MAX_TOKENS} AS over,
    CASE
      WHEN o.sz > {_PACK_MAX_TOKENS} THEN f.bins || ',-1'
      WHEN list_position(list_transform(str_split(f.bins, ','),
             s -> CAST(s AS BIGINT) >= o.sz), true) > 0
        THEN array_to_string(
          list_transform(range(1, len(str_split(f.bins, ',')) + 1),
            i -> CASE WHEN i = list_position(list_transform(str_split(f.bins, ','),
                          s -> CAST(s AS BIGINT) >= o.sz), true)
                 THEN CAST(str_split(f.bins, ',')[i] AS BIGINT) - o.sz
                 ELSE CAST(str_split(f.bins, ',')[i] AS BIGINT) END), ',')
      ELSE f.bins || ',' || CAST({_PACK_MAX_TOKENS} - o.sz AS VARCHAR)
    END AS bins
  FROM fold f JOIN ord o ON o.grp = f.grp AND o.rn = f.rn + 1
)
SELECT doc_id,
  CAST(grp AS VARCHAR) || '-' || CAST(b AS VARCHAR) AS pack_id,
  CAST(row_number() OVER (PARTITION BY grp, b ORDER BY rn) - 1 AS INTEGER) AS pack_pos,
  sz AS n_tokens,
  over AS oversize
FROM fold
"""


_CHUNK_TOKENS = 32
_CHUNK_OVERLAP = 8


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window document chunking with overlap — the step between
    corpus filtering and packing.  Pure per-row JVM array expressions
    (split → sequence → slice → explode): zero shuffles, scan-speed."""
    from grower_spark.operators.chunking import chunk_documents

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, overlap_tokens=_CHUNK_OVERLAP
    )


def oracle_chunk_documents() -> str:
    # stride = chunk - overlap; window i covers tokens
    # [i*stride, i*stride + chunk); the last window is the remainder.
    # DuckDB list_slice(l, a, b) is 1-based inclusive-both-ends and clamps,
    # matching Spark slice(l, a, len) for b = a + len - 1.
    stride = _CHUNK_TOKENS - _CHUNK_OVERLAP
    return f"""
WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT doc_id, toks,
    1 + (greatest(len(toks) - {_CHUNK_TOKENS}, 0) + {stride - 1}) // {stride}
      AS n_chunks
  FROM t
),
ex AS (
  SELECT doc_id, toks, unnest(range(0, n_chunks)) AS i FROM n
)
SELECT doc_id,
  CAST(i AS INTEGER) AS chunk_idx,
  CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) AS chunk_id,
  array_to_string(list_slice(toks, i * {stride} + 1, i * {stride} + {_CHUNK_TOKENS}), ' ')
    AS chunk_text,
  CAST(len(list_slice(toks, i * {stride} + 1, i * {stride} + {_CHUNK_TOKENS})) AS BIGINT)
    AS n_chunk_tokens
FROM ex
"""


def q_doc_rolling_hash61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both rolling fingerprints (31-bit classic + 61-bit two-limb) in one
    driver row — one documents scan, two folds; covers rolling_fingerprint
    AND rolling_fingerprint61 (consolidated in r4 to keep the registry
    inside the driver's 50-query window)."""
    from grower_spark.operators.text import rolling_fingerprint, rolling_fingerprint61

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return rolling_fingerprint61(rolling_fingerprint(docs)).select(
        "doc_id", "rh31", "rh61"
    )


def oracle_doc_rolling_hash61() -> str:
    # Same two-limb fold as _roll61_step, in DuckDB BIGINT arithmetic:
    # integer // and % recover the limbs, every intermediate < 2^62.
    from grower_spark.operators.text import (
        ROLL_BASE,
        ROLL_MOD,
        ROLL_MOD61,
        ROLL_PREFIX_TOKENS,
    )

    h31 = _DUCK_MD5_60.format(x="t") + " % 1073741824"
    h = _DUCK_MD5_60.format(x="t") + " % 2147483648"
    step = (
        f"(((a // 1073741824) * {ROLL_BASE}) // 2147483648"
        f" + (((a // 1073741824) * {ROLL_BASE}) % 2147483648) * 1073741824"
        f" + (a % 1073741824) * {ROLL_BASE} + b) % {ROLL_MOD61}"
    )
    return f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_slice(string_split(text, ' '), 1, {ROLL_PREFIX_TOKENS}),
                     t -> {h31})),
    (a, b) -> (a * {ROLL_BASE} + b) % {ROLL_MOD}) AS rh31,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(list_slice(string_split(text, ' '), 1, {ROLL_PREFIX_TOKENS}),
                     t -> {h})),
    (a, b) -> {step}) AS rh61
FROM documents
"""


def q_json_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:33-34 JSONStringField/JSONUInt64Field over events.props."""
    from grower_spark.functions.scalars import json_string_field, json_uint64_field

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        json_string_field(F.col("props"), "k").alias("k_str"),
        # Contract column as string (engine keeps decimal(20,0) internally);
        # see q_nginx_custom_casts for the pandas/float64 rationale.
        json_uint64_field(F.col("props"), "k").cast("string").alias("k_u64"),
    )


def oracle_json_fields() -> str:
    return """
SELECT event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(CAST(json_extract_string(props, '$.k') AS DECIMAL(20,0)) AS VARCHAR) AS k_u64
FROM events
"""


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README.md:35-36: RegExp(pattern, field) + nested Cast composition +
    GeoIP stubs, applied over the parsed pipeline output."""
    from grower_spark.functions.scalars import cast_to, geoip_as, geoip_region, regexp_field

    parsed = _parsed(spark, sf_dir)
    return parsed.select(
        "request",
        regexp_field(F.col("request"), r"^GET /([a-z]+)/", 1).alias("req_kind"),
        cast_to(regexp_field(F.col("request"), r"^GET /[a-z]+/([0-9]+) ", 1), "UInt32").alias("req_id_u32"),
        geoip_region(F.col("remote_addr")).alias("geo_region"),
        geoip_as(F.col("remote_addr")).alias("geo_as"),
    )


def oracle_scalar_funcs() -> str:
    md5_16 = _DUCK_MD5_60.format(
        x="string_split(remote_addr, '.')[1] || '.' || string_split(remote_addr, '.')[2]"
    )
    return (
        ORACLE_PARSED_CTE
        + f"""
SELECT request,
  regexp_extract(request, '^GET /([a-z]+)/', 1) AS req_kind,
  CAST(CASE WHEN regexp_extract(request, '^GET /[a-z]+/([0-9]+) ', 1) = '' THEN 0
       ELSE CAST(regexp_extract(request, '^GET /[a-z]+/([0-9]+) ', 1) AS BIGINT) END AS BIGINT) AS req_id_u32,
  'region-' || CAST({md5_16} % 64 AS VARCHAR) AS geo_region,
  CAST({md5_16} % 65536 AS INTEGER) AS geo_as
FROM parsed
"""
    )


# Decontamination: 3-grams because the sf documents are short word-soup texts
# over a tiny vocabulary — real pipelines use 8..13-gram overlap, but a random
# 8-gram here never collides and the operator's output would be empty.  The
# plan shape (broadcast benchmark grams, map-side explode, one doc_id shuffle)
# is identical at any n.
DECONTAM_N = 3
DECONTAM_BENCH_MOD = 31


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every doc_id % 31 == 0 document plays
    the held-out eval set; the query reports each remaining document's
    count of distinct 3-grams shared with that set."""
    from grower_spark.operators.decontam import contamination_hits

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    bench = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
    return contamination_hits(corpus, bench, n=DECONTAM_N)


def oracle_doc_decontaminate() -> str:
    n = DECONTAM_N
    gram_h = _DUCK_MD5_60.format(x="gram")
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {n - 1}], ' ') AS gram
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - {n - 1}, 1) + 1)) AS i
        FROM words)
),
hashed AS (SELECT doc_id, {gram_h} AS gram_h FROM grams),
bench AS (SELECT DISTINCT gram_h FROM hashed WHERE doc_id % {DECONTAM_BENCH_MOD} = 0)
SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_hit
FROM hashed h JOIN bench b USING (gram_h)
WHERE h.doc_id % {DECONTAM_BENCH_MOD} <> 0
GROUP BY h.doc_id
"""


# Downsample the frequent event types, keep the rare-but-precious ones whole —
# the canonical corpus-mixing move, as deterministic permille rates.
SAMPLE_RATES = {"view": 10, "click": 50, "signup": 250, "purchase": 500, "error": 1000}
SAMPLE_SALT = "r4"


def q_events_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified sample of events: per-type keep rates via a
    salted md5 permille bucket of event_id.  Pure map-side filter — zero
    shuffles, membership independent of partitioning, identical on any
    cluster layout (and in DuckDB, which is the oracle check)."""
    from grower_spark.operators.sampling import sample_stratified

    ev = load_table(spark, sf_dir, "events")
    out = sample_stratified(
        ev, "event_type", SAMPLE_RATES, key_col="event_id", salt=SAMPLE_SALT
    )
    return out.select("event_id", "event_type", "user_id")


def oracle_events_sample_stratified() -> str:
    bucket = _DUCK_MD5_60.format(x=f"'{SAMPLE_SALT}|' || CAST(event_id AS VARCHAR)")
    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT event_id, event_type, user_id
FROM events
WHERE {bucket} % 1000 < CASE event_type {cases} ELSE 0 END
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (top-word / top-bigram mass,
    distinct-token ratio) — the explode + two-stage-aggregate plan; see
    operators/text.py:repetition_stats for the shuffle story."""
    from grower_spark.operators.text import repetition_stats

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return repetition_stats(docs)


def oracle_text_repetition() -> str:
    return """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (
  SELECT doc_id, unnest(w) AS gram, 'w' AS kind FROM words
  UNION ALL
  SELECT doc_id, array_to_string(w[i : i + 1], ' ') AS gram, 'g' AS kind
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - 1, 1) + 1)) AS i
        FROM words)
),
cnt AS (SELECT doc_id, kind, gram, count(*) AS c FROM toks GROUP BY 1, 2, 3),
agg AS (
  SELECT doc_id,
    CAST(sum(CASE WHEN kind = 'w' THEN c END) AS BIGINT) AS n_tokens,
    max(CASE WHEN kind = 'w' THEN c END) AS top_w,
    CAST(sum(CASE WHEN kind = 'w' THEN 1 END) AS BIGINT) AS n_distinct_w,
    max(CASE WHEN kind = 'g' THEN c END) AS top_g,
    CAST(sum(CASE WHEN kind = 'g' THEN c END) AS BIGINT) AS n_bigrams
  FROM cnt GROUP BY 1
)
SELECT doc_id, n_tokens,
  (n_distinct_w * 10000) // n_tokens AS distinct_ratio_bp,
  (top_w * 10000) // n_tokens AS top_word_bp,
  (top_g * 10000) // n_bigrams AS top_bigram_bp
FROM agg
"""


_SUBSTR_K = 8
_SUBSTR_MIN_DF = 2
_SUBSTR_MAX_DF = 1000


def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (suffix-array-pipeline semantics,
    Spark-first): per-document duplicated-span statistics from rolling
    k-token gram hashes — the training-data dedup that document-level
    exact/near dedup cannot see.  See ``operators/substring.py`` for the
    plan-shape story (one gram shuffle, one doc-windowed merge)."""
    from grower_spark.operators.substring import substring_dup_stats

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return substring_dup_stats(
        docs, k=_SUBSTR_K, min_df=_SUBSTR_MIN_DF, max_gram_df=_SUBSTR_MAX_DF
    )


def oracle_dedup_substring() -> str:
    # Same 60-bit md5 gram key, same [min_df, max_df] retention, same
    # gaps-and-islands merge (new span when the gap exceeds k).
    #
    # r8 rewrite (the r7 driver hash-fail, VERDICT r7 item 1): this oracle
    # was the ONLY one in the file using bracket slicing
    # (`toks[pos : pos + k - 1]`) — bracket-slice bound semantics are
    # DuckDB-version-sensitive, while `list_slice(l, a, b)` is documented
    # 1-based inclusive-both-ends and already underpins every green
    # shingle/chunk oracle.  All constructs below are the shared
    # engine-neutral forms: `_DUCK_MD5_60`, `list_slice`, explicit BIGINT
    # casts around `//`.
    k, lo, hi = _SUBSTR_K, _SUBSTR_MIN_DF, _SUBSTR_MAX_DF
    gram = f"array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ')"
    h60 = _DUCK_MD5_60.format(x=gram)
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, CAST(unnest(range(1, len(toks) - {k} + 2)) AS BIGINT) AS pos, toks
  FROM t WHERE len(toks) >= {k}
),
h AS (
  SELECT doc_id, pos, {h60} AS h
  FROM g
),
dup AS (
  SELECT h FROM h GROUP BY h HAVING count(*) >= {lo} AND count(*) <= {hi}
),
hits AS (SELECT h.doc_id, h.pos FROM h JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {k}
         THEN 1 ELSE 0 END AS brk
  FROM hits
),
isl2 AS (
  SELECT doc_id, pos,
    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {k} - 1 AS e
  FROM isl2 GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(e - s + 1) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens,
  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  CAST((CAST(coalesce(p.dup_tokens, 0) AS BIGINT) * 10000)
       // CAST(len(string_split(d.text, ' ')) AS BIGINT) AS BIGINT) AS dup_ratio_bp
FROM documents d LEFT JOIN per_doc p USING (doc_id)
WHERE d.text IS NOT NULL
"""


_SEMDEDUP_T = 0.4


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (embedding-space semantic dedup): coarse-quantize to IVF
    cells map-side, compare pairs within a cell only, keep the first-by-id
    member of every duplicate group.  The synthetic embeddings are
    near-orthogonal (max within-cell cosine 0.47), so the driver row runs
    the mechanism at threshold 0.4; a production corpus uses 0.95+.  See
    ``operators/semdedup.py``."""
    from grower_spark.operators.semdedup import semdedup

    emb = _cpu_spread(spark, load_table(spark, sf_dir, "embeddings"))
    return semdedup(emb, n_cells=IVF_CELLS, dim=EMB_DIM, threshold=_SEMDEDUP_T)


def oracle_semdedup() -> str:
    from grower_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(IVF_CELLS, EMB_DIM)
    ranked_terms = ", ".join(
        f"{{'m': -list_dot_product(vec, CAST([{', '.join(repr(v) for v in cent)}] AS DOUBLE[])), "
        f"'i': CAST({i} AS INTEGER)}}"
        for i, cent in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
c AS (SELECT vec_id, vec,
        list_transform(list_sort([{ranked_terms}]), s -> s.i)[1] AS cell
      FROM v),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb,
    round(list_dot_product(a.vec, b.vec)
      / (sqrt(list_dot_product(a.vec, a.vec)) * sqrt(list_dot_product(b.vec, b.vec))), 4) AS sim_r4
  FROM c a JOIN c b ON a.cell = b.cell AND a.vec_id > b.vec_id
),
hits AS (SELECT * FROM pairs WHERE sim_r4 >= {_SEMDEDUP_T}),
best AS (
  SELECT ida, idb AS dup_of, sim_r4 AS max_sim_r4,
    row_number() OVER (PARTITION BY ida ORDER BY sim_r4 DESC, idb ASC) AS rn
  FROM hits
)
SELECT c.vec_id, CAST(c.cell AS INTEGER) AS cell,
  (b.dup_of IS NULL) AS keep, b.dup_of, b.max_sim_r4
FROM c LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON c.vec_id = b.ida
"""


# Deterministic PII injection: the synthetic documents text contains no
# PII, so the driver row plants class-typed strings keyed off doc_id (same
# expression in both engines) and then runs the real detection/redaction
# operators over the result.  Residue-class gating means rows carry
# different subsets (including none).
_PII_SYNTH_SQL = (
    "concat(text,"
    " CASE WHEN doc_id % 3 = 0 THEN concat(' contact u', CAST(doc_id AS {s}),"
    "   '@ex', CAST(doc_id % 7 AS {s}), '.org') ELSE '' END,"
    " CASE WHEN doc_id % 4 = 1 THEN concat(' from 10.', CAST(doc_id % 256 AS {s}),"
    "   '.0.', CAST(doc_id % 100 AS {s})) ELSE '' END,"
    " CASE WHEN doc_id % 5 = 2 THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS {s}), 4, '0')) ELSE '' END,"
    " CASE WHEN doc_id % 7 = 3 THEN concat(' ssn 123-45-', lpad(CAST(doc_id % 10000 AS {s}), 4, '0')) ELSE '' END)"
)


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-class regex match counts + class-token redaction
    (``operators/pii.py``) — per-row JVM expressions, zero shuffles."""
    from grower_spark.operators.pii import pii_signals, redact_pii

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    docs = docs.withColumn("pii_text", F.expr(_PII_SYNTH_SQL.format(s="string")))
    out = redact_pii(pii_signals(docs, "pii_text"), "pii_text")
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "n_pii", "text_redacted"
    )


def oracle_pii_redact() -> str:
    from grower_spark.operators.pii import PII_PATTERNS

    synth = _PII_SYNTH_SQL.format(s="VARCHAR")
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(pii_text, '{pat}')) AS INTEGER) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    red = "pii_text"
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH t AS (SELECT doc_id, {synth} AS pii_text FROM documents),
c AS (SELECT doc_id, pii_text, {counts}, {red} AS text_redacted FROM t)
SELECT doc_id, n_email, n_ipv4, n_ssn, n_phone,
       CAST({total} AS INTEGER) AS n_pii, text_redacted
FROM c
"""


_VOCAB_K = 20


def q_corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-k: tf + document frequency + IDF, Expand-free
    two-phase aggregation and a TakeOrdered top-k (``text.vocab_topk``)."""
    from grower_spark.operators.text import vocab_topk

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return vocab_topk(docs, k=_VOCAB_K)


def oracle_corpus_vocab() -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
pd AS (SELECT token, doc_id, count(*) AS c FROM ex GROUP BY 1, 2),
v AS (SELECT token, CAST(sum(c) AS BIGINT) AS tf,
        CAST(count(*) AS BIGINT) AS doc_freq
      FROM pd GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL)
SELECT token, tf, doc_freq, round(ln(n / doc_freq), 4) AS idf_r4,
  CAST(row_number() OVER (ORDER BY tf DESC, token) AS INTEGER) AS rank
FROM v, n ORDER BY tf DESC, token LIMIT {_VOCAB_K}
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): orders with at least one
    qualifying lineitem, counted per priority.  The testdata lineitem has
    no commit/receipt dates, so the EXISTS predicate is adapted to
    ``l_shipdate > o_orderdate`` (shipped after ordering) — the pattern
    under test is the LEFT SEMI join with a non-equi conjunct: Spark plans
    it as one semi join, never materializing the multiplicity of matches."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sel = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def oracle_tpch_q4() -> str:
    return """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10): revenue lost to returns per
    customer, top 20.  Fact⋈fact (lineitem⋈orders) stays unhinted for AQE;
    customer/nation broadcast as true dimensions; top-20 via
    TakeOrderedAndProject with a deterministic (revenue desc, custkey)
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum(rev).alias("revenue_10000")
    )
    return agg.orderBy(F.desc("revenue_10000"), F.asc("c_custkey")).limit(20)


def oracle_tpch_q10() -> str:
    return """
SELECT c_custkey, c_name, n_name,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT)
    AS revenue_10000
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_10000 DESC, c_custkey
LIMIT 20
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): LEFT OUTER join with
    the filter INSIDE the join condition (zero-order customers must
    survive), then a two-level aggregation — per-customer count, then the
    histogram of counts.  The priority exclusion stands in for Q13's
    comment-pattern exclusion (the testdata has no o_comment)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
    per = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def oracle_tpch_q13() -> str:
    return """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


_Q18_QTY = 250


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): groupBy-HAVING over the fact
    producing a small key set, then joins back — Spark turns the HAVING
    output into the build side of the orders join under AQE.  Quantities
    are rounded to bigint so the HAVING threshold is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"))
        .where(F.col("sum_qty") > _Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = big.join(orders, big.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("o_totalprice_100"),
        "sum_qty",
    )


def oracle_tpch_q18() -> str:
    return f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
  CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_100, sum_qty
FROM (
  SELECT l_orderkey, CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(round(sum(l_quantity)) AS BIGINT) > {_Q18_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# TPC-H completion set (q2/q7/q8/q9/q11/q12/q15/q16/q17/q19/q20/q21/q22).
#
# The testdata schema is a cut-down TPC-H (no partsupp, no ship/commit/
# receipt-date triple, no comment columns) — each query below keeps the
# *query pattern* the original exercises (correlated scalar-min subquery,
# disjunctive join predicates, nested semi/anti joins, HAVING vs a scalar
# subquery, ...) and documents its schema adaptation.  Where the original
# needs partsupp, the part–supplier relation is derived from lineitem
# (groupBy l_partkey, l_suppkey), which is the natural Spark-first move:
# one reusable shuffle instead of a missing table.
# ---------------------------------------------------------------------------


def _derived_partsupp(li: DataFrame) -> DataFrame:
    """partsupp stand-in: per (l_partkey, l_suppkey) min unit price in cents.

    Rounding happens per row BEFORE the min so both engines take min over
    identical bigints (double division is IEEE-deterministic; min over
    post-round longs is order-free)."""
    unit_100 = F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast("long")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_100).alias("unit_cost_100")
    )


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): correlated scalar-min
    subquery per part.  Spark plans it as groupBy-min over the eligible
    set joined back on (partkey, min) — one extra shuffle over a tiny
    derived table, with AQE free to broadcast the min side.  partsupp is
    derived from lineitem (see _derived_partsupp)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = _derived_partsupp(li)
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    elig = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            "unit_cost_100",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("s_acctbal_100"),
        )
    )
    best = elig.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("unit_cost_100").alias("best_cost_100")
    )
    return elig.join(
        best,
        (elig.p_partkey == best.b_partkey)
        & (elig.unit_cost_100 == best.best_cost_100),
    ).select("p_partkey", "s_name", "n_name", "unit_cost_100", "s_acctbal_100")


def oracle_tpch_q2() -> str:
    return """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    CAST(min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS BIGINT) AS unit_cost_100
  FROM lineitem GROUP BY l_partkey, l_suppkey
), elig AS (
  SELECT p_partkey, s_name, n_name, unit_cost_100,
    CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_100
  FROM ps
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 15
)
SELECT p_partkey, s_name, n_name, unit_cost_100, s_acctbal_100
FROM elig e
WHERE unit_cost_100 = (SELECT min(unit_cost_100) FROM elig e2 WHERE e2.p_partkey = e.p_partkey)
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations (TPC-H Q7): double nation join
    (supplier side + customer side aliases) with a symmetric pair filter.
    lineitem⋈orders stays unhinted for AQE; all dims broadcast."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(F.sum(rev).alias("revenue_10000"), F.count(F.lit(1)).alias("n_rows"))


def oracle_tpch_q7() -> str:
    return """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(year(l_shipdate) AS BIGINT) AS l_year,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_10000,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY supp_nation, cust_nation, l_year
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): seven-table join, conditional
    numerator over the supplier nation, share emitted in integer basis
    points so the division is engine-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    cn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    sn = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("sn_key"))
    )
    agg = j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
        ).alias("nation_10000"),
        F.sum(rev).alias("total_10000"),
    )
    return agg.select(
        "o_year",
        "nation_10000",
        "total_10000",
        F.floor(F.col("nation_10000") * 10000 / F.col("total_10000"))
        .cast("long")
        .alias("mkt_share_bp"),
    )


def oracle_tpch_q8() -> str:
    return """
WITH allrows AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS rev,
    sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS BIGINT) AS nation_10000,
  CAST(sum(rev) AS BIGINT) AS total_10000,
  CAST(floor(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) * 10000.0 / sum(rev)) AS BIGINT) AS mkt_share_bp
FROM allrows GROUP BY o_year
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9): LIKE-filtered part name, profit per
    supplier nation per year.  ps_supplycost doesn't exist in the cut-down
    schema — cost is modeled as half the part's retail price per unit,
    which preserves the pattern (per-row arithmetic across three tables'
    columns inside one aggregate).  All arithmetic is per-row-rounded
    bigints so the group sums are order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    profit = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "long"
    ) - F.round(F.col("p_retailprice") * 50).cast("long") * F.round(
        F.col("l_quantity")
    ).cast("long")
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
    )
    return j.groupBy(
        "n_name", F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(F.sum(profit).alias("profit_100"))


def oracle_tpch_q9() -> str:
    return """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
         - CAST(round(p_retailprice * 50) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS profit_100
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11): per-part value with a
    HAVING against a scalar subquery (fraction of the grand total).  The
    threshold compare is integer-exact (value*1000 > total) instead of
    multiplying the total by 0.001.  The single-row total is joined back
    with a broadcast nested-loop — one row, free.  Supplier region filter
    stands in for Q11's single-nation filter (100 suppliers / 25 nations
    would make single-nation too thin)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    elig_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey")
    )
    filtered = li.join(F.broadcast(elig_supp), li.l_suppkey == F.col("s_suppkey"))
    per = filtered.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("value_100")
    )
    total = per.agg(F.sum("value_100").alias("total_100"))
    return (
        per.join(F.broadcast(total))
        .where(F.col("value_100") * 1000 > F.col("total_100"))
        .select("p_partkey", "value_100")
    )


def oracle_tpch_q11() -> str:
    return """
WITH v AS (
  SELECT l_partkey,
    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_100
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, value_100 FROM v
WHERE value_100 * 1000 > (SELECT sum(value_100) FROM v)
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority counts (TPC-H Q12 shape): fact⋈fact join with
    two conditional counts by priority class.  The schema has no
    l_shipmode — l_linestatus plays the grouping column, and the
    commit/receipt-date lateness predicate becomes shipped-after-ordering
    inside a one-year ship window."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    j = orders.join(li, orders.o_orderkey == li.l_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


def oracle_tpch_q12() -> str:
    return """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15): the revenue "view"
    plus a scalar-max subquery.  The per-supplier aggregate is computed
    once, its single-row max joined back broadcast-nested-loop, and the
    winners equality-filtered — no second scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("total_rev_10000")
    )
    mx = rev.agg(F.max("total_rev_10000").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_rev_10000") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_10000")
    )


def oracle_tpch_q15() -> str:
    return """
WITH rev AS (
  SELECT l_suppkey,
    CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS total_rev_10000
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev_10000
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_10000 = (SELECT max(total_rev_10000) FROM rev)
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-supplier relationship count (TPC-H Q16): distinct part-supplier
    pairs (derived from lineitem), a NOT-IN supplier exclusion planned as
    a broadcast LEFT ANTI join (keys are non-null so the semantics
    coincide), and count(DISTINCT) per part attribute group.  The
    acctbal<0 exclusion stands in for Q16's complaint-comment scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    kept = pairs.join(
        F.broadcast(bad), pairs.l_suppkey == F.col("s_suppkey"), "left_anti"
    )
    j = kept.join(F.broadcast(part), kept.l_partkey == part.p_partkey)
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


def oracle_tpch_q16() -> str:
    return """
SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17): correlated per-part
    average-quantity subquery.  Spark computes per-part (sum_qty, cnt)
    once and joins it back broadcast; the 20%-of-average compare is done
    in cross-multiplied integers (qty*5*cnt < sum_qty) so both engines
    decide identical boundaries — quantities are integral doubles, so the
    sums are exact.  p_size<5 stands in for Q17's container filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 5)
    )
    stats = li.groupBy(F.col("l_partkey").alias("sp_partkey")).agg(
        F.round(F.sum("l_quantity")).cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).join(
        F.broadcast(stats), li.l_partkey == F.col("sp_partkey")
    )
    small = j.where(
        F.round(F.col("l_quantity")).cast("long") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
            "total_extprice_100"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def oracle_tpch_q17() -> str:
    return """
SELECT
  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_extprice_100,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#4' AND p_size < 5
  AND CAST(round(l_quantity) AS BIGINT) * 5 *
      (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    < (SELECT CAST(round(sum(l_quantity)) AS BIGINT) FROM lineitem l3 WHERE l3.l_partkey = lineitem.l_partkey)
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under disjunctive predicates (TPC-H Q19): the
    OR-of-ANDs mixes part columns and lineitem columns, so it can only be
    evaluated as a join filter — Spark keeps the equi-key (partkey) for
    the hash join and applies the disjunction post-probe, with the
    brand/size legs pushed to the part scan via constraint propagation.
    Size ranges stand in for Q19's container lists, p_size for shipmode."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).where(
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return j.agg(
        F.sum(
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
        ).alias("revenue_10000"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def oracle_tpch_q19() -> str:
    return """
SELECT
  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_10000,
  CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-stock suppliers (TPC-H Q20): nested IN subqueries with a
    correlated half-threshold.  Availability and the year's shipments are
    both derived from lineitem per (part, supplier); a supplier qualifies
    when total quantity exceeds twice the 1996 shipments of a LIKE-named
    part.  Spark plans the chain as two grouped aggregates, each hash-
    partitioned on (l_partkey, l_suppkey), so their equi-join adds no
    third shuffle; the supplier side is broadcast semi joins only."""
    li = load_table(spark, sf_dir, "lineitem")
    avail = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("qty_all")
    )
    li96 = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = li96.groupBy(
        F.col("l_partkey").alias("s96_partkey"), F.col("l_suppkey").alias("s96_suppkey")
    ).agg(F.round(F.sum("l_quantity")).cast("long").alias("qty_96"))
    bolts = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    cand = (
        avail.join(
            shipped,
            (avail.l_partkey == F.col("s96_partkey"))
            & (avail.l_suppkey == F.col("s96_suppkey")),
        )
        .join(F.broadcast(bolts), avail.l_partkey == F.col("p_partkey"), "left_semi")
        .where(F.col("qty_all") > 2 * F.col("qty_96"))
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .join(F.broadcast(cand), supp.s_suppkey == cand.l_suppkey, "left_semi")
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("s_acctbal_100"),
        )
    )


def oracle_tpch_q20() -> str:
    return """
WITH avail AS (
  SELECT l_partkey, l_suppkey, CAST(round(sum(l_quantity)) AS BIGINT) AS qty_all
  FROM lineitem GROUP BY l_partkey, l_suppkey
), shipped96 AS (
  SELECT l_partkey, l_suppkey, CAST(round(sum(l_quantity)) AS BIGINT) AS qty_96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_partkey, l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS s_acctbal_100
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT a.l_suppkey FROM avail a
    JOIN shipped96 s ON a.l_partkey = s.l_partkey AND a.l_suppkey = s.l_suppkey
    WHERE a.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
      AND a.qty_all > 2 * s.qty_96
  )
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21): EXISTS + NOT EXISTS
    against the same fact — a left-semi then a left-anti self-join with a
    supplier-inequality conjunct.  "Late" is shipped more than 90 days
    after ordering (the schema has no commit/receipt dates).  The late
    set is computed once and reused on both sides of the anti join."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    late = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waited = late.join(
        other,
        (late.l_orderkey == F.col("o2_orderkey"))
        & (late.l_suppkey != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (late.l_orderkey == F.col("o3_orderkey"))
        & (late.l_suppkey != F.col("o3_suppkey")),
        "left_anti",
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waited.join(F.broadcast(supp), waited.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


def oracle_tpch_q21() -> str:
    return """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


_Q22_NATIONS = (0, 3, 7, 11, 14, 18, 21)


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22): above-average-balance
    customers with no recent orders — a scalar-average subquery plus an
    anti join.  Every synthetic customer has *some* order, so "no orders"
    is adapted to "no orders since 2000-01-01" (lapsed customers), which
    keeps the anti join non-degenerate.  The average compare is
    cross-multiplied on cent-scaled bigints (acctbal_100 * cnt > sum_100)
    so the boundary is engine-exact; nationkey-list stands in for the
    phone-prefix list."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(*_Q22_NATIONS)
    ).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_100"),
    )
    pos = cust.where(F.col("acctbal_100") > 0).agg(
        F.sum("acctbal_100").alias("s"), F.count(F.lit(1)).alias("c")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    sel = (
        cust.join(F.broadcast(pos))
        .where(F.col("acctbal_100") * F.col("c") > F.col("s"))
        .join(F.broadcast(recent), cust.c_custkey == F.col("o_custkey"), "left_anti")
    )
    return sel.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("acctbal_100").alias("totacctbal_100"),
    )


def oracle_tpch_q22() -> str:
    return f"""
WITH key_cust AS (
  SELECT c_custkey, c_nationkey, CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_100
  FROM customer WHERE c_nationkey IN {_Q22_NATIONS}
), pos AS (
  SELECT CAST(sum(acctbal_100) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM key_cust WHERE acctbal_100 > 0
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
  CAST(sum(acctbal_100) AS BIGINT) AS totacctbal_100
FROM key_cust, pos
WHERE acctbal_100 * c > s
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q_dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingest dedup: the corpus split into an 'already ingested'
    side (doc_id % 3 != 0, persisted as a band index) and a 'new batch'
    (doc_id % 3 == 0); the incremental emitter produces exactly the batch
    run's pairs that touch a new doc, without re-pairing old↔old.  The
    oracle runs the full banded-LSH join and applies the same restriction."""
    from grower_spark.operators.dedup import (
        minhash_band_index,
        minhash_lsh_pairs_incremental,
    )

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)
    index = minhash_band_index(
        old, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, hash_fn="md5",
    )
    return minhash_lsh_pairs_incremental(
        new, index, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, hash_fn="md5",
    )


def oracle_dedup_minhash_incremental() -> str:
    base = oracle_dedup_minhash_lsh().rstrip()
    assert base.endswith("GROUP BY a.doc_id, b.doc_id")
    return base.replace(
        "GROUP BY a.doc_id, b.doc_id",
        "   AND (a.doc_id % 3 = 0 OR b.doc_id % 3 = 0)\n"
        "GROUP BY a.doc_id, b.doc_id",
    )


def q_events_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user outlier counts: events more than 2 population-sigmas from
    the user's mean value.  The whole comparison is integer-exact —
    values in cents, and |v-mean| > 2*sigma cross-multiplied to
    (v*n - sum)^2 > 4*(n*sumsq - sum^2) in DECIMAL(38,0) so no engine
    ever divides or touches a float (sum-of-squares of cent values
    overflows int64 at large n; decimal128 does not).  Plan: one
    two-phase agg on user_id, stats joined back (broadcast — user
    cardinality is the small side), one more agg."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100).cast("decimal(38,0)").alias("vc")
    )
    stats = ev.groupBy(F.col("user_id").alias("s_uid")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("vc").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).cast("decimal(38,0)").alias("ss"),
    )
    j = ev.join(F.broadcast(stats), ev.user_id == F.col("s_uid"))
    dev = F.col("vc") * F.col("n") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    is_out = (dev * dev) > (F.lit(4).cast("decimal(38,0)") * var_n2)
    return j.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
    )


def oracle_events_outliers() -> str:
    return """
WITH ev AS (
  SELECT user_id, CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS vc
  FROM events
), stats AS (
  SELECT user_id AS s_uid, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(vc) AS HUGEINT) AS s, CAST(sum(vc * vc) AS HUGEINT) AS ss
  FROM ev GROUP BY user_id
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN (vc * n - s) * (vc * n - s) > 4 * (n * ss - s * s)
       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM ev JOIN stats ON user_id = s_uid
GROUP BY user_id
"""


_SEMDECON_BENCH_N = 8
_SEMDECON_T = 0.4


def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination: corpus vectors scored against a
    benchmark set (vec_id < 8 stands in for an eval set's embeddings).
    The benchmark enters the plan as array literals (model-sized, same
    precedent as LSH planes / the n-gram decontam broadcast), so the scan
    is one zero-shuffle map pass: per-row fold of max cosine over the
    benchmark — the corpus is never shuffled OR joined.  Emits every
    corpus row's max similarity plus the drop flag."""
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    bench = [
        [float(x) for x in r.embedding]
        for r in emb.where(F.col("vec_id") < _SEMDECON_BENCH_N)
        .orderBy("vec_id")
        .collect()
    ]
    # benchmark norms are plan-time constants; Python's left-to-right
    # float64 sum + correctly-rounded sqrt is bit-identical to the
    # _cosine fold the oracle mirrors, so hoisting preserves hash equality
    items = [(vec, math.sqrt(sum(x * x for x in vec))) for vec in bench]
    # two list-literal lit() calls + a zip_with, not BENCH_N × (dim + 1)
    # per-element F.lit Columns: the old loop paid ~1.3k py4j round-trips
    # of plan construction per call.  F.lit(list) carries the exact
    # float64 values (no text round-trip), so the plan-time constants —
    # and the hash — are unchanged.
    vecs_arr = F.lit([vec for vec, _ in items]).cast("array<array<double>>")
    norms_arr = F.lit([n for _, n in items]).cast("array<double>")
    bench_arr = F.zip_with(
        vecs_arr, norms_arr, lambda v, n: F.struct(v.alias("v"), n.alias("n"))
    )
    corpus = emb.where(F.col("vec_id") >= _SEMDECON_BENCH_N)
    # row norm computed ONCE as a named column (non-cheap multi-use expr:
    # CollapseProject keeps it materialized — the minhash `_bh` pattern)
    row_norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    corpus = corpus.withColumn("_rn", row_norm)

    def sim(s):
        dot = F.aggregate(
            F.zip_with(s.v, F.col("embedding"), lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # zero-norm vectors: under ANSI the division THROWS (divide by
        # zero kills the whole query); non-ANSI it yields NaN, which
        # compares greater than any threshold — either way a poisoned
        # result.  try_divide -> NULL -> similarity 0 (a zero vector
        # forces dot = 0 too, so the oracle's isnan CASE is the same
        # guard: only the 0/0 case exists)
        return F.coalesce(F.try_divide(dot, s.n * F.col("_rn")), F.lit(0.0))

    sim_max = F.aggregate(
        bench_arr, F.lit(-1.0), lambda acc, s: F.greatest(acc, sim(s))
    )
    return corpus.select(
        "vec_id",
        F.round(sim_max, 4).alias("max_sim_r4"),
        (sim_max > _SEMDECON_T).cast("int").alias("contaminated"),
    )


def oracle_semantic_decontam() -> str:
    return f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
b AS (SELECT vec FROM v WHERE vec_id < {_SEMDECON_BENCH_N}),
c AS (SELECT * FROM v WHERE vec_id >= {_SEMDECON_BENCH_N}),
s AS (
  SELECT c.vec_id,
    max(CASE WHEN isnan(
          list_dot_product(c.vec, b.vec)
          / (sqrt(list_dot_product(b.vec, b.vec)) * sqrt(list_dot_product(c.vec, c.vec))))
        THEN 0.0
        ELSE list_dot_product(c.vec, b.vec)
          / (sqrt(list_dot_product(b.vec, b.vec)) * sqrt(list_dot_product(c.vec, c.vec)))
        END) AS m
  FROM c, b GROUP BY c.vec_id
)
SELECT vec_id, round(m, 4) AS max_sim_r4,
  CAST(m > {_SEMDECON_T} AS INTEGER) AS contaminated
FROM s
"""


def q_semantic_decontam_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-shape semantic decontamination (r6 verdict item 4): the
    same corpus/benchmark split and scoring as q_semantic_decontam, but
    the benchmark ships as ONE broadcast collect_list row instead of
    Catalyst plan literals — the shape that holds at real eval-set sizes
    (10^3-10^5 embeddings), where a literal array would blow up plan
    compile time.  Bit-identical output to the literal fold
    (equivalence-pinned in tests/test_operators.py); shares the literal
    row's oracle."""
    from grower_spark.operators.decontam import semantic_contamination

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_contamination(
        emb.where(F.col("vec_id") >= _SEMDECON_BENCH_N),
        emb.where(F.col("vec_id") < _SEMDECON_BENCH_N),
        id_col="vec_id",
        vec_col="embedding",
        threshold=_SEMDECON_T,
    )
    return out.select(
        "vec_id",
        F.round(F.col("max_sim"), 4).alias("max_sim_r4"),
        "contaminated",
    )


_LM_VOCAB_K = 128


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring: fit an add-one-smoothed unigram LM
    on a trusted split (even doc_ids — the model step, bounded top-k
    vocab + OOV bucket), then score EVERY document's cross-entropy under
    it in one zero-shuffle map pass (model as plan map literal, the
    tokenize_to_ids shape).  Odd documents exercise the OOV path.
    Integer micro-nat contract end-to-end, so per-doc sums are
    order-insensitive and engine-exact."""
    from grower_spark.operators.text import fit_unigram_lm, lm_score

    docs = load_table(spark, sf_dir, "documents")
    model = fit_unigram_lm(
        docs.where(F.col("doc_id") % 2 == 0), vocab_k=_LM_VOCAB_K, alpha=1.0
    )
    return lm_score(docs, model)


def oracle_lm_perplexity() -> str:
    # Same fit re-derived in SQL (shared CTEs: _lm_cte_sql): float ops
    # happen once per VOCAB entry (not per token), and the per-doc
    # aggregation is integer, so GROUP BY sums need no ordering
    # guarantees.
    return f"""
WITH {_lm_cte_sql("m", "doc_id % 2 = 0", _LM_VOCAB_K)},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
scored AS (
  SELECT t.doc_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(coalesce(m_lm.nll, (SELECT nll FROM m_oov))) AS BIGINT) AS s
  FROM tok t LEFT JOIN m_lm ON m_lm.token = t.token
  GROUP BY t.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(s.s, 0) AS BIGINT) AS nll_micro_sum,
  CAST(CASE WHEN coalesce(s.n, 0) > 0 THEN s.s // s.n ELSE 0 END AS BIGINT)
    AS xent_micro
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def _lm_cte_sql(prefix: str, where: str, k: int) -> str:
    """The add-one unigram-LM fit as DuckDB CTEs (shared by the
    lm_perplexity and dsir_weights oracles): top-k vocab by (tf desc,
    token asc) over the split selected by ``where``, per-token cost
    floor(-ln p * 1e6) as BIGINT."""
    return f"""
{prefix}_ex AS (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE ({where}) AND text IS NOT NULL
),
{prefix}_v AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM {prefix}_ex GROUP BY 1
),
{prefix}_top AS (
  SELECT token, tf FROM {prefix}_v ORDER BY tf DESC, token LIMIT {k}
),
{prefix}_n AS (
  SELECT CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT)
    AS n_total
  FROM documents WHERE ({where}) AND text IS NOT NULL
),
{prefix}_params AS (
  SELECT n_total + 1.0 * ((SELECT count(*) FROM {prefix}_top) + 1) AS denom,
         n_total - (SELECT coalesce(sum(tf), 0) FROM {prefix}_top) AS c_oov
  FROM {prefix}_n
),
{prefix}_lm AS (
  SELECT token,
    CAST(floor(-ln((tf + 1.0) / (SELECT denom FROM {prefix}_params)) * 1e6)
      AS BIGINT) AS nll
  FROM {prefix}_top
),
{prefix}_oov AS (
  SELECT CAST(floor(-ln((c_oov + 1.0) / denom) * 1e6) AS BIGINT) AS nll
  FROM {prefix}_params
)"""


def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy (the CCNet n-gram construction, one order
    up from the unigram row): fit on even doc_ids (top-k vocab + UNK
    mapping, add-one smoothing over per-context counts), score every
    document's consecutive mapped pairs in one zero-shuffle map pass —
    the observed-bigram and per-context-unseen costs ride as plan map
    literals.  Integer micro-nat contract throughout."""
    from grower_spark.operators.text import bigram_lm_score, fit_bigram_lm

    docs = load_table(spark, sf_dir, "documents")
    model = fit_bigram_lm(
        docs.where(F.col("doc_id") % 2 == 0), vocab_k=_LM_VOCAB_K, alpha=1.0
    )
    return bigram_lm_score(docs, model)


def oracle_bigram_lm_perplexity() -> str:
    # Fit re-derived in SQL: mapped token sequences (top-k vocab else
    # chr(1) UNK) via positional struct-unnest + lag(), per-context
    # add-one bigram costs as integer micro-nats, GROUP BY integer sums.
    return f"""
WITH v_ex AS (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
),
v_cnt AS (SELECT token, count(*) AS tf FROM v_ex GROUP BY 1),
topv AS (SELECT token FROM v_cnt ORDER BY tf DESC, token LIMIT {_LM_VOCAB_K}),
tokp AS (
  SELECT doc_id, doc_id % 2 = 0 AS is_train,
    unnest(list_transform(range(1, len(string_split(text, ' ')) + 1),
           i -> {{'pos': i, 'tok': string_split(text, ' ')[i]}})) AS u
  FROM documents WHERE text IS NOT NULL
),
m AS (
  SELECT t.doc_id, t.is_train, t.u.pos AS pos,
    CASE WHEN v.token IS NULL THEN chr(1) ELSE t.u.tok END AS mt
  FROM tokp t LEFT JOIN topv v ON v.token = t.u.tok
),
pairs AS (
  SELECT doc_id, is_train,
    lag(mt) OVER (PARTITION BY doc_id ORDER BY pos) AS p, mt AS c
  FROM m
),
bp AS (SELECT * FROM pairs WHERE p IS NOT NULL),
nv AS (SELECT count(*) + 1 AS v1 FROM topv),
bc AS (SELECT p, c, count(*) AS pc FROM bp WHERE is_train GROUP BY 1, 2),
ctx AS (SELECT p, count(*) AS pn FROM bp WHERE is_train GROUP BY 1),
costs AS (
  SELECT bc.p, bc.c,
    CAST(floor(-ln((bc.pc + 1.0) / (ctx.pn + 1.0 * (SELECT v1 FROM nv)))
               * 1e6) AS BIGINT) AS nll
  FROM bc JOIN ctx ON ctx.p = bc.p
),
unseen AS (
  SELECT p,
    CAST(floor(-ln(1.0 / (pn + 1.0 * (SELECT v1 FROM nv))) * 1e6)
      AS BIGINT) AS nll
  FROM ctx
),
uni AS (
  -- same op order as the Python fit (-ln(alpha / (alpha*v1)) * 1e6):
  -- ln(v1) directly could differ by an ulp at the floor boundary
  SELECT CAST(floor(-ln(1.0 / (1.0 * v1)) * 1e6) AS BIGINT) AS nll FROM nv
),
scored AS (
  SELECT b.doc_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(coalesce(costs.nll, unseen.nll, (SELECT nll FROM uni)))
      AS BIGINT) AS s
  FROM bp b
  LEFT JOIN costs ON costs.p = b.p AND costs.c = b.c
  LEFT JOIN unseen ON unseen.p = b.p
  GROUP BY b.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(s.n, 0) AS BIGINT) AS n_bigrams,
  CAST(coalesce(s.s, 0) AS BIGINT) AS nll_micro_sum,
  CAST(CASE WHEN coalesce(s.n, 0) > 0 THEN s.s // s.n ELSE 0 END AS BIGINT)
    AS xent_micro
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


def q_bigram_lm_score_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unbounded-vocabulary production shape of bigram LM scoring
    (VERDICT r7 item 5): same fit as ``bigram_lm_perplexity``, but the
    vocabulary and dense (V+1)^2 cost table ride as BROADCAST DataFrames
    joined against posexploded tokens instead of plan literals — the
    shape that survives vocab_k >> 256, where a literal plan would not.
    ONE shuffle (the doc-keyed lag window + per-doc aggregation share the
    doc partitioning), both joins broadcast (plan-pinned in
    tests/test_plan_shapes.py).  Contract identical to the literal path
    (equivalence-pinned in tests/test_vocab.py), so the identical oracle
    certifies both."""
    from grower_spark.operators.text import bigram_lm_score_join, fit_bigram_lm

    docs = load_table(spark, sf_dir, "documents")
    model = fit_bigram_lm(
        docs.where(F.col("doc_id") % 2 == 0), vocab_k=_LM_VOCAB_K, alpha=1.0
    )
    return bigram_lm_score_join(docs, model)


_LM_TAIL_DROP = 100  # drop the worst 10% by cross-entropy


def q_lm_tail_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based LM tail filtering (the actual CCNet deployment
    shape — drop the worst X% rather than an absolute threshold): fit on
    even docs, score all, keep documents at or below the exact
    percentile_disc cutoff.  Ties at the cutoff kept on both engines
    (SQL-standard discrete percentile)."""
    from grower_spark.operators.text import drop_perplexity_tail, fit_unigram_lm

    docs = load_table(spark, sf_dir, "documents")
    model = fit_unigram_lm(
        docs.where(F.col("doc_id") % 2 == 0), vocab_k=_LM_VOCAB_K, alpha=1.0
    )
    return drop_perplexity_tail(docs, model, _LM_TAIL_DROP)


def oracle_lm_tail_keep() -> str:
    q = (1000 - _LM_TAIL_DROP) / 1000
    return f"""
WITH {_lm_cte_sql("m", "doc_id % 2 = 0", _LM_VOCAB_K)},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
sc AS (
  SELECT t.doc_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(coalesce(m_lm.nll, (SELECT nll FROM m_oov))) AS BIGINT) AS s
  FROM tok t LEFT JOIN m_lm ON m_lm.token = t.token
  GROUP BY t.doc_id
),
scored AS (
  SELECT d.doc_id,
    CAST(coalesce(sc.n, 0) AS BIGINT) AS n_tokens,
    CAST(coalesce(sc.s, 0) AS BIGINT) AS nll_micro_sum,
    CAST(CASE WHEN coalesce(sc.n, 0) > 0 THEN sc.s // sc.n ELSE 0 END
      AS BIGINT) AS xent_micro
  FROM documents d LEFT JOIN sc USING (doc_id)
),
cut AS (SELECT quantile_disc(xent_micro, {q}) AS t FROM scored)
SELECT scored.* FROM scored, cut WHERE xent_micro <= cut.t
"""


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: target LM fit on the English split, raw
    LM fit on the whole corpus, every document scored with the
    log-likelihood ratio in ONE zero-shuffle map pass (both models as
    plan map literals, two integer accumulators over the same token
    array).  Positive logw_micro = looks like the target domain."""
    from grower_spark.operators.text import fit_unigram_lm, importance_weights

    docs = load_table(spark, sf_dir, "documents")
    target = fit_unigram_lm(
        docs.where(F.col("lang") == "en"), vocab_k=_LM_VOCAB_K, alpha=1.0
    )
    raw = fit_unigram_lm(docs, vocab_k=_LM_VOCAB_K, alpha=1.0)
    return importance_weights(docs, target, raw)


def oracle_dsir_weights() -> str:
    return f"""
WITH {_lm_cte_sql("t", "lang = 'en'", _LM_VOCAB_K)},
{_lm_cte_sql("r", "1 = 1", _LM_VOCAB_K)},
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
scored AS (
  SELECT k.doc_id,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(coalesce(r_lm.nll, (SELECT nll FROM r_oov)))
         - sum(coalesce(t_lm.nll, (SELECT nll FROM t_oov))) AS BIGINT) AS w
  FROM tok k
  LEFT JOIN t_lm ON t_lm.token = k.token
  LEFT JOIN r_lm ON r_lm.token = k.token
  GROUP BY k.doc_id
)
SELECT d.doc_id,
  CAST(coalesce(s.n, 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(s.w, 0) AS BIGINT) AS logw_micro
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


_MIX_WEIGHTS = {f"src{i}": (i % 4) + 1 for i in range(20)}


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: integer water-filling keep rates per
    source (bounded fit — domain cardinality is model-sized), then a pure
    deterministic hash-permille filter.  Emits the per-source audit:
    total, fitted rate, kept count."""
    from grower_spark.operators.sampling import (
        hash_permille,
        source_mix_rates,
        stratum_rate_column,
    )

    docs = load_table(spark, sf_dir, "documents")
    rates = source_mix_rates(docs, "source", _MIX_WEIGHTS)
    rate = stratum_rate_column("source", rates)
    kept = hash_permille(F.col("doc_id"), "mix") < rate
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.max(rate).cast("long").alias("rate_permille"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
    )


def oracle_source_mix() -> str:
    values = ", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))
    return f"""
WITH w(source, wt) AS (VALUES {values}),
c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
j AS (SELECT c.source, n, wt FROM c JOIN w USING (source)),
b AS (SELECT n AS bn, wt AS bw FROM j
      ORDER BY CAST(n AS DOUBLE) / wt, source LIMIT 1),
r AS (SELECT source, least(1000, (1000 * wt * bn) // (bw * n)) AS rate
      FROM j, b)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_total,
  CAST(max(coalesce(r.rate, 0)) AS BIGINT) AS rate_permille,
  CAST(sum(CASE WHEN
    CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
      < coalesce(r.rate, 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN r USING (source)
GROUP BY d.source
"""


_TOKENIZE_VOCAB_K = 64


def q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization to id sequences: top-64 vocabulary fitted on the
    corpus (one bounded collect — model, not data), then a zero-shuffle
    per-row encode against the vocab map literal.  Unknown tokens → id 0.
    The id sequence is emitted comma-joined so the contract stays flat."""
    from grower_spark.operators.text import collect_vocab, tokenize_to_ids

    docs = load_table(spark, sf_dir, "documents")
    vocab = collect_vocab(docs, k=_TOKENIZE_VOCAB_K)
    return tokenize_to_ids(docs, vocab)


def oracle_tokenize_ids() -> str:
    return f"""
WITH exploded AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), vocab AS (
  SELECT tok, CAST(row_number() OVER (ORDER BY count(*) DESC, tok) AS BIGINT) AS id
  FROM exploded GROUP BY tok
  ORDER BY count(*) DESC, tok LIMIT {_TOKENIZE_VOCAB_K}
), toks AS (
  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS ord,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
)
SELECT t.doc_id,
  CAST(count(*) AS BIGINT) AS n_ids,
  CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
  string_agg(CAST(coalesce(v.id, 0) AS VARCHAR), ',' ORDER BY t.ord) AS ids_csv
FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
GROUP BY t.doc_id
"""


_N_SHARDS = 16


def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shard-shuffle: hash-keyed shard assignment plus
    in-shard rank — the reproducible example-order randomization before a
    training write.  One shuffle (per-shard rank window)."""
    from grower_spark.operators.sampling import shard_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return shard_shuffle(docs, "doc_id", _N_SHARDS, salt="s42").select(
        "doc_id", "shard", "shard_pos"
    )


def oracle_shard_shuffle() -> str:
    return f"""
SELECT doc_id,
  CAST(h % {_N_SHARDS} AS BIGINT) AS shard,
  CAST(row_number() OVER (PARTITION BY h % {_N_SHARDS} ORDER BY h, doc_id) AS BIGINT) AS shard_pos
FROM (
  SELECT doc_id,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':s42'), 1, 15)) AS BIGINT) AS h
  FROM documents
)
"""


_NB_VOCAB_K = 128


def q_nb_lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language identification (r8): fit per-class
    add-one token models on the even-doc_id labeled split (shared top-k
    vocab + per-class OOV bucket + doc-count priors), then score EVERY
    document under every class in one zero-shuffle map pass and predict
    the argmin — the supervised counterpart of the heuristic
    text_lang_id row and the fastText-lid role in a corpus pipeline.
    Integer micro-nat contract end-to-end (per-token, OOV, and prior
    costs all floor(-ln p * 1e6) BIGINTs), so sums are order-insensitive
    and the argmin is engine-exact; ties break to the lexicographically
    smallest class in both engines."""
    from grower_spark.operators.classify import fit_nb_classifier, nb_score

    docs = load_table(spark, sf_dir, "documents")
    model = fit_nb_classifier(
        docs.where(F.col("doc_id") % 2 == 0),
        label_col="lang", vocab_k=_NB_VOCAB_K, alpha=1.0,
    )
    return nb_score(docs, model, label_col="lang")


def oracle_nb_lang_score() -> str:
    # Same fit re-derived in SQL: the training split is even doc_ids with
    # non-NULL labels, the vocab is the split-wide top-k by (tf desc,
    # token asc), and every (class, token) cost is an integer micro-nat
    # computed ONCE per model entry — the per-document aggregation is
    # pure BIGINT sums, so GROUP BY needs no ordering guarantees.
    return f"""
WITH tr AS (
  SELECT * FROM documents WHERE doc_id % 2 = 0 AND lang IS NOT NULL
),
cls AS (SELECT DISTINCT lang FROM tr),
tok_tr AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM tr WHERE text IS NOT NULL
),
v AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok_tr GROUP BY 1),
topv AS (SELECT token FROM v ORDER BY tf DESC, token LIMIT {_NB_VOCAB_K}),
nv AS (SELECT CAST(count(*) AS BIGINT) AS v FROM topv),
cn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_c FROM tok_tr GROUP BY 1),
ct AS (
  SELECT t.lang, t.token, CAST(count(*) AS BIGINT) AS n_tc
  FROM tok_tr t JOIN topv USING (token) GROUP BY 1, 2
),
costs AS (
  SELECT c.lang, tv.token,
    CAST(floor(-ln((coalesce(ct.n_tc, 0) + 1.0)
      / (coalesce(cn.n_c, 0) + 1.0 * ((SELECT v FROM nv) + 1))) * 1e6)
      AS BIGINT) AS cost
  FROM cls c CROSS JOIN topv tv
  LEFT JOIN ct ON ct.lang = c.lang AND ct.token = tv.token
  LEFT JOIN cn ON cn.lang = c.lang
),
oov AS (
  SELECT c.lang,
    CAST(floor(-ln(((coalesce(cn.n_c, 0) - coalesce(s.n_v, 0)) + 1.0)
      / (coalesce(cn.n_c, 0) + 1.0 * ((SELECT v FROM nv) + 1))) * 1e6)
      AS BIGINT) AS cost
  FROM cls c
  LEFT JOIN cn ON cn.lang = c.lang
  LEFT JOIN (SELECT lang, sum(n_tc) AS n_v FROM ct GROUP BY 1) s
    ON s.lang = c.lang
),
prior AS (
  SELECT c.lang,
    CAST(floor(-ln((coalesce(d.n_docs, 0) + 1.0)
      / ((SELECT count(*) FROM tr) + 1.0 * (SELECT count(*) FROM cls)))
      * 1e6) AS BIGINT) AS cost
  FROM cls c
  LEFT JOIN (SELECT lang, count(*) AS n_docs FROM tr GROUP BY 1) d
    ON d.lang = c.lang
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
tokc AS (
  SELECT t.doc_id, c.lang,
    CAST(sum(coalesce(costs.cost, oov.cost)) AS BIGINT) AS s
  FROM tok t CROSS JOIN cls c
  LEFT JOIN costs ON costs.lang = c.lang AND costs.token = t.token
  LEFT JOIN oov ON oov.lang = c.lang
  GROUP BY 1, 2
),
total AS (
  SELECT d.doc_id, c.lang AS cand,
    CAST(prior.cost + coalesce(tokc.s, 0) AS BIGINT) AS score
  FROM documents d CROSS JOIN cls c
  JOIN prior ON prior.lang = c.lang
  LEFT JOIN tokc ON tokc.doc_id = d.doc_id AND tokc.lang = c.lang
),
best AS (
  SELECT doc_id, cand, score,
    row_number() OVER (PARTITION BY doc_id ORDER BY score ASC, cand ASC)
      AS rn
  FROM total
)
SELECT d.doc_id, d.lang, b.cand AS pred_lang,
  CAST(b.score AS BIGINT) AS nll_micro,
  CAST(d.lang IS NOT DISTINCT FROM b.cand AS INTEGER) AS correct
FROM documents d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


# ---------------------------------------------------------------------------
# r9 session-2 rows: heavy-hitter / network log panels, growth accounting,
# value segmentation, asymmetric containment dedup, density outliers
# ---------------------------------------------------------------------------

TOP_CLIENTS_K = 20


def q_nginx_top_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k client IPs by request count over the parsed access log —
    the heavy-hitter abuse panel (who hammers us, how many bytes, how
    erroneous, how broad).  One client-keyed aggregation with map-side
    partials (client cardinality << request count), then a rank over
    the aggregated table — at 100 TB that rank is a top-k
    TakeOrdered over per-client rows, never a raw-event sort.  Tie
    order (cnt DESC, addr ASC) is total, so the report is stable."""
    parsed = _parsed(spark, sf_dir)
    ep = F.regexp_extract("request", r"^GET /([^/]+)/", 1)
    agg = parsed.groupBy(F.col("remote_addr").alias("client")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("bytes_sent").cast("long").alias("sum_bytes"),
        F.sum(F.when(F.col("status") >= 500, 1).otherwise(0))
        .cast("long").alias("n_5xx"),
        F.countDistinct(ep).cast("long").alias("n_endpoints"),
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("client"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= TOP_CLIENTS_K)
        .select("rank", "client", "cnt", "sum_bytes", "n_5xx", "n_endpoints")
    )


def oracle_nginx_top_clients() -> str:
    return (
        ORACLE_PARSED_CTE
        + f"""
, per_client AS (
  SELECT remote_addr AS client,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(bytes_sent) AS BIGINT) AS sum_bytes,
    CAST(count(*) FILTER (WHERE status >= 500) AS BIGINT) AS n_5xx,
    CAST(count(DISTINCT regexp_extract(request, '^GET /([^/]+)/', 1))
         AS BIGINT) AS n_endpoints
  FROM parsed GROUP BY 1
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY cnt DESC, client ASC) AS INTEGER)
    AS rank
  FROM per_client
)
SELECT rank, client, cnt, sum_bytes, n_5xx, n_endpoints
FROM ranked WHERE rank <= {TOP_CLIENTS_K}
"""
    )


def q_nginx_ip_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Network-level (/16 prefix) traffic rollup over the parsed access
    log: requests, bytes, distinct clients, error basis points per
    prefix — the view that surfaces scanner subnets and per-network
    error skew that per-IP panels fragment.  One prefix-keyed
    aggregation; the exact distinct-client count rides the same shuffle
    (Spark plans it as a two-phase partial distinct), everything else
    combines map-side.  Prefix cardinality is bounded (<= 2^16 for
    IPv4), so the result is a small table at any corpus size."""
    parsed = _parsed(spark, sf_dir)
    prefix = F.regexp_extract("remote_addr", r"^([0-9]+\.[0-9]+)\.", 1)
    agg = parsed.groupBy(prefix.alias("prefix16")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum("bytes_sent").cast("long").alias("sum_bytes"),
        F.countDistinct("remote_addr").cast("long").alias("n_clients"),
        F.sum(F.when(F.col("status") >= 500, 1).otherwise(0))
        .cast("long").alias("n_5xx"),
    )
    return agg.select(
        "prefix16", "cnt", "sum_bytes", "n_clients",
        F.expr("(n_5xx * 10000) div cnt").cast("long").alias("err_bp"),
    )


def oracle_nginx_ip_prefix() -> str:
    return (
        ORACLE_PARSED_CTE
        + """
, per_prefix AS (
  SELECT regexp_extract(remote_addr, '^([0-9]+\\.[0-9]+)\\.', 1) AS prefix16,
    CAST(count(*) AS BIGINT) AS cnt,
    CAST(sum(bytes_sent) AS BIGINT) AS sum_bytes,
    CAST(count(DISTINCT remote_addr) AS BIGINT) AS n_clients,
    CAST(count(*) FILTER (WHERE status >= 500) AS BIGINT) AS n_5xx
  FROM parsed GROUP BY 1
)
SELECT prefix16, cnt, sum_bytes, n_clients,
  CAST(n_5xx * 10000 // cnt AS BIGINT) AS err_bp
FROM per_prefix
"""
    )


def q_events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting (new/retained/resurrected/churned) —
    see operators/retention.py::user_lifecycle for the plan contract."""
    from grower_spark.operators.retention import user_lifecycle

    ev = load_table(spark, sf_dir, "events")
    return user_lifecycle(ev)


def oracle_events_lifecycle() -> str:
    return """
WITH act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
),
seq AS (
  SELECT user_id, week,
    lag(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
  FROM act
),
counts AS (
  SELECT week,
    CAST(count(*) FILTER (WHERE prev_week IS NULL) AS BIGINT) AS n_new,
    CAST(count(*) FILTER (WHERE prev_week = week - INTERVAL 7 DAY)
         AS BIGINT) AS n_retained,
    CAST(count(*) FILTER (WHERE prev_week IS NOT NULL
                          AND prev_week <> week - INTERVAL 7 DAY)
         AS BIGINT) AS n_resurrected
  FROM seq GROUP BY 1
),
churn AS (
  SELECT week + INTERVAL 7 DAY AS week,
    CAST(count(*) AS BIGINT) AS n_churned
  FROM seq
  WHERE (next_week IS NULL OR next_week > week + INTERVAL 7 DAY)
    AND week + INTERVAL 7 DAY <= (SELECT max(week) FROM act)
  GROUP BY 1
)
SELECT strftime(coalesce(c.week, ch.week), '%Y-%m-%d') AS week,
  CAST(coalesce(c.n_new, 0) AS BIGINT) AS n_new,
  CAST(coalesce(c.n_retained, 0) AS BIGINT) AS n_retained,
  CAST(coalesce(c.n_resurrected, 0) AS BIGINT) AS n_resurrected,
  CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM counts c FULL OUTER JOIN churn ch ON c.week = ch.week
"""


def q_events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-value decile segmentation — see
    operators/retention.py::value_deciles for the fixed-point and plan
    contract."""
    from grower_spark.operators.retention import value_deciles

    ev = load_table(spark, sf_dir, "events")
    return value_deciles(ev, n_buckets=10)


def oracle_events_value_deciles() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_centis
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
ranked AS (
  SELECT total_centis,
    CAST(ntile(10) OVER (ORDER BY total_centis DESC, user_id ASC) AS INTEGER)
      AS decile
  FROM per_user
)
SELECT decile,
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(total_centis) AS BIGINT) AS sum_centis,
  CAST(min(total_centis) AS BIGINT) AS min_centis,
  CAST(max(total_centis) AS BIGINT) AS max_centis
FROM ranked GROUP BY 1
"""


CONTAINMENT_THRESHOLD = 0.25


def q_doc_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment pairs — the sub-document companion
    to dedup_ngram_jaccard (quote/excerpt inclusion that the symmetric
    metric under-scores).  Same single-shuffle inverted-index core;
    see operators/dedup.py::ngram_containment_pairs."""
    from grower_spark.operators.dedup import ngram_containment_pairs

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return ngram_containment_pairs(
        docs, shingle_n=SHINGLE_N, threshold=CONTAINMENT_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )


def oracle_doc_containment() -> str:
    return f"""
WITH shing AS (
  SELECT doc_id, {_duck_shingles()} AS sh FROM documents
),
inv0 AS (
  SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM shing
),
rare AS (
  SELECT s FROM inv0 GROUP BY s HAVING count(DISTINCT doc_id) <= {JACCARD_MAX_DF}
),
inv AS (
  SELECT inv0.* FROM inv0 JOIN rare ON inv0.s = rare.s
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS size_a, b.sz AS size_b,
         CAST(count(*) AS BIGINT) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, inter, CAST(size_a AS INTEGER) AS size_a,
       CAST(size_b AS INTEGER) AS size_b,
       round(inter / size_a, 4) AS cont_a_r4,
       round(inter / size_b, 4) AS cont_b_r4
FROM pairs
WHERE greatest(round(inter / size_a, 4), round(inter / size_b, 4))
      >= {CONTAINMENT_THRESHOLD}
"""


DENSITY_TAU = 0.2
DENSITY_PANEL_MOD = 11
DENSITY_MIN_CLOSE = 1


def q_embedding_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-based embedding outlier filter against a deterministic
    reference panel — see operators/similarity.py::density_vs_panel.
    The panel here is the ``vec_id % 11`` systematic sample (at
    100 TB: a fixed broadcastable reference set, e.g. 10k vectors)."""
    from grower_spark.operators.similarity import density_vs_panel

    emb = _cpu_spread(spark, load_table(spark, sf_dir, "embeddings"))
    panel = emb.where(
        F.col("vec_id") % DENSITY_PANEL_MOD == 0
    ).select(F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec"))
    # kernel pinned: the oracle's HALF_UP rounding is the HOF path's; the
    # auto dispatch (r10) would pick the BLAS twin here (dim 64 x ~45
    # panel rows at sf0.1 sits near the cutover) whose half-even np.round
    # could flip a boundary cosine — production callers use the default
    return density_vs_panel(
        emb, panel, tau=DENSITY_TAU, min_close=DENSITY_MIN_CLOSE,
        kernel="hof",
    )


def oracle_embedding_density() -> str:
    return f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings
),
p AS (SELECT * FROM v WHERE vec_id % {DENSITY_PANEL_MOD} = 0),
j AS (
  SELECT a.vec_id,
    CAST(count(*) FILTER (
      WHERE a.vec_id <> p.vec_id
        AND round(
          list_dot_product(a.vec, p.vec)
          / (sqrt(list_dot_product(a.vec, a.vec))
             * sqrt(list_dot_product(p.vec, p.vec))), 4) >= {DENSITY_TAU}
    ) AS BIGINT) AS n_close
  FROM v a CROSS JOIN p GROUP BY 1
)
SELECT vec_id, n_close,
  CAST(n_close < {DENSITY_MIN_CLOSE} AS INTEGER) AS is_outlier
FROM j
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (operators/diff.py): two deterministic views of the
    documents table stand in for consecutive dataset releases —
    ``old`` drops ids ending in 7 (these become `added`), ``new`` drops
    ids ending in 3 (`removed`) and revises the text of ids ending in 1
    (`changed`); everything else is `unchanged`.  One full-outer hash
    join on doc_id over map-side (id, hash) projections."""
    from grower_spark.operators.diff import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 10 != 7)
    new = docs.where(F.col("doc_id") % 10 != 3).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 1, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new)


def oracle_corpus_diff() -> str:
    h = "CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)"
    return f"""
WITH old AS (
  SELECT doc_id, {h} AS h FROM documents WHERE doc_id % 10 <> 7
),
new AS (
  SELECT doc_id,
    CAST(('0x' || substr(md5(
      CASE WHEN doc_id % 10 = 1 THEN text || ' [rev2]' ELSE text END
    ), 1, 15)) AS BIGINT) AS h
  FROM documents WHERE doc_id % 10 <> 3
),
j AS (
  SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
    old.h AS ho, new.h AS hn,
    (old.doc_id IS NOT NULL) AS po, (new.doc_id IS NOT NULL) AS pn
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT doc_id,
  CASE WHEN NOT po THEN 'added'
       WHEN NOT pn THEN 'removed'
       WHEN ho IS NOT DISTINCT FROM hn THEN 'unchanged'
       ELSE 'changed' END AS status
FROM j
"""


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Poisson sampling (operators/sampling.py): inclusion
    probability proportional to document length (n_chars), expected 500
    rows — the token-weighted corpus downsample used when a char budget,
    not a doc budget, is the constraint.  One scalar aggregate broadcast
    + a pure map-side integer filter; zero shuffles after W."""
    from grower_spark.operators.sampling import weighted_poisson_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_poisson_sample(
        docs, "n_chars", target_rows=500, key_col="doc_id", salt="wps"
    ).select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))


def oracle_sample_weighted() -> str:
    return """
WITH w AS (SELECT CAST(sum(n_chars) AS BIGINT) AS wt FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
FROM documents, w
WHERE (CAST(('0x' || substr(md5('wps|' || CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 1000000) * wt
      < 1000000 * 500 * n_chars
"""


def q_quality_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language adaptive quality gate (operators/sampling.py): keep
    the top 300 permille of each language by alpha-ratio permille score.
    The cutoff adapts to each language's own score distribution — no
    corpus-scale per-language window, just a bounded (lang, score)
    histogram + broadcast cutoffs.  Emits the per-language audit."""
    from grower_spark.operators.sampling import adaptive_quality_cut

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    score = F.round(
        F.lit(1000.0) * n_alpha / F.greatest(F.length("text"), F.lit(1))
    ).cast("long")
    scored = docs.select("lang", score.alias("score"))
    return adaptive_quality_cut(scored, "lang", "score", keep_permille=300)


def oracle_quality_adaptive() -> str:
    return """
WITH s AS (
  SELECT lang,
    CAST(round(1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1)) AS BIGINT) AS score
  FROM documents WHERE text IS NOT NULL
),
h AS (SELECT lang, score, count(*) AS n FROM s GROUP BY 1, 2),
r AS (SELECT lang, score, n,
        sum(n) OVER (PARTITION BY lang ORDER BY score DESC) AS cum_top,
        sum(n) OVER (PARTITION BY lang) AS total
      FROM h),
c AS (SELECT lang, max(score) AS cutoff, max(total) AS n_total
      FROM r WHERE cum_top * 1000 >= 300 * total GROUP BY 1)
SELECT s.lang,
  CAST(max(c.n_total) AS BIGINT) AS n_total,
  CAST(max(c.cutoff) AS BIGINT) AS cutoff,
  CAST(count(*) AS BIGINT) AS n_kept
FROM s JOIN c USING (lang) WHERE s.score >= c.cutoff
GROUP BY 1
"""


def q_embedding_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding diversity (operators/diversity.py): mean
    pairwise squared distance via the moment identity E||x-y||^2 =
    2(E||x||^2 - ||Ex||^2) — zero pair enumeration, one aggregation
    pass, integer-exact in milli-quantized units."""
    from grower_spark.operators.diversity import embedding_diversity

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_diversity(emb, group_col="label")


def oracle_embedding_diversity() -> str:
    return """
WITH q AS (
  SELECT vec_id, label,
    generate_subscripts(embedding, 1) AS pos,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL
),
d AS (SELECT label, pos,
        CAST(sum(xq) AS BIGINT) AS s1,
        CAST(sum(xq * xq) AS BIGINT) AS s2p
      FROM q GROUP BY 1, 2),
m AS (SELECT label,
        CAST(sum(s1 * s1) AS BIGINT) AS norm_mean_sq,
        CAST(sum(s2p) AS BIGINT) AS s2_sum
      FROM d GROUP BY 1),
c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
      FROM embeddings WHERE embedding IS NOT NULL GROUP BY 1)
SELECT c.label, c.n, m.s2_sum, m.norm_mean_sq,
  CAST(2 * (c.n * m.s2_sum - m.norm_mean_sq) AS DOUBLE)
    / CAST(c.n * c.n AS DOUBLE) AS diversity
FROM c JOIN m USING (label)
"""


def q_term_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 token-pair affinity (operators/text.py): PMI-without-log
    collocation mining over consecutive-token bigrams, min pair count 5.
    Two map-combinable explode→agg shuffles + broadcast unigram joins +
    a TakeOrderedAndProject top-k (no global sort)."""
    from grower_spark.operators.text import term_affinity_topk

    docs = load_table(spark, sf_dir, "documents")
    return term_affinity_topk(docs, k=50, min_count=5)


def oracle_term_affinity() -> str:
    return """
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS t
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n,
               CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS nb
        FROM docs),
tok AS (SELECT doc_id, generate_subscripts(t, 1) AS ord, unnest(t) AS tok
        FROM docs),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
big AS (SELECT a.tok AS x, b.tok AS y, CAST(count(*) AS BIGINT) AS c_xy
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
        GROUP BY 1, 2 HAVING count(*) >= 5),
j AS (SELECT x, y, c_xy, ux.c AS c_x, uy.c AS c_y,
        (CAST(c_xy AS DOUBLE) / CAST(tot.nb AS DOUBLE))
        / ((CAST(ux.c AS DOUBLE) / CAST(tot.n AS DOUBLE))
           * (CAST(uy.c AS DOUBLE) / CAST(tot.n AS DOUBLE))) AS aff
      FROM big JOIN uni ux ON big.x = ux.tok
               JOIN uni uy ON big.y = uy.tok, tot)
SELECT x, y, c_xy, c_x, c_y, round(aff, 4) AS affinity_r4
FROM j ORDER BY aff DESC, x, y LIMIT 50
"""


def q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k per-source sample (operators/sampling.py): the 30 rows
    with the smallest portable hash keys in every source — fixed-size
    eval panels.  Two-phase: bucket-histogram cutoffs keep ~99.9% of
    the winners with a broadcast filter; only the boundary bucket
    (≈1/1024 of each group) sees a rank window."""
    from grower_spark.operators.sampling import sample_exact_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return sample_exact_k_per_group(docs, "source", k=30, key_col="doc_id")


def oracle_sample_exact_k() -> str:
    return """
WITH h AS (
  SELECT source, doc_id,
    CAST(('0x' || substr(md5('ekg|' || CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) AS hk
  FROM documents
),
r AS (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rn
      FROM h)
SELECT source, doc_id FROM r WHERE rn <= 30
"""


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding mean/variance (operators/diversity.py):
    the whitening-fit table, integer-moment exact, one map-combinable
    (pos)-keyed aggregation with a model-sized output."""
    from grower_spark.operators.diversity import embedding_dim_stats

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb)


def oracle_embedding_dim_stats() -> str:
    return """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL
)
SELECT CAST(dim AS INTEGER) AS dim,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(xq) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_q,
  CAST(count(*) * sum(xq * xq) - sum(xq) * sum(xq) AS DOUBLE)
    / CAST(count(*) * count(*) AS DOUBLE) AS var_q
FROM q GROUP BY 1
"""


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 embedding quantization
    (operators/diversity.py:quantize_embeddings_int8): fit = model-sized
    per-dim min/max (one tiny map-combinable shuffle, collected into
    plan literals), encode = zero-shuffle codegen transform.  The flat
    per-vector outputs (code moments, position-weighted checksum,
    fixed-point reconstruction error) pin every individual code in the
    certified hash without shipping arrays."""
    from grower_spark.operators.diversity import quantize_embeddings_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings_int8(emb)


def oracle_embedding_quantize_int8() -> str:
    return """
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim, q.xq, f.mn, f.mx,
    CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
         ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END AS code
  FROM q JOIN fit f USING (dim)
), r AS (
  SELECT *, mn + (code * (mx - mn)) // 254 AS recon FROM c
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
  CAST(count(*) AS INT) AS n_dims,
  CAST(sum(code) AS BIGINT) AS sum_code,
  CAST(min(code) AS BIGINT) AS min_code,
  CAST(max(code) AS BIGINT) AS max_code,
  CAST(sum(code * dim) AS BIGINT) AS code_checksum,
  CAST(sum(abs(xq - recon)) AS BIGINT) AS sum_abs_err_q
FROM r GROUP BY 1
"""


def q_ann_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k similarity search over INT8-QUANTIZED embeddings
    (operators/similarity.py::ann_int8_topk): the memory-tier scan — a
    4x-smaller code corpus, centered integer-dot kernel, every score an
    exact int64 so the driver hash certifies every rank.  Same plan
    family as the float ANN rows: broadcast panel, one map-side corpus
    scan, top-k window; never corpus x corpus."""
    from grower_spark.operators.similarity import ann_int8_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_int8_topk(emb, n_queries=N_ANN_QUERIES, k=ANN_TOPK)


def oracle_ann_int8_topk() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  -- ragged vectors are excluded on both engines (see ann_int8_topk)
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


ANN_RERANK_M = 40  # int8 shortlist width: m = 4k (similarity.py contract)


def q_ann_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier retrieval (operators/similarity.py::ann_int8_rerank):
    the int8 code scan shortlists top-m=4k per query, a float cosine
    rerank over only those Q x m rows returns the final top-k — the
    recall tier the int8 scan's own contract names (r13 verdict
    "What's missing" 2; recall@10 strictly above int8-only pinned in
    tests/test_r14_ops.py).  The expensive pass stays the bounded
    code-tier scan; floats are touched for shortlist rows only."""
    from grower_spark.operators.similarity import ann_int8_rerank

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_int8_rerank(emb, n_queries=N_ANN_QUERIES, m=ANN_RERANK_M,
                           k=ANN_TOPK)


def oracle_ann_int8_rerank() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
  GROUP BY 1, 2
), shortlist AS (
  SELECT qid, vec_id FROM dots
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
          <= {ANN_RERANK_M}
), qv AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_ANN_QUERIES}
), rer AS (
  SELECT s.qid, s.vec_id,
    round(
      list_dot_product(v.qvec, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(v.qvec, v.qvec))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))),
      4) AS sim_r4
  FROM shortlist s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN qv v ON v.qid = s.qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id)
       AS INTEGER) AS rank,
  sim_r4
FROM rer QUALIFY rank <= {ANN_TOPK}
"""


def q_ann_ivf_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF × int8 composition (operators/similarity.py::ann_ivf_int8):
    the coarse quantizer bounds WHICH rows are scored (n_probe cells per
    query), the int8 codes bound WHAT is scanned (4×-smaller corpus,
    exact-int64 kernel) — the two candidate-reduction axes of a 100 TB
    retrieval tier certified COMPOSED, not just individually (the same
    composition discipline as corpus_build_full)."""
    from grower_spark.operators.similarity import ann_ivf_int8

    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_int8(emb, n_queries=N_ANN_QUERIES, k=ANN_TOPK,
                        n_cells=IVF_CELLS, n_probe=IVF_PROBE, dim=EMB_DIM)


def oracle_ann_ivf_int8() -> str:
    from grower_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(IVF_CELLS, EMB_DIM)
    ranked_terms = ", ".join(
        f"{{'m': -list_dot_product(vec, CAST([{', '.join(repr(v) for v in cent)}] AS DOUBLE[])), "
        f"'i': CAST({i} AS INTEGER)}}"
        for i, cent in enumerate(cents)
    )
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), fv AS (
  -- cell assignment runs on the FLOAT vectors of the code-tier row set
  -- (index-build time, before floats go cold)
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec
  FROM embeddings e JOIN fullv USING (vec_id)
), rk AS (
  SELECT vec_id,
    list_transform(list_sort([{ranked_terms}]), s -> s.i) AS cells
  FROM fv
), cw AS (SELECT vec_id, cells[1] AS cell FROM rk),
qp AS (
  SELECT vec_id AS qid, unnest(list_slice(cells, 1, {IVF_PROBE})) AS cell
  FROM rk WHERE vec_id < {N_ANN_QUERIES}
), cand AS (
  SELECT qp.qid, cw.vec_id
  FROM cw JOIN qp ON cw.cell = qp.cell AND cw.vec_id <> qp.qid
), dots AS (
  SELECT cand.qid, cand.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM cand
  JOIN cf ON cf.vec_id = cand.vec_id
  JOIN cf qs ON qs.vec_id = cand.qid AND qs.dim = cf.dim
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once persisted codes+cells index for this sf_dir (r14
    verdict item 2: the index/query split).  First call per (sf_dir,
    params) pays the one-time build; every later call — including the
    bench's warm runs, which is the point — only reads it."""
    from grower_spark.operators.ann_index import ensure_ann_index

    return ensure_ann_index(spark, sf_dir, n_cells=IVF_CELLS)


def q_ann_index_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat code-tier top-k over a PREBUILT persisted index
    (operators/ann_index.py::ann_index_int8_topk): same certified
    contract as ann_int8_topk, but the corpus fit-collect + encode ran
    ONCE at index-build time and the query path reads stored codes,
    encoding only the bounded query panel against the stored fit.  The
    oracle re-derives codes from the embeddings table independently, so
    a corrupt index OR a wrong query path both fail the hash — build
    and query certified together."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def oracle_ann_index_int8() -> str:
    # Deliberately the one-shot scan's oracle: the persisted index is
    # value-equivalent to re-deriving codes from the embeddings table
    # (that IS the index contract), so the independent re-derivation
    # certifies the stored codes and the query path in one hash.
    return oracle_ann_int8_topk()


def q_ann_ivf_int8_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed three-stage production retrieval
    (operators/ann_index.py::ann_index_ivf_rerank): IVF probe (stored
    centroids, parquet-partition-pruned cells) → int8 shortlist
    (exact-int64 kernel, top-m per query, partial-top-k bounded) →
    float cosine rerank over only the Q×m shortlist — r14 verdict
    "What's missing" 2: each stage was certified alone in r14, this row
    certifies the composition, reading the PREBUILT index for stages
    1-2.  Recall pinned ≥ the quantized-only ranks' in
    tests/test_r15_ops.py."""
    from grower_spark.operators.ann_index import ann_index_ivf_rerank

    path = _ann_index_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_ivf_rerank(
        spark, path, emb, q, m=ANN_RERANK_M, k=ANN_TOPK, n_probe=IVF_PROBE,
    )


def oracle_ann_ivf_int8_rerank() -> str:
    # The three stages re-derived end to end in SQL: quantization CTEs +
    # plan-constant centroid dots + probed-cell join (= the persisted
    # index, independently re-derived), then the top-m shortlist under
    # the int8 (dot desc, vec_id) order, then the float cosine rerank —
    # the composition of oracle_ann_ivf_int8 and oracle_ann_int8_rerank.
    from grower_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(IVF_CELLS, EMB_DIM)
    ranked_terms = ", ".join(
        f"{{'m': -list_dot_product(vec, CAST([{', '.join(repr(v) for v in cent)}] AS DOUBLE[])), "
        f"'i': CAST({i} AS INTEGER)}}"
        for i, cent in enumerate(cents)
    )
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), fv AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec
  FROM embeddings e JOIN fullv USING (vec_id)
), rk AS (
  SELECT vec_id,
    list_transform(list_sort([{ranked_terms}]), s -> s.i) AS cells
  FROM fv
), cw AS (SELECT vec_id, cells[1] AS cell FROM rk),
qp AS (
  SELECT vec_id AS qid, unnest(list_slice(cells, 1, {IVF_PROBE})) AS cell
  FROM rk WHERE vec_id < {N_ANN_QUERIES}
), cand AS (
  SELECT qp.qid, cw.vec_id
  FROM cw JOIN qp ON cw.cell = qp.cell AND cw.vec_id <> qp.qid
), dots AS (
  SELECT cand.qid, cand.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM cand
  JOIN cf ON cf.vec_id = cand.vec_id
  JOIN cf qs ON qs.vec_id = cand.qid AND qs.dim = cf.dim
  GROUP BY 1, 2
), shortlist AS (
  SELECT qid, vec_id FROM dots
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
          <= {ANN_RERANK_M}
), qv AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_ANN_QUERIES}
), rer AS (
  SELECT s.qid, s.vec_id,
    round(
      list_dot_product(v.qvec, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(v.qvec, v.qvec))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))),
      4) AS sim_r4
  FROM shortlist s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN qv v ON v.qid = s.qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id)
       AS INTEGER) AS rank,
  sim_r4
FROM rer QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_append_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the TWO-BATCH index: base build over
    vec_id % 3 != 0 (fit frozen there), then append_ann_index of the
    % 3 == 0 remainder encoded against that stored fit — the streaming
    growth lifecycle as one reproducible on-disk state.  A crash
    between build and append leaves params without the append record
    and the whole sequence redoes from the overwrite build."""
    import hashlib as _hashlib
    import os as _os

    from grower_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
    )

    sf_abs = _os.path.abspath(sf_dir)
    key = f"{sf_abs}|cells={IVF_CELLS}|levels=254|split3|v1"
    tag = "{}-{}".format(
        _os.path.basename(sf_abs),
        _hashlib.sha1(key.encode()).hexdigest()[:10],
    )
    base_dir = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), _os.pardir,
        "ann_index",
    )
    path = _os.path.abspath(_os.path.join(base_dir, tag))
    from grower_spark.operators.index_meta import get_index_meta

    params = get_index_meta().try_read_params(path)
    if params is not None and params.get("source") == key \
            and params.get("appends"):
        return path
    _os.makedirs(path, exist_ok=True)
    emb = load_table(spark, sf_dir, "embeddings")
    build_ann_index(
        emb.where(F.col("vec_id") % 3 != 0), path, n_cells=IVF_CELLS,
        source=key,
    )
    append_ann_index(emb.where(F.col("vec_id") % 3 == 0), path)
    return path


def q_ann_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over an index GROWN IN TWO BATCHES
    (operators/ann_index.py::append_ann_index): base build over
    vec_id % 3 != 0 freezes the fit; the remainder is appended later,
    encoded against that STORED fit with out-of-range codes clamped to
    int8 range — the streaming-corpus lifecycle (same
    never-reprocess-old-rows discipline as the incremental MinHash
    dedup state).  The oracle re-derives the fit over the BASE subset
    only, so a refit-on-append (which would silently re-scale existing
    codes) or a missing clamp both fail the hash.  Queries span both
    batches (qids 0,3,6 land in the appended batch)."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_append_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def oracle_ann_index_append() -> str:
    # the one-shot int8 oracle with two deltas: the fit CTE is
    # restricted to the BASE batch (vec_id % 3 <> 0) and codes clamp to
    # [0, 254] (append saturation) — query codes clamp identically
    # because the Spark side encodes the panel against the same stored
    # fit through the same helper.
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q
  WHERE vec_id % 3 <> 0 GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    greatest(CAST(0 AS BIGINT), least(CAST(254 AS BIGINT),
      CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
           ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END)) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


def _ann_aux_index_dir(sf_dir: str, variant: str) -> tuple[str, str]:
    """(path, key) for a derived on-disk index state under the repo's
    ann_index/ cache.  The key folds the same stat-only content
    fingerprint as ensure_ann_index (r15 ADVICE 2: a regenerated
    sf_dir must get a fresh build, not a silently stale index) — the
    stat is the only I/O."""
    import hashlib as _hashlib
    import os as _os

    from grower_spark.operators.ann_index import _source_fingerprint

    sf_abs = _os.path.abspath(sf_dir)
    key = (f"{sf_abs}|cells={IVF_CELLS}|levels=254|{variant}"
           f"|src={_source_fingerprint(sf_abs)}|v2")
    tag = "{}-{}".format(
        _os.path.basename(sf_abs),
        _hashlib.sha1(key.encode()).hexdigest()[:10],
    )
    base_dir = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), _os.pardir,
        "ann_index",
    )
    return _os.path.abspath(_os.path.join(base_dir, tag)), key


def _ensure_aux_index(spark: SparkSession, sf_dir: str, variant: str,
                      is_done, build) -> str:
    """Shared build-once cache skeleton for the derived index states
    (the same params.json-as-completion-marker contract as
    ensure_ann_index): returns the path if ``is_done(params)`` holds
    for a params.json whose source matches the key, else runs
    ``build(path, key)`` from scratch."""
    import os as _os

    from grower_spark.operators.index_meta import get_index_meta

    path, key = _ann_aux_index_dir(sf_dir, variant)
    params = get_index_meta().try_read_params(path)  # None = partial/absent
    if params is not None and params.get("source") == key \
            and is_done(params):
        return path
    _os.makedirs(path, exist_ok=True)
    build(path, key)
    return path


def _ann_index_delete_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the TOMBSTONED index: full build, then
    delete_from_ann_index of the vec_id % 7 == 1 subset (handed over as
    a DataFrame — the dedup-pass calling convention).  The codes of the
    deleted rows are still in the parquet; only the tombstone anti-join
    keeps them out of results — which is exactly what the driver row
    certifies."""
    from grower_spark.operators.ann_index import (
        build_ann_index,
        delete_from_ann_index,
    )

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        build_ann_index(emb, path, n_cells=IVF_CELLS, source=key)
        delete_from_ann_index(
            spark, path,
            emb.where(F.col("vec_id") % 7 == 1).select("vec_id"),
        )

    return _ensure_aux_index(
        spark, sf_dir, "del7",
        is_done=lambda p: bool(p.get("deletes")),
        build=build,
    )


def q_ann_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over an index with SERVED tombstones
    (operators/ann_index.py::delete_from_ann_index): the vec_id % 7 == 1
    rows were retired after the build — their codes still sit in the
    partitioned parquet, the query anti-joins the tombstone table out
    before the kernel, so they must be absent from every top-k while
    every surviving neighbor moves up.  qid 1 is itself tombstoned and
    still queries (the panel is external input) — deletion removes a
    row from CANDIDACY, not from the corpus a caller may score.  The
    oracle re-derives codes from the embeddings table and applies the
    same exclusion relationally, so serving a deleted row OR dropping a
    survivor both fail the hash."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_delete_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def oracle_ann_index_delete() -> str:
    # the one-shot int8 oracle with ONE delta: candidates exclude the
    # tombstoned subset (fit and codes stay full-corpus — deletion
    # happens after the build and must NOT refit)
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
    AND cf.vec_id % 7 <> 1
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_rebuild_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the FULL-LIFECYCLE index: base build over
    vec_id % 3 != 0, append of the % 3 == 0 remainder (stored-fit
    encode + clamping), tombstone of vec_id % 5 == 4, then
    rebuild_ann_index over the full table — the rebuild anti-joins the
    tombstones, re-fits over the survivors, re-encodes everything, and
    clears the tombstone dir.  End state: a compacted index whose
    content must equal a fresh build over (well-formed rows with
    vec_id % 5 <> 4), erasing both the append's clamped codes and the
    deleted rows."""
    from grower_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
        delete_from_ann_index,
        rebuild_ann_index,
    )

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        build_ann_index(
            emb.where(F.col("vec_id") % 3 != 0), path, n_cells=IVF_CELLS,
            source=key,
        )
        append_ann_index(emb.where(F.col("vec_id") % 3 == 0), path)
        delete_from_ann_index(
            spark, path,
            emb.where(F.col("vec_id") % 5 == 4).select("vec_id"),
        )
        rebuild_ann_index(emb, path)

    return _ensure_aux_index(
        spark, sf_dir, "lifecycle35",
        is_done=lambda p: p.get("rebuilds") == 1 and not p.get("appends"),
        build=build,
    )


def q_ann_index_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over a REBUILT index
    (operators/ann_index.py::rebuild_ann_index): the index lived the
    whole lifecycle — base build froze a partial fit, an append encoded
    against it with clamping, a delete tombstoned vec_id % 5 == 4 —
    and then one rebuild event re-fit over the surviving corpus,
    re-encoded every row, compacted the tombstones away, and reset the
    history.  The oracle is a fresh derivation over (rows with
    vec_id % 5 <> 4) and NOTHING else: if the rebuild had kept the
    stale base fit, kept the append's clamped codes, or resurrected a
    deleted row, the hash fails.  The query panel is restricted to
    surviving ids so panel encoding is clamp-free on both engines."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_rebuild_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(
        (F.col("vec_id") < N_ANN_QUERIES) & (F.col("vec_id") % 5 != 4)
    ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def oracle_ann_index_rebuild() -> str:
    # a FRESH build's oracle over the surviving rows: the % 5 <> 4
    # restriction lands in the base CTE, so the fit, the codes, and the
    # candidate set all reflect the post-rebuild corpus — no clamp CTE
    # because a fresh fit covers its own corpus by construction
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND vec_id % 5 <> 4
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


# sf-independent PUBLISHED-FILE name under ann_index/ for the trained
# centroids the oracle reads — an atomically-replaced parquet COPY, not
# a symlink (r16 verdict "Next round" 6 + ADVICE 3: symlinks are
# POSIX-only and can dangle; a published copy is self-contained and the
# object-store equivalent is a plain PUT).  Re-published by
# _publish_trained_centroids on every query-side ensure.
_TRAINED_ALIAS = "trained-current.parquet"
_TRAINED_DEL_ALIAS = "trained-del-current.parquet"


def _publish_trained_centroids(path: str, alias_name: str) -> None:
    """Copy the index's single coalesced centroids parquet to the
    stable alias file the static oracle SQL reads, atomically (copy +
    rename via the index-metadata backend).  The query side — which
    the harness always runs FIRST — publishes the artifact it
    certifies, making the row work at any sf_dir."""
    import glob as _glob
    import os as _os

    from grower_spark.operators.index_meta import get_index_meta

    parts = sorted(_glob.glob(_os.path.join(path, "centroids", "*.parquet")))
    assert len(parts) == 1, (path, parts)  # coalesce(1) at build time
    dest = _os.path.join(_os.path.dirname(path), alias_name)
    get_index_meta().publish_file(parts[0], dest)


def _ann_index_trained_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the TRAINED-QUANTIZER index: centroids come
    from ivf_kmeans_centroids (spherical k-means on a bounded corpus
    sample) instead of the deterministic grid — the production coarse
    quantizer the r13-r15 driver rows deliberately avoided so their
    oracles stayed fully independent.  The build persists the trained
    centroids to <path>/centroids/ parquet; the oracle reads THAT
    artifact (the one genuinely non-SQL-derivable model) and re-derives
    everything else — fit, codes, cells, probe, kernel, rerank — from
    the embeddings table."""
    from grower_spark.operators.ann_index import build_ann_index
    from grower_spark.operators.similarity import ivf_kmeans_centroids

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        cents = ivf_kmeans_centroids(emb, n_cells=IVF_CELLS, dim=EMB_DIM)
        build_ann_index(emb, path, n_cells=IVF_CELLS, centroids=cents,
                        source=key)

    path = _ensure_aux_index(
        spark, sf_dir, "trained", is_done=lambda p: True, build=build,
    )
    # refresh the sf-independent published centroids copy the oracle
    # reads: the oracle SQL is a static string, so it cannot embed the
    # fingerprinted tag — the query side (which the harness always runs
    # FIRST) publishes the artifact it certifies, making the row work
    # at any sf_dir, not just the driver's sf0.01
    _publish_trained_centroids(path, _TRAINED_ALIAS)
    return path


def q_ann_index_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed three-stage retrieval under the TRAINED coarse
    quantizer (similarity.py::ivf_kmeans_centroids →
    ann_index.py::ann_index_ivf_rerank): closes the r13-carried
    certification gap where every IVF driver row kept the
    data-independent grid so DuckDB could re-derive the centroids —
    k-means output isn't SQL-derivable, so THIS row's oracle reads the
    persisted centroids parquet from the index dir (written at build,
    exact doubles) and independently re-derives the fit, codes, cell
    assignment, probe, int8 shortlist, and float rerank from the
    embeddings table.  A wrong stored quantizer, a query path that
    silently falls back to the grid, or any stage of the composition
    drifting — all fail the hash."""
    from grower_spark.operators.ann_index import ann_index_ivf_rerank

    path = _ann_index_trained_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_ivf_rerank(
        spark, path, emb, q, m=ANN_RERANK_M, k=ANN_TOPK, n_probe=IVF_PROBE,
    )


def oracle_ann_index_trained() -> str:
    # The centroid artifact is read from the PUBLISHED
    # trained-current.parquet copy, which q_ann_index_trained (the
    # harness always runs the query side FIRST) atomically replaces
    # with the centroids of the index it just certified — the static
    # SQL string stays valid at any sf_dir, with no symlink (r16
    # ADVICE 3).  Everything except the centroid VALUES is re-derived
    # from the embeddings table; the ranking (ORDER BY d DESC, cell)
    # mirrors the Spark side's least(struct(-dot, idx)) argmax + sort.
    import os as _os

    base = _ann_aux_index_dir("/root/testdata/sf0.01", "trained")[0]
    cent_glob = _os.path.join(_os.path.dirname(base), _TRAINED_ALIAS)
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), fv AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec
  FROM embeddings e JOIN fullv USING (vec_id)
), cents AS (
  SELECT cell, centroid FROM read_parquet('{cent_glob}')
), scored AS (
  SELECT fv.vec_id, c.cell, list_dot_product(fv.vec, c.centroid) AS d
  FROM fv CROSS JOIN cents c
), rk AS (
  SELECT vec_id, list(cell ORDER BY d DESC, cell) AS cells
  FROM scored GROUP BY vec_id
), cw AS (SELECT vec_id, cells[1] AS cell FROM rk),
qp AS (
  SELECT vec_id AS qid, unnest(list_slice(cells, 1, {IVF_PROBE})) AS cell
  FROM rk WHERE vec_id < {N_ANN_QUERIES}
), cand AS (
  SELECT qp.qid, cw.vec_id
  FROM cw JOIN qp ON cw.cell = qp.cell AND cw.vec_id <> qp.qid
), dots AS (
  SELECT cand.qid, cand.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM cand
  JOIN cf ON cf.vec_id = cand.vec_id
  JOIN cf qs ON qs.vec_id = cand.qid AND qs.dim = cf.dim
  GROUP BY 1, 2
), shortlist AS (
  SELECT qid, vec_id FROM dots
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
          <= {ANN_RERANK_M}
), qv AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_ANN_QUERIES}
), rer AS (
  SELECT s.qid, s.vec_id,
    round(
      list_dot_product(v.qvec, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(v.qvec, v.qvec))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))),
      4) AS sim_r4
  FROM shortlist s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN qv v ON v.qid = s.qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id)
       AS INTEGER) AS rank,
  sim_r4
FROM rer QUALIFY rank <= {ANN_TOPK}
"""


OOV_QID_BASE = 10_000_000  # external panel ids, disjoint from vec_ids
OOV_SCALE = 1.25  # exact binary fraction: both engines compute it bitwise


def q_ann_index_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-corpus query panel over the prebuilt index (r15 'Next
    round' 6): external vectors — the corpus's first rows scaled by
    1.25 with qids offset past every vec_id — encoded against the
    STORED fit.  The scale pushes values beyond the per-dim corpus
    min/max, so the stored-fit encode must CLAMP query codes exactly
    like append batches do (one _clamp_codes definition on purpose);
    the disjoint ids prove the self-exclusion guard is a no-op for
    true external queries.  Previously pinned only by a hand-computed
    pytest (tests/test_r15_ops.py); this row certifies it against an
    independent SQL re-derivation with the same scaled panel."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    panel = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        (F.col("vec_id") + F.lit(OOV_QID_BASE)).cast("long").alias("qid"),
        F.transform(
            "embedding",
            lambda x: x.cast("double") * F.lit(OOV_SCALE),
        ).alias("qvec"),
    )
    return ann_index_int8_topk(spark, path, panel, k=ANN_TOPK)


def oracle_ann_index_oov() -> str:
    # corpus codes as in the one-shot oracle (in-range, no clamp);
    # panel codes from the SCALED vectors against the same fit WITH the
    # [0, 254] clamp — the stored-fit saturation contract.  1.25 is an
    # exact binary fraction, so (x*1.25)*1000 is the same double on
    # both engines before the shared floor(+0.5) milli-quantization.
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), pq AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {OOV_SCALE} * 1000
               + 0.5) AS BIGINT) AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
    AND vec_id < {N_ANN_QUERIES}
), pc AS (
  SELECT pq.vec_id + {OOV_QID_BASE} AS qid, pq.dim,
    greatest(CAST(0 AS BIGINT), least(CAST(254 AS BIGINT),
      CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
           ELSE ((pq.xq - f.mn) * 254) // (f.mx - f.mn) END)) - 127 AS cc
  FROM pq JOIN fit f USING (dim)
), fullq AS (
  SELECT qid FROM pc GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), qs AS (
  SELECT pc.* FROM pc JOIN fullq USING (qid)
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_compact_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the COMPACTED index (r16 verdict "Next
    round" 2): base build over vec_id % 3 != 0 (fit frozen there),
    append of the % 3 == 0 remainder (stored-fit encode, clamped
    codes), delete of vec_id % 7 == 1, then compact_ann_index — the
    tombstone fold WITHOUT refit.  End state: the stored fit is still
    the BASE-subset fit, the append's clamped codes are still clamped,
    and the deleted rows are physically gone — each property the
    oracle's hash checks independently (a refit, a re-encode, or a
    resurrected deletion all fail)."""
    from grower_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
        compact_ann_index,
        delete_from_ann_index,
        should_rebuild,
    )

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        build_ann_index(
            emb.where(F.col("vec_id") % 3 != 0), path, n_cells=IVF_CELLS,
            source=key,
        )
        append_ann_index(emb.where(F.col("vec_id") % 3 == 0), path)
        delete_from_ann_index(
            spark, path,
            emb.where(F.col("vec_id") % 7 == 1).select("vec_id"),
        )
        # gate through the production trigger with explicit thresholds
        # (deleted_frac ~14% here; clamp threshold parked above any
        # possible rate so ONLY the deletion trigger fires — the
        # action-selection logic itself is pinned in test_r17_ops.py)
        sig = should_rebuild(_read_params(path),
                             clamp_rate_threshold=1.1,
                             deleted_frac_threshold=0.05)
        assert sig["action"] == "compact", sig
        compact_ann_index(spark, path)

    return _ensure_aux_index(
        spark, sf_dir, "compact37",
        is_done=lambda p: (p.get("compactions") == 1
                           and not p.get("deletes")
                           and bool(p.get("appends"))),
        build=build,
    )


def _read_params(path: str) -> dict:
    from grower_spark.operators.index_meta import get_index_meta

    return get_index_meta().read_params(path)


def q_ann_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over a COMPACTED index
    (operators/ann_index.py::compact_ann_index): the index lived
    build → append (clamped, stored-fit) → delete, and then the
    deleted-fraction trigger's CHEAPER repair ran — a codes rewrite
    minus tombstones under the UNCHANGED stored fit, no float corpus
    touched (the r16 verdict's missing lifecycle step: rebuild was the
    only tombstone fold and it required floats that may be cold or
    gone).  The oracle derives the fit over the BASE subset only,
    clamps codes (the append saturation), and excludes the deleted
    rows from candidacy: if compaction had re-fit (it must not — that
    is rebuild's job), dropped append rows, or resurrected a deleted
    row, the hash fails.  Pinned equal to the pre-compaction
    tombstoned index in tests/test_r17_ops.py."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_compact_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def oracle_ann_index_compact() -> str:
    # oracle_ann_index_append's derivation (base-subset fit + clamp)
    # with ONE delta: candidates exclude the deleted subset (the
    # qs panel stays unrestricted — a deleted id may still QUERY, it
    # just cannot be a candidate), exactly as in oracle_ann_index_delete
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q
  WHERE vec_id % 3 <> 0 GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    greatest(CAST(0 AS BIGINT), least(CAST(254 AS BIGINT),
      CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
           ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END)) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), qs AS (
  SELECT vec_id AS qid, dim, cc FROM cf WHERE vec_id < {N_ANN_QUERIES}
), dots AS (
  SELECT qs.qid, cf.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM qs JOIN cf ON qs.dim = cf.dim AND cf.vec_id <> qs.qid
    AND cf.vec_id % 7 <> 1
  GROUP BY 1, 2
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
       AS INTEGER) AS rank,
  CAST(dot AS BIGINT) AS dot
FROM dots QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_trained_del_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the PRODUCTION-CONFIG index (r16 verdict
    "Next round" 7): a k-means-trained coarse quantizer AND live
    tombstones in the same index — previously ann_index_delete was
    flat-topk and ann_index_trained was deletion-free, so their
    composition (the config a real retrieval service runs) was never
    certified in one hash.  Build trains centroids on the full corpus,
    then vec_id % 7 == 1 retires; the centroids parquet is published
    for the oracle, the deletions stay relational (% 7)."""
    from grower_spark.operators.ann_index import (
        build_ann_index,
        delete_from_ann_index,
    )
    from grower_spark.operators.similarity import ivf_kmeans_centroids

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        cents = ivf_kmeans_centroids(emb, n_cells=IVF_CELLS, dim=EMB_DIM)
        build_ann_index(emb, path, n_cells=IVF_CELLS, centroids=cents,
                        source=key)
        delete_from_ann_index(
            spark, path,
            emb.where(F.col("vec_id") % 7 == 1).select("vec_id"),
        )

    path = _ensure_aux_index(
        spark, sf_dir, "trained-del7",
        is_done=lambda p: bool(p.get("deletes")), build=build,
    )
    _publish_trained_centroids(path, _TRAINED_DEL_ALIAS)
    return path


def q_ann_index_trained_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed three-stage retrieval under a TRAINED coarse
    quantizer WITH served tombstones — the production configuration
    end-to-end (r16 verdict "Next round" 7): IVF probe against k-means
    centroids (dynamic partition pruning must survive the tombstone
    anti-join, plan-pinned in tests/test_r16_ops.py), int8 shortlist,
    float rerank, with vec_id % 7 == 1 retired after the build.  The
    oracle reads the published centroids parquet (the one
    non-SQL-derivable artifact) AND applies the exclusion relationally
    — serving a deleted row under any of the three stages, or a wrong
    stored quantizer, fails the hash."""
    from grower_spark.operators.ann_index import ann_index_ivf_rerank

    path = _ann_index_trained_del_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_ivf_rerank(
        spark, path, emb, q, m=ANN_RERANK_M, k=ANN_TOPK, n_probe=IVF_PROBE,
    )


def oracle_ann_index_trained_delete() -> str:
    # oracle_ann_index_trained against this row's own published
    # centroids copy, with the deletion delta applied at the CANDIDATE
    # stage (cand), before the kernel — mirroring where the Spark side
    # anti-joins (after the probe join, before scoring).  A deleted id
    # may still appear as a query (qid 1 here) and in the cell ranking.
    import os as _os

    base = _ann_aux_index_dir("/root/testdata/sf0.01", "trained-del7")[0]
    cent_glob = _os.path.join(_os.path.dirname(base), _TRAINED_DEL_ALIAS)
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
    AND len(embedding) > 0
    AND len(list_filter(embedding, x -> x IS NULL)) = 0
), fit AS (
  SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1
), c AS (
  SELECT q.vec_id, q.dim,
    (CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
          ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END) - 127 AS cc
  FROM q JOIN fit f USING (dim)
), fullv AS (
  SELECT vec_id FROM c GROUP BY 1
  HAVING count(*) = (SELECT count(*) FROM fit)
), cf AS (
  SELECT c.* FROM c JOIN fullv USING (vec_id)
), fv AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec
  FROM embeddings e JOIN fullv USING (vec_id)
), cents AS (
  SELECT cell, centroid FROM read_parquet('{cent_glob}')
), scored AS (
  SELECT fv.vec_id, c.cell, list_dot_product(fv.vec, c.centroid) AS d
  FROM fv CROSS JOIN cents c
), rk AS (
  SELECT vec_id, list(cell ORDER BY d DESC, cell) AS cells
  FROM scored GROUP BY vec_id
), cw AS (SELECT vec_id, cells[1] AS cell FROM rk),
qp AS (
  SELECT vec_id AS qid, unnest(list_slice(cells, 1, {IVF_PROBE})) AS cell
  FROM rk WHERE vec_id < {N_ANN_QUERIES}
), cand AS (
  SELECT qp.qid, cw.vec_id
  FROM cw JOIN qp ON cw.cell = qp.cell AND cw.vec_id <> qp.qid
    AND cw.vec_id % 7 <> 1
), dots AS (
  SELECT cand.qid, cand.vec_id, SUM(qs.cc * cf.cc) AS dot
  FROM cand
  JOIN cf ON cf.vec_id = cand.vec_id
  JOIN cf qs ON qs.vec_id = cand.qid AND qs.dim = cf.dim
  GROUP BY 1, 2
), shortlist AS (
  SELECT qid, vec_id FROM dots
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id)
          <= {ANN_RERANK_M}
), qv AS (
  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
  FROM embeddings WHERE vec_id < {N_ANN_QUERIES}
), rer AS (
  SELECT s.qid, s.vec_id,
    round(
      list_dot_product(v.qvec, CAST(e.embedding AS DOUBLE[]))
      / (sqrt(list_dot_product(v.qvec, v.qvec))
         * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])))),
      4) AS sim_r4
  FROM shortlist s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN qv v ON v.qid = s.qid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(vec_id AS BIGINT) AS vec_id,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id)
       AS INTEGER) AS rank,
  sim_r4
FROM rer QUALIFY rank <= {ANN_TOPK}
"""


def _ann_index_stream_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once cache for the EPOCH-APPENDED index (r16 verdict
    "Next round" 3): base build over vec_id % 3 != 0, then the % 3 == 0
    remainder arrives as TWO exactly-once epochs (the
    append_stream_to_index protocol, driven directly for determinism)
    — with a crashed-first-attempt of epoch 1 simulated on disk before
    its append, and a full replay of epoch 1 after it.

    The crash simulation plants a duplicate codes file under epoch 1's
    deterministic file prefix (exactly what a kill between the staged
    move and the params commit leaves behind); the real epoch-1 append
    must SCRUB it before landing.  The replay must skip outright (the
    epoch is recorded).  If either leg fails, rows are double-indexed
    and the oracle hash fails — a duplicated vec_id surfaces twice in
    a top-k under consecutive ranks."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    from grower_spark.operators.ann_index import (
        append_ann_index,
        build_ann_index,
        codes_dir,
    )

    def build(path, key):
        emb = load_table(spark, sf_dir, "embeddings")
        rest = F.col("vec_id") % 3 == 0
        build_ann_index(
            emb.where(~rest), path, n_cells=IVF_CELLS, source=key,
        )
        ekey = "driver-stream-demo"
        r0 = append_ann_index(
            emb.where(rest & (F.col("vec_id") % 2 == 0)), path,
            epoch=(ekey, 0),
        )
        assert r0["rows"] > 0 and "skipped_epoch" not in r0, r0
        # crashed-attempt simulation: a prior epoch-1 try died mid-move
        # — duplicate one existing codes file under epoch 1's prefix
        # (same schema, same cell dir => duplicated rows if not scrubbed)
        import hashlib as _hashlib

        ehash = _hashlib.sha1(ekey.encode()).hexdigest()[:12]
        parts = sorted(_glob.glob(
            _os.path.join(codes_dir(path), "cell=*", "*.parquet")))
        src = parts[0]
        stale = _os.path.join(_os.path.dirname(src),
                              f"ep-{ehash}-1-stale.parquet")
        _shutil.copyfile(src, stale)
        r1 = append_ann_index(
            emb.where(rest & (F.col("vec_id") % 2 == 1)), path,
            epoch=(ekey, 1),
        )
        assert r1["rows"] > 0 and "skipped_epoch" not in r1, r1
        assert not _os.path.exists(stale), stale  # scrubbed
        # full replay of epoch 1: must skip, not double-index
        r1b = append_ann_index(
            emb.where(rest & (F.col("vec_id") % 2 == 1)), path,
            epoch=(ekey, 1),
        )
        assert r1b == {"rows": 0, "clamped_values": 0,
                       "skipped_epoch": True}, r1b

    return _ensure_aux_index(
        spark, sf_dir, "stream-epochs",
        is_done=lambda p: (bool(p.get("stream_epochs"))
                           and len(p.get("appends", [])) == 2),
        build=build,
    )


def q_ann_index_stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over an index grown by EXACTLY-ONCE epoch appends
    (operators/ann_index.py::append_ann_index with ``epoch=``, the
    protocol append_stream_to_index drives per micro-batch): the
    % 3 == 0 remainder arrived as two epochs, one of them preceded by
    a simulated crashed attempt (stale epoch-prefixed file planted in
    the codes dir) and followed by a full replay.  The oracle is the
    SAME independent derivation as ann_index_append — the two-epoch
    split and the replay must be invisible in the final state: a
    missed scrub or a replayed epoch double-indexes rows, and a
    duplicated vec_id surfaces twice in some top-k, failing the hash.
    The streaming wiring itself (foreachBatch -> epoch) is pinned by
    tests/test_r16_ops.py and the r17 failure-injection test."""
    from grower_spark.operators.ann_index import ann_index_int8_topk

    path = _ann_index_stream_path(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return ann_index_int8_topk(spark, path, q, k=ANN_TOPK)


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-distribution drift between two snapshot views
    (operators/diff.py): the corpus_diff release fixtures (old drops ids
    ending 7, new drops ids ending 3 and revises ids ending 1) scored by
    alpha-ratio permille, binned by centile-of-permille into 10 bins —
    per-bin shares + chi-square drift contributions."""
    from grower_spark.operators.diff import distribution_drift_bins

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    def scored(d: DataFrame) -> DataFrame:
        n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
        score = F.round(
            F.lit(1000.0) * n_alpha / F.greatest(F.length("text"), F.lit(1))
        ).cast("long")
        return d.select(score.alias("score"))

    old = scored(docs.where(F.col("doc_id") % 10 != 7))
    new = scored(
        docs.where(F.col("doc_id") % 10 != 3).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 1,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text")),
        )
    )
    return distribution_drift_bins(old, new, score_col="score",
                                   n_bins=10, bin_width=100)


def oracle_corpus_drift() -> str:
    return """
WITH olddocs AS (
  SELECT text FROM documents
  WHERE text IS NOT NULL AND doc_id % 10 <> 7
),
newdocs AS (
  SELECT CASE WHEN doc_id % 10 = 1 THEN text || ' [rev2]' ELSE text END
           AS text
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 <> 3
),
so AS (
  SELECT least(CAST(floor(CAST(round(
      1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      / greatest(length(text), 1)) AS BIGINT) / 100.0) AS BIGINT), 9)
    AS bin
  FROM olddocs
),
sn AS (
  SELECT least(CAST(floor(CAST(round(
      1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
      / greatest(length(text), 1)) AS BIGINT) / 100.0) AS BIGINT), 9)
    AS bin
  FROM newdocs
),
ho AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_old FROM so GROUP BY 1),
hn AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_new FROM sn GROUP BY 1),
tt AS (SELECT (SELECT sum(n_old) FROM ho) AS t_old,
              (SELECT sum(n_new) FROM hn) AS t_new)
SELECT CAST(bin AS BIGINT) AS bin,
  coalesce(n_old, 0) AS n_old,
  coalesce(n_new, 0) AS n_new,
  CAST(coalesce(n_old, 0) AS DOUBLE) / CAST(t_old AS DOUBLE) AS share_old,
  CAST(coalesce(n_new, 0) AS DOUBLE) / CAST(t_new AS DOUBLE) AS share_new,
  CASE WHEN coalesce(n_old, 0) > 0 THEN
    (CAST(coalesce(n_new, 0) AS DOUBLE) / CAST(t_new AS DOUBLE)
     - CAST(coalesce(n_old, 0) AS DOUBLE) / CAST(t_old AS DOUBLE))
    * (CAST(coalesce(n_new, 0) AS DOUBLE) / CAST(t_new AS DOUBLE)
       - CAST(coalesce(n_old, 0) AS DOUBLE) / CAST(t_old AS DOUBLE))
    / (CAST(coalesce(n_old, 0) AS DOUBLE) / CAST(t_old AS DOUBLE))
  END AS drift_contrib
FROM ho FULL OUTER JOIN hn USING (bin), tt
"""


def q_benchmark_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-integrity report (operators/decontam.py benchmark_leakage):
    per benchmark item, how many corpus documents share any of its
    n-grams and how many of its grams leak — the inverse direction of
    doc_decontaminate (same bench split: doc_id % 31 == 0, n=3), zeros
    included so clean items are visible."""
    from grower_spark.operators.decontam import benchmark_leakage

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD == 0)
    corpus = docs.where(F.col("doc_id") % DECONTAM_BENCH_MOD != 0)
    return benchmark_leakage(corpus, bench, n=DECONTAM_N)


def oracle_benchmark_leakage() -> str:
    n = DECONTAM_N
    gram_h = _DUCK_MD5_60.format(x="gram")
    return f"""
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w
               FROM documents WHERE text IS NOT NULL),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(w[i : i + {n - 1}], ' ') AS gram
  FROM (SELECT doc_id, w,
          unnest(range(1, greatest(len(w) - {n - 1}, 1) + 1)) AS i
        FROM words)
),
hashed AS (SELECT doc_id, {gram_h} AS gram_h FROM grams),
bg AS (SELECT doc_id AS bench_id, gram_h FROM hashed
       WHERE doc_id % {DECONTAM_BENCH_MOD} = 0),
cg AS (SELECT doc_id, gram_h FROM hashed
       WHERE doc_id % {DECONTAM_BENCH_MOD} <> 0),
hits AS (SELECT bench_id,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs_hit,
           CAST(count(DISTINCT gram_h) AS BIGINT) AS n_grams_hit
         FROM cg JOIN bg USING (gram_h) GROUP BY 1),
ids AS (SELECT DISTINCT doc_id AS bench_id FROM documents
        WHERE doc_id % {DECONTAM_BENCH_MOD} = 0 AND text IS NOT NULL)
SELECT ids.bench_id,
  coalesce(n_docs_hit, 0) AS n_docs_hit,
  coalesce(n_grams_hit, 0) AS n_grams_hit
FROM ids LEFT JOIN hits USING (bench_id)
"""


def q_doc_quality_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust quality outliers: median/MAD of the alpha-ratio
    permille score per source, with the cross-multiplied outlier count —
    the "which sources are shipping garbage batches" panel, reusing the
    certified robust_stats machinery (operators/robust.py) on documents
    instead of events.  Two bounded exact-median passes, zero-MAD groups
    flag nothing."""
    from grower_spark.operators.robust import robust_stats

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    score = F.round(
        F.lit(1000.0) * n_alpha / F.greatest(F.length("text"), F.lit(1))
    ).cast("long")
    # robust_stats makes three passes (median, deviations, count) over
    # its input: checkpoint the 2-column scored projection once so the
    # regex runs once, not per pass (the corpus_token_budget lesson)
    scored = docs.select("source", score.alias("q")).localCheckpoint(
        eager=True
    )
    return robust_stats(scored, "q", "source", z_cut=3.0)


def oracle_doc_quality_outliers() -> str:
    return """
WITH v AS (
  SELECT source,
    CAST(round(1000.0 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1)) AS BIGINT) AS v
  FROM documents WHERE text IS NOT NULL
),
m AS (SELECT source, quantile_cont(v, 0.5) AS med FROM v GROUP BY 1),
d AS (
  SELECT v.source, abs(v.v - m.med) AS ad, m.med
  FROM v JOIN m USING (source)
),
md AS (
  SELECT source, first(med) AS med, quantile_cont(ad, 0.5) AS mad
  FROM d GROUP BY 1
)
SELECT d.source,
  CAST(count(*) AS BIGINT) AS n,
  first(md.med) AS med,
  first(md.mad) AS mad,
  CAST(sum(CASE WHEN md.mad > 0 AND d.ad > 3.0 * md.mad THEN 1 ELSE 0 END)
    AS BIGINT) AS n_outliers
FROM d JOIN md USING (source)
GROUP BY 1
"""


def q_embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label robust outliers on the quantized squared norm — the
    O(n·d) embedding hygiene check (a broken encoder batch shows up as a
    norm cluster long before a density scan would find it; density is
    the O(n·panel) complement).  One zero-shuffle JVM fold per vector,
    then the same robust_stats machinery as doc_quality_outliers."""
    from grower_spark.operators.robust import robust_stats

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    xq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
    )
    nsq = F.aggregate(
        xq, F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    return robust_stats(
        emb.select("label", nsq.alias("nsq")), "nsq", "label", z_cut=3.0
    )


def oracle_embedding_norm_outliers() -> str:
    return """
WITH q AS (
  SELECT vec_id, label,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5) AS BIGINT)
      AS xq
  FROM embeddings WHERE embedding IS NOT NULL
),
v AS (SELECT label, CAST(sum(xq * xq) AS BIGINT) AS nsq
      FROM q GROUP BY label, vec_id),
m AS (SELECT label, quantile_cont(nsq, 0.5) AS med FROM v GROUP BY 1),
d AS (SELECT v.label, abs(v.nsq - m.med) AS ad, m.med
      FROM v JOIN m USING (label)),
md AS (SELECT label, first(med) AS med, quantile_cont(ad, 0.5) AS mad
       FROM d GROUP BY 1)
SELECT d.label,
  CAST(count(*) AS BIGINT) AS n,
  first(md.med) AS med,
  first(md.mad) AS mad,
  CAST(sum(CASE WHEN md.mad > 0 AND d.ad > 3.0 * md.mad THEN 1 ELSE 0 END)
    AS BIGINT) AS n_outliers
FROM d JOIN md USING (label)
GROUP BY 1
"""


# audit size is a PAIR BUDGET, not a fixed fraction (r10, promoted from
# SCALE.md's r9 note): permille = clamp(ceil(1000*budget/candidates), 1,
# 1000), so the verify cost is flat in duplicate density — on the small
# testdata (candidates <= budget) this degrades to audit-everything,
# and the x10 rehearsal leg pins the flat-at-budget regime
_LPA_PAIR_BUDGET = 200


def q_lsh_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH precision audit (operators/dedup.py lsh_precision_audit): a
    deterministic PAIR-BUDGET-sized sample of the MinHash-LSH candidate
    pairs, each verified with its exact shingle Jaccard in integer basis
    points — the evidence behind the num_perm/bands choice.  Verify cost
    is budget-bounded: the sample rate derives from the candidate count
    and the gram table is pruned to sampled ids before the intersection
    join."""
    from grower_spark.operators.dedup import lsh_precision_audit

    docs = load_table(spark, sf_dir, "documents")
    return lsh_precision_audit(
        docs, num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, hash_fn="md5",
        pair_budget=_LPA_PAIR_BUDGET,
    )


def oracle_lsh_precision() -> str:
    from grower_spark.operators.dedup import MINHASH_PRIME, minhash_perm_params

    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    params = minhash_perm_params(MINHASH_PERMS)
    base = "list_transform(sh, s -> " + _DUCK_MD5_60.format(x="s") + " % 1073741824)"
    sig_exprs = ", ".join(
        f"list_min(list_transform(bh, h -> (h * {a} + {b}) % {MINHASH_PRIME})) AS sig{p}"
        for p, (a, b) in enumerate(params)
    )
    band_exprs = ", ".join(
        "'" + str(b) + "_' || "
        + " || '_' || ".join(
            f"CAST(sig{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        for b in range(MINHASH_BANDS)
    )
    pair_key = "'lpa|' || CAST(id_a AS VARCHAR) || '_' || CAST(id_b AS VARCHAR)"
    pair_u = _DUCK_MD5_60.format(x=pair_key) + " % 1000"
    gram_h = _DUCK_MD5_60.format(x="g")
    return f"""
WITH shing AS (
  SELECT doc_id, {_duck_shingles()} AS sh FROM documents
),
based AS (
  SELECT doc_id, {base} AS bh FROM shing
),
sigs AS (
  SELECT doc_id, {sig_exprs} FROM based
),
buckets AS (
  SELECT doc_id, unnest([{band_exprs}]) AS bucket FROM sigs
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_bands
  FROM buckets a JOIN buckets b ON a.bucket = b.bucket
                                AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
sp AS (
  SELECT * FROM pairs
  WHERE {pair_u} < LEAST(1000, GREATEST(1,
    (1000 * {_LPA_PAIR_BUDGET} + (SELECT count(*) FROM pairs) - 1)
      // (SELECT count(*) FROM pairs)))
),
ga AS (
  SELECT doc_id, {gram_h} AS gh
  FROM (SELECT doc_id, unnest(sh) AS g FROM shing)
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ga GROUP BY 1),
inter AS (
  SELECT sp.id_a, sp.id_b, CAST(count(*) AS BIGINT) AS ni
  FROM sp JOIN ga a ON a.doc_id = sp.id_a
          JOIN ga b ON b.doc_id = sp.id_b AND b.gh = a.gh
  GROUP BY 1, 2
)
SELECT sp.id_a, sp.id_b, sp.n_bands,
  coalesce(ni, 0) AS n_inter,
  (sa.sz + sb.sz - coalesce(ni, 0)) AS n_union,
  (10000 * coalesce(ni, 0)) // (sa.sz + sb.sz - coalesce(ni, 0))
    AS jaccard_bp
FROM sp LEFT JOIN inter USING (id_a, id_b)
        JOIN sizes sa ON sa.doc_id = sp.id_a
        JOIN sizes sb ON sb.doc_id = sp.id_b
"""


def q_events_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence per type: exact p50/p90 of the gap (seconds)
    between a user's consecutive events of the same type — the
    engagement-rhythm panel behind notification timing and churn-risk
    heuristics.  One (user, type)-keyed window for the lag (same
    partitioning family as sessionize), then a bounded per-type
    percentile aggregation; integer microsecond gaps make the
    interpolated percentiles engine-exact (the exact_stats precedent)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts_ns div 1000")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_us")
    gaps = ev.withColumn("prev_us", F.lag("ts_us").over(w)).where(
        F.col("prev_us").isNotNull()
    ).select(
        "event_type", (F.col("ts_us") - F.col("prev_us")).alias("gap_us")
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.expr("percentile(gap_us, array(0.5D, 0.9D))").alias("_p"),
    ).select(
        "event_type", "n_gaps",
        F.floor(F.col("_p")[0] / 1000000).cast("long").alias("p50_s"),
        F.floor(F.col("_p")[1] / 1000000).cast("long").alias("p90_s"),
    )


def oracle_events_gap_stats() -> str:
    return """
WITH e AS (
  SELECT event_type, user_id,
    CAST(epoch_us(ts) AS BIGINT) AS ts_us
  FROM events
),
g AS (
  SELECT event_type,
    ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts_us) AS gap_us
  FROM e
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_gaps,
  CAST(floor(quantile_cont(gap_us, 0.5) / 1000000) AS BIGINT) AS p50_s,
  CAST(floor(quantile_cont(gap_us, 0.9) / 1000000) AS BIGINT) AS p90_s
FROM g WHERE gap_us IS NOT NULL
GROUP BY 1
"""


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-vs-detected language confusion matrix: groupBy over the
    certified stopword language_id — the mislabeled-metadata detector
    (a corpus whose `lang` column disagrees with its content poisons
    every per-language decision downstream: adaptive cuts, stopword
    quality checks, sampling mixes).  One map-side scoring pass + one
    bounded (langs × langs) aggregation."""
    from grower_spark.operators.text import language_id

    docs = load_table(spark, sf_dir, "documents")
    return (
        language_id(docs)
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def oracle_lang_confusion() -> str:
    # the same stopword-count CASE as oracle_text_lang_id, with the
    # declared lang threaded through and a (lang, lang_guess) rollup
    from grower_spark.operators.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    counts = ", ".join(
        "len(list_filter(string_split(text, ' '), t -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        + f"], t))) AS c_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"c_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN c_{lang} = {best} THEN '{lang}'" for lang in langs)
    return f"""
WITH counts AS (SELECT doc_id, lang, {counts} FROM documents),
guessed AS (SELECT doc_id, lang, CASE {case} END AS lang_guess FROM counts)
SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
FROM guessed GROUP BY 1, 2
"""


def q_doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-quality rules (operators/text.py gopher_rules —
    Rae et al. 2021 §A1.1) as one map-side expression pass: per-doc
    integer signals, the seven rule flags, and the combined pass bit.
    NULL-text rows are excluded on both sides (no rules to evaluate)."""
    from grower_spark.operators.text import gopher_rules

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    flags = [
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_alpha_words", "ok_stopwords", "ok_bullet_lines",
        "ok_ellipsis_lines",
    ]
    return gopher_rules(docs).select(
        "doc_id", "n_words", "mean_word_len", "symbol_bp", "alpha_word_bp",
        "n_stop_hits", "bullet_line_bp", "ellipsis_line_bp",
        *[F.col(f).cast("int").alias(f) for f in flags],
        "gopher_pass",
    )


def oracle_doc_gopher_rules() -> str:
    from grower_spark.operators.text import STOPWORDS_EN

    stop = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    return f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
    string_split(text, chr(10)) AS lines
  FROM documents WHERE text IS NOT NULL
),
sig AS (
  SELECT doc_id,
    len(toks) AS n_words,
    GREATEST(len(toks), 1) AS nw1,
    COALESCE(list_sum(list_transform(toks, t -> length(t))), 0) AS sum_len,
    length(text) - length(replace(text, '#', '')) AS n_hash,
    len(regexp_extract_all(text, '\\.\\.\\.|…')) AS n_ell,
    len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS n_alpha_w,
    len(list_filter(toks, t -> list_contains([{stop}], t))) AS n_stop_hits,
    GREATEST(len(lines), 1) AS n_lines,
    len(list_filter(lines, ln -> regexp_matches(ln, '^\\s*[-*•]')))
      AS n_bullet,
    len(list_filter(lines, ln -> regexp_matches(ln, '(\\.\\.\\.|…)\\s*$')))
      AS n_ell_end
  FROM base
),
m AS (
  SELECT doc_id,
    CAST(n_words AS BIGINT) AS n_words,
    CAST(sum_len // nw1 AS BIGINT) AS mean_word_len,
    CAST(((n_hash + n_ell) * 10000) // nw1 AS BIGINT) AS symbol_bp,
    CAST((n_alpha_w * 10000) // nw1 AS BIGINT) AS alpha_word_bp,
    CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
    CAST((n_bullet * 10000) // n_lines AS BIGINT) AS bullet_line_bp,
    CAST((n_ell_end * 10000) // n_lines AS BIGINT) AS ellipsis_line_bp
  FROM sig
)
SELECT *,
  CAST(ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
   AND ok_alpha_words AND ok_stopwords AND ok_bullet_lines
   AND ok_ellipsis_lines AS INTEGER) AS gopher_pass
FROM (
  SELECT *,
    CAST(n_words BETWEEN 5 AND 100000 AS INTEGER) AS ok_word_count,
    CAST(mean_word_len BETWEEN 3 AND 10 AS INTEGER) AS ok_mean_word_len,
    CAST(symbol_bp <= 1000 AS INTEGER) AS ok_symbol_ratio,
    CAST(alpha_word_bp >= 8000 AS INTEGER) AS ok_alpha_words,
    CAST(n_stop_hits >= 2 AS INTEGER) AS ok_stopwords,
    CAST(bullet_line_bp <= 9000 AS INTEGER) AS ok_bullet_lines,
    CAST(ellipsis_line_bp <= 3000 AS INTEGER) AS ok_ellipsis_lines
  FROM m
)
"""


HH_THRESHOLD_PERMILLE = 5
HH_K = 512


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries heavy hitters with exact verified output
    (operators/sketch.py): tokens holding >= 0.5% of all occurrences.
    The sketch only proposes candidates under bounded per-partial
    state; membership and counts come from an exact candidate-pruned
    pass, so the oracle is the naive unnest+count+HAVING."""
    from grower_spark.operators.sketch import mg_heavy_hitters

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    return mg_heavy_hitters(
        docs, threshold_permille=HH_THRESHOLD_PERMILLE, k=HH_K
    )


def oracle_token_heavy_hitters() -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT count(*) AS n FROM toks)
SELECT token,
  CAST(count(*) AS BIGINT) AS n_occurrences,
  CAST((count(*) * 10000) // (SELECT GREATEST(n, 1) FROM tot) AS BIGINT)
    AS share_bp
FROM toks GROUP BY token
HAVING count(*) * 1000 >= {HH_THRESHOLD_PERMILLE} * (SELECT n FROM tot)
"""


SPLIT_TRAIN_PERMILLE = 800


def q_events_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/test split audit with user-leakage measurement
    (operators/sampling.py time_split_leakage): cut at 80% of the event
    stream's time span, report split sizes and the users with events on
    BOTH sides — the silent eval contaminator of temporal splits."""
    from grower_spark.operators.sampling import time_split_leakage

    ev = load_table(spark, sf_dir, "events")
    return time_split_leakage(ev, train_permille=SPLIT_TRAIN_PERMILLE)


def oracle_events_split_leakage() -> str:
    p = SPLIT_TRAIN_PERMILLE
    return f"""
WITH b AS (
  SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo,
         CAST(epoch_us(max(ts)) AS BIGINT) AS hi
  FROM events
),
c AS (SELECT lo + ((hi - lo) * {p}) // 1000 AS cut FROM b),
pu AS (
  SELECT user_id,
    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1,
    count(*) FILTER (WHERE epoch_us(ts) < (SELECT cut FROM c)) AS n_tr,
    count(*) FILTER (WHERE epoch_us(ts) >= (SELECT cut FROM c)) AS n_te
  FROM events GROUP BY 1
)
SELECT
  CAST((SELECT cut FROM c) AS BIGINT) AS cutoff_us,
  CAST(sum(n_tr) AS BIGINT) AS n_train_events,
  CAST(sum(n_te) AS BIGINT) AS n_test_events,
  CAST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)) AS BIGINT)
    AS n_train_users,
  CAST(count(*) FILTER (WHERE t1 >= (SELECT cut FROM c)) AS BIGINT)
    AS n_test_users,
  CAST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)
                          AND t1 >= (SELECT cut FROM c)) AS BIGINT)
    AS n_leaked_users,
  CAST((count(*) FILTER (WHERE t0 < (SELECT cut FROM c)
                           AND t1 >= (SELECT cut FROM c)) * 10000)
       // GREATEST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)), 1)
       AS BIGINT) AS leaked_bp
FROM pu
"""


def q_lang_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-fertility panel (operators/text.py
    fertility_stats): docs, tokens/doc and chars/token x100 — the
    context-window cost comparison across languages."""
    from grower_spark.operators.text import fertility_stats

    docs = load_table(spark, sf_dir, "documents")
    return fertility_stats(docs)


def oracle_lang_fertility() -> str:
    return """
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
  CAST((sum(len(string_split(text, ' '))) * 100)
       // GREATEST(count(*), 1) AS BIGINT) AS tokens_per_doc_x100,
  CAST((sum(length(text)) * 100)
       // GREATEST(sum(len(string_split(text, ' '))), 1) AS BIGINT)
    AS chars_per_token_x100
FROM documents WHERE text IS NOT NULL
GROUP BY lang
"""


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size histogram — the dedup governance rollup
    (how much duplication, in what clump sizes): duplicate_clusters over
    the certified ngram-jaccard pair graph, then two model-sized
    aggregations (cluster -> size, size -> count)."""
    from grower_spark.operators.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs,
    )

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(
        docs, shingle_n=SHINGLE_N, threshold=JACCARD_THRESHOLD,
        max_shingle_df=JACCARD_MAX_DF,
    )
    clusters = duplicate_clusters(pairs, backend="star")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    ).select(F.col("cluster_size").cast("long").alias("cluster_size"),
             "n_clusters")


def oracle_dedup_cluster_sizes() -> str:
    return f"""
WITH cl AS ({oracle_dedup_clusters()}),
sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
  CAST(count(*) AS BIGINT) AS n_clusters
FROM sz GROUP BY cluster_size
"""


PREFIX_DEDUP_TOKENS = 8


def q_dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-token template dedup (operators/dedup.py prefix_dedup):
    docs sharing their first 8 whitespace tokens group together — the
    form-letter/template catcher exact dedup and Jaccard both miss.
    Per-doc audit with group size and the keep decision."""
    from grower_spark.operators.dedup import prefix_dedup

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    return prefix_dedup(docs, n_tokens=PREFIX_DEDUP_TOKENS)


def oracle_dedup_prefix() -> str:
    n = PREFIX_DEDUP_TOKENS
    ph = _DUCK_MD5_60.format(
        x=f"array_to_string(string_split(text, ' ')[1:{n}], ' ')"
    )
    return f"""
WITH keyed AS (
  SELECT doc_id, {ph} AS prefix_h60
  FROM documents WHERE text IS NOT NULL
),
grp AS (
  SELECT prefix_h60, min(doc_id) AS keep_id, count(*) AS n
  FROM keyed GROUP BY 1 HAVING count(*) >= 2
)
SELECT k.doc_id, k.prefix_h60,
  CAST(COALESCE(g.n, 1) AS BIGINT) AS n_same_prefix,
  CAST(CASE WHEN g.keep_id IS NULL OR g.keep_id = k.doc_id
       THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM keyed k LEFT JOIN grp g USING (prefix_h60)
"""


def q_doc_fineweb_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/FineWeb heuristic filter panel (operators/text.py
    fineweb_filters): sentence stats, numeric/uppercase token shares,
    the C4 verbatim flags, intra-doc duplicate-line and terminal-
    punctuation line shares — one map-side pass."""
    from grower_spark.operators.text import fineweb_filters

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    return fineweb_filters(docs).select(
        "doc_id", "n_sentences", "words_per_sentence_x100",
        "numeric_word_bp", "upper_word_bp", "has_lorem", "has_curly",
        "dup_line_bp", "terminal_punct_line_bp",
    )


def oracle_doc_fineweb_filters() -> str:
    return """
WITH base AS (
  SELECT doc_id, text,
    string_split(text, ' ') AS toks,
    list_filter(string_split_regex(text, '[.!?]'),
                s -> length(trim(s)) > 0) AS sents,
    string_split(text, chr(10)) AS lines
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST(len(sents) AS BIGINT) AS n_sentences,
  CAST((len(toks) * 100) // GREATEST(len(sents), 1) AS BIGINT)
    AS words_per_sentence_x100,
  CAST((len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$'))) * 10000)
       // GREATEST(len(toks), 1) AS BIGINT) AS numeric_word_bp,
  CAST((len(list_filter(toks, t -> regexp_matches(t, '^[A-Z]{2,}$'))) * 10000)
       // GREATEST(len(toks), 1) AS BIGINT) AS upper_word_bp,
  CAST(contains(lower(text), 'lorem ipsum') AS INTEGER) AS has_lorem,
  CAST(contains(text, '{') AS INTEGER) AS has_curly,
  CAST(((len(lines) - len(list_distinct(lines))) * 10000)
       // GREATEST(len(lines), 1) AS BIGINT) AS dup_line_bp,
  CAST((len(list_filter(lines, ln -> regexp_matches(ln, '[.!?]\\s*$')))
        * 10000) // GREATEST(len(lines), 1) AS BIGINT)
    AS terminal_punct_line_bp
FROM base
"""


def q_source_dedup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication governance rollup: how much of each
    source's volume is exact-duplicate content (docs whose full-text
    60-bit hash occurs >= 2 times corpus-wide).  The table that tells a
    curation pipeline WHICH feed is rotten.  One narrow hash shuffle on
    the content hash feeding a window count (the duplicate-group table
    scales with the corpus on duplicate-dense feeds, so no broadcast —
    same fix as prefix_dedup), one source rollup."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    from pyspark.sql import Window

    from grower_spark.functions.hashing import md5_60

    keyed = docs.select("doc_id", "source", md5_60(F.col("text")).alias("h"))
    wh = Window.partitionBy("h")
    return (
        keyed.withColumn(
            "_is_dup",
            F.when(F.count(F.lit(1)).over(wh) >= 2, 1).otherwise(0),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_is_dup").cast("long").alias("n_exact_dup_docs"),
        )
        .select(
            "source", "n_docs", "n_exact_dup_docs",
            (F.col("n_exact_dup_docs") * 10000
             / F.greatest(F.col("n_docs"), F.lit(1)))
            .cast("long").alias("exact_dup_bp"),
        )
    )


def oracle_source_dedup_rates() -> str:
    h = _DUCK_MD5_60.format(x="text")
    return f"""
WITH keyed AS (
  SELECT doc_id, source, {h} AS h
  FROM documents WHERE text IS NOT NULL
),
dup AS (SELECT h FROM keyed GROUP BY h HAVING count(*) >= 2)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE h IN (SELECT h FROM dup)) AS BIGINT)
    AS n_exact_dup_docs,
  CAST((count(*) FILTER (WHERE h IN (SELECT h FROM dup)) * 10000)
       // GREATEST(count(*), 1) AS BIGINT) AS exact_dup_bp
FROM keyed GROUP BY source
"""


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram with power-of-two buckets (bucket = bit
    length of the token count — integer-exact in both engines, no
    float log2): the sequence-length profile that sizes context-window
    packing and flags truncation risk.  One map-side bucket expression +
    one bounded aggregation (<= 64 buckets)."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    n_tok = F.size(F.split(F.col("text"), " "))
    bucket = F.length(F.conv(n_tok.cast("string"), 10, 2))
    return (
        docs.select(bucket.cast("long").alias("len_bucket"),
                    n_tok.alias("_n"))
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
    )


def oracle_doc_length_histogram() -> str:
    return """
WITH t AS (
  SELECT len(string_split(text, ' ')) AS n
  FROM documents WHERE text IS NOT NULL
)
SELECT CAST(length(printf('%b', n)) AS BIGINT) AS len_bucket,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS n_tokens
FROM t GROUP BY 1
"""


def q_source_pii_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure governance rollup over the same
    deterministic PII-augmented text as the certified pii_redact row:
    docs with any PII hit per 10k, and total hits — the table that
    routes a feed to the redaction pipeline.  One map-side regex pass +
    one source-keyed aggregation."""
    from grower_spark.operators.pii import pii_signals

    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents")).where(
        F.col("text").isNotNull()
    )
    synth = docs.withColumn(
        "pii_text", F.expr(_PII_SYNTH_SQL.format(s="string"))
    )
    sig = pii_signals(synth, text_col="pii_text")
    return (
        sig.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("long")).cast("long")
            .alias("n_docs_with_pii"),
            F.sum("n_pii").cast("long").alias("n_pii_hits"),
        )
        .select(
            "source", "n_docs", "n_docs_with_pii", "n_pii_hits",
            (F.col("n_docs_with_pii") * 10000
             / F.greatest(F.col("n_docs"), F.lit(1)))
            .cast("long").alias("pii_doc_bp"),
        )
    )


def oracle_source_pii_rates() -> str:
    from grower_spark.operators.pii import PII_PATTERNS

    synth = _PII_SYNTH_SQL.format(s="VARCHAR")
    total = " + ".join(
        f"len(regexp_extract_all(pii_text, '{pat}'))"
        for pat in PII_PATTERNS.values()
    )
    return f"""
WITH synth AS (
  SELECT doc_id, source, {synth} AS pii_text
  FROM documents WHERE text IS NOT NULL
),
sig AS (SELECT source, ({total}) AS n_pii FROM synth)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(*) FILTER (WHERE n_pii > 0) AS BIGINT) AS n_docs_with_pii,
  CAST(sum(n_pii) AS BIGINT) AS n_pii_hits,
  CAST((count(*) FILTER (WHERE n_pii > 0) * 10000)
       // GREATEST(count(*), 1) AS BIGINT) AS pii_doc_bp
FROM sig GROUP BY source
"""


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type burstiness (operators/anomaly.py rate_fano): the Fano
    factor of per-minute event counts in integer x100 fixed point —
    Poisson-steady ~100, bursty/bot traffic far above."""
    from grower_spark.operators.anomaly import rate_fano

    ev = load_table(spark, sf_dir, "events")
    return rate_fano(ev, bucket_secs=60)


def oracle_events_burstiness() -> str:
    return """
WITH pb AS (
  SELECT event_type, epoch_us(ts) // 60000000 AS b, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(c) AS BIGINT) AS n_events,
  CAST(((count(*) * sum(c * c) - sum(c) * sum(c)) * 100)
       // (count(*) * sum(c)) AS BIGINT) AS fano_x100
FROM pb GROUP BY event_type
"""


def q_user_type_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity histogram: distinct event types per
    (user, day), rolled to (n_types, n_user_days) — single-type
    user-days at volume are the classic bot signature; the daily grain
    keeps the histogram discriminative on active users (lifetime
    distinct saturates at the type alphabet).  Two model-sized
    aggregations (the first is a user x day x type distinct,
    map-combinable)."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) div 86400000000L")
    per_ud = ev.groupBy("user_id", day.alias("_day")).agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return per_ud.groupBy("n_types").agg(
        F.count(F.lit(1)).cast("long").alias("n_user_days")
    ).select(F.col("n_types").cast("long").alias("n_types"), "n_user_days")


def oracle_user_type_diversity() -> str:
    return """
WITH pu AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
    count(DISTINCT event_type) AS n_types
  FROM events GROUP BY 1, 2
)
SELECT CAST(n_types AS BIGINT) AS n_types,
  CAST(count(*) AS BIGINT) AS n_user_days
FROM pu GROUP BY n_types
"""


CHURN_RECENT_PERMILLE = 800


def q_events_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type churn across the stream's last 20% of time span: users
    active in a type before the cut who never touch it after — the
    engagement-decay read per product surface.  One (type, user)
    min/max aggregation; the cut is a plan literal from two scalar
    bounds."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    b = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    cut = lo + ((hi - lo) * CHURN_RECENT_PERMILLE) // 1000
    pu = ev.groupBy("event_type", "user_id").agg(
        F.min(us).alias("_t0"), F.max(us).alias("_t1")
    )
    before = F.col("_t0") < cut
    after = F.col("_t1") >= cut
    return pu.groupBy("event_type").agg(
        F.sum(before.cast("long")).cast("long").alias("n_users_before"),
        F.sum(after.cast("long")).cast("long").alias("n_users_after"),
        F.sum((before & ~after).cast("long")).cast("long")
        .alias("n_churned"),
    ).select(
        "event_type", "n_users_before", "n_users_after", "n_churned",
        (F.col("n_churned") * 10000
         / F.greatest(F.col("n_users_before"), F.lit(1)))
        .cast("long").alias("churn_bp"),
    )


def oracle_events_churn() -> str:
    p = CHURN_RECENT_PERMILLE
    return f"""
WITH b AS (
  SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo,
         CAST(epoch_us(max(ts)) AS BIGINT) AS hi
  FROM events
),
c AS (SELECT lo + ((hi - lo) * {p}) // 1000 AS cut FROM b),
pu AS (
  SELECT event_type, user_id,
    min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
  FROM events GROUP BY 1, 2
)
SELECT event_type,
  CAST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)) AS BIGINT)
    AS n_users_before,
  CAST(count(*) FILTER (WHERE t1 >= (SELECT cut FROM c)) AS BIGINT)
    AS n_users_after,
  CAST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)
                          AND NOT t1 >= (SELECT cut FROM c)) AS BIGINT)
    AS n_churned,
  CAST((count(*) FILTER (WHERE t0 < (SELECT cut FROM c)
                           AND NOT t1 >= (SELECT cut FROM c)) * 10000)
       // GREATEST(count(*) FILTER (WHERE t0 < (SELECT cut FROM c)), 1)
       AS BIGINT) AS churn_bp
FROM pu GROUP BY event_type
"""


DRIFT_GATE_BASELINE_PERMILLE = 500


def q_streaming_drift_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND driver-certified streaming path (the funnel replay
    covers applyInPandasWithState; this covers the WINDOWED STATEFUL
    AGGREGATION): the events stream replayed as a bounded time-ordered
    parquet sequence through ``streaming_drift_bins`` — each
    watermark-closed ingestion hour scored against an offline-fit
    baseline distribution — to completion.  A far-future sentinel closes
    every real window, so the result is batch-expressible and the
    oracle is the per-(window, bin) share/chi-square re-derivation in
    SQL.  Baseline = the score distribution of the stream's first half
    (fit epoch), score = floor(value*10) into 10 width-100 bins.

    Output per closed hour x bin (all 10 bins — the r10 vanished-class
    contract): ``(win_start_s, bin, n_new, share_new, drift_contrib)``.
    """
    import os
    import shutil
    from glob import glob

    from grower_spark.streaming.stateful import streaming_drift_bins

    wm_s, n_slices = 3600, 3
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    ).select(
        "ts", F.floor(F.col("value") * 10).cast("long").alias("score")
    )
    us = F.unix_micros("ts")
    b = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
    lo, hi = int(b["lo"]), int(b["hi"])
    mid = lo + ((hi - lo) * DRIFT_GATE_BASELINE_PERMILLE) // 1000

    # offline fit: the first half's bin shares (same bin arithmetic as
    # the operator: least(floor(score/100), 9)).  The reference total is
    # the SUM of the histogram counts (identical integer to the previous
    # separate ref.count() pass, same division), computed by a window
    # over the <=10 histogram rows — one events scan instead of two.
    # The baseline is then localCheckpoint-ed (10 rows): a batch side
    # joined into a stream is re-executed per micro-batch, so without
    # the materialization every replay batch re-ran the events scan +
    # groupBy just to rebuild this model-sized table (guide §2.4/§5).
    bin_col = F.least(F.floor(F.col("score") / 100).cast("long"), F.lit(9))
    ref = ev.where(us < mid).select(bin_col.alias("bin"))
    ref_hist = ref.groupBy("bin").agg(F.count(F.lit(1)).alias("_n"))
    baseline = ref_hist.select(
        "bin",
        (
            F.col("_n")
            / F.greatest(
                F.sum("_n").over(Window.partitionBy()).cast("double"),
                F.lit(1.0),
            )
        ).alias("share_old"),
    ).localCheckpoint()

    base = "/tmp/grower_driftgate_{}_{}".format(
        spark.sparkContext.applicationId.replace("-", "_"),
        os.path.basename(os.path.abspath(sf_dir)),
    )
    replay, staging = os.path.join(base, "replay"), os.path.join(base, "stage")
    if len(glob(os.path.join(replay, "*", "*.parquet"))) < n_slices + 1:
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(replay)
        span = max(hi - lo + 1, 1)
        sl = F.least(
            F.floor(((us - F.lit(lo)) * n_slices) / F.lit(span)),
            F.lit(n_slices - 1),
        )
        for i in range(n_slices):
            ev.where(sl == i).coalesce(1).write.mode("overwrite").parquet(
                staging
            )
            os.makedirs(os.path.join(replay, f"{i:03d}"))
            shutil.move(
                glob(os.path.join(staging, "part-*"))[0],
                os.path.join(replay, f"{i:03d}", "part.parquet"),
            )
        # sentinel: watermark(sentinel) = sentinel - wm_s > hi + window,
        # closing every real hour window
        sent_us = hi + (3600 + wm_s + 3600) * 1_000_000
        spark.createDataFrame(
            [(sent_us,)], "sent_us long"
        ).select(
            F.timestamp_micros(F.col("sent_us")).alias("ts"),
            F.lit(0).cast("long").alias("score"),
        ).coalesce(1).write.mode("overwrite").parquet(staging)
        os.makedirs(os.path.join(replay, f"{n_slices:03d}"))
        shutil.move(
            glob(os.path.join(staging, "part-*"))[0],
            os.path.join(replay, f"{n_slices:03d}", "part.parquet"),
        )
        t0 = 1_000_000_000
        for i, d in enumerate(sorted(glob(os.path.join(replay, "*")))):
            for p in glob(os.path.join(d, "*.parquet")):
                os.utime(p, (t0 + i, t0 + i))

    stream = (
        spark.readStream.schema("ts timestamp, score long")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(replay, "*"))
    )
    out = streaming_drift_bins(
        stream, baseline, score_col="score", ts_col="ts",
        window="1 hour", watermark=f"{wm_s} seconds",
    )
    _REPLAY_SEQ[0] += 1
    name = f"sdg_replay_{_REPLAY_SEQ[0]}"
    # same scale-adaptive state sizing as the funnel replay: partitions
    # from input bytes, conf scoped to the stream and restored after
    from grower_spark.session import stream_state_partitions

    rbytes = sum(
        os.path.getsize(p)
        for p in glob(os.path.join(replay, "*", "*.parquet"))
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(stream_state_partitions(spark, rbytes)),
    )
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(base, f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        if q.exception() is not None:
            raise q.exception()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return (
        spark.table(name)
        .where(F.unix_micros("win_start") <= hi)  # drop the sentinel window
        .select(
            (F.unix_micros("win_start") / 1_000_000).cast("long")
            .alias("win_start_s"),
            F.col("bin").cast("long").alias("bin"),
            F.col("n_new").cast("long").alias("n_new"),
            "share_new",
            "drift_contrib",
        )
    )


def oracle_streaming_drift_gate() -> str:
    p = DRIFT_GATE_BASELINE_PERMILLE
    return f"""
WITH ev AS (
  SELECT ts, CAST(floor(value * 10) AS BIGINT) AS score,
    CAST(epoch_us(ts) AS BIGINT) AS us
  FROM events WHERE value IS NOT NULL
),
b AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
c AS (SELECT lo + ((hi - lo) * {p}) // 1000 AS mid FROM b),
binned AS (
  SELECT us, LEAST(score // 100, 9) AS bin,
    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_s
  FROM ev
),
ref AS (SELECT bin FROM binned WHERE us < (SELECT mid FROM c)),
baseline AS (
  SELECT bin,
    count(*) / CAST(GREATEST((SELECT count(*) FROM ref), 1) AS DOUBLE)
      AS share_old
  FROM ref GROUP BY bin
),
wins AS (
  SELECT win_start_s, count(*) AS tn FROM binned GROUP BY 1
),
pc AS (
  SELECT win_start_s, bin, count(*) AS n FROM binned GROUP BY 1, 2
),
cells AS (
  SELECT w.win_start_s, g.bin, w.tn, COALESCE(pc.n, 0) AS n_new
  FROM wins w
  CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) g
  LEFT JOIN pc ON pc.win_start_s = w.win_start_s AND pc.bin = g.bin
)
SELECT win_start_s, CAST(bin AS BIGINT) AS bin,
  CAST(n_new AS BIGINT) AS n_new,
  n_new / CAST(tn AS DOUBLE) AS share_new,
  CASE WHEN share_old > 0 THEN
    (n_new / CAST(tn AS DOUBLE) - share_old)
    * (n_new / CAST(tn AS DOUBLE) - share_old) / share_old
  END AS drift_contrib
FROM cells LEFT JOIN baseline USING (bin)
"""


CBF_KEEP_PERMILLE = 700
CBF_MAX_TOP_WORD_BP = 4000


# Cleaned-pool memo shared by the two composed-build rows (r12 verdict
# item 6): both rows run the IDENTICAL cleaning pipeline (same flags),
# so per process the pipeline runs once — corpus_build_full reads the
# drop ledger, corpus_build_mixture applies the mixture stage over the
# kept pool.  Certification strength is unchanged: both DuckDB oracles
# still re-derive the entire composed pipeline from the raw table, and
# the shared pool is exactly the build's own output (localCheckpointed,
# so re-invocations within a bench process reuse materialized blocks
# instead of re-running O(pipeline) per composed row).  Keyed by
# applicationId so a fresh session rebuilds.
_CB_POOL_MEMO: dict = {}


def _cb_cleaned_pool(spark: SparkSession, sf_dir: str):
    """Returns (kept, drops): kept = (doc_id, lang) of docs surviving the
    corpus_build_full cleaning flags; drops = the cleaning drop ledger."""
    from tools.corpus_build import build_corpus

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CB_POOL_MEMO:
        docs = load_table(spark, sf_dir, "documents").where(
            F.col("text").isNotNull()
        )
        corpus, drops, _ = build_corpus(
            spark, docs,
            keep_best=True,
            adaptive_quality_group="source",
            adaptive_keep_permille=CBF_KEEP_PERMILLE,
            max_top_word_bp=CBF_MAX_TOP_WORD_BP,
            num_perm=MINHASH_PERMS, bands=MINHASH_BANDS,
            min_shared_bands=2,
            collect_report=False,
            # checkpoint (not cache) the scored fan-out point: truncated
            # lineage means no downstream build stage can re-derive the
            # quality-signal regexes from the raw scan — at 100 TB a
            # cache miss would re-run a full regex pass per stage (r13
            # verdict item 4; the plan audit's regex x16 was this
            # lineage re-inlined across every pre-barrier segment)
            materialize="checkpoint",
        )
        kept = corpus.select("doc_id", "lang").localCheckpoint(eager=True)
        drops_ck = drops.localCheckpoint(eager=True)
        spark.catalog.clearCache()  # release build stage caches
        _CB_POOL_MEMO[key] = (kept, drops_ck)
    return _CB_POOL_MEMO[key]


def q_corpus_build_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build (tools/corpus_build.py build_corpus) as
    ONE certified composition — the r10-verdict ask: prove the stages
    compose under a single oracle, not just individually.  Flags match
    the production invocation: ``--keep-best`` (canonical = quality
    argmax in both dedup stages) and ``--adaptive-quality-group source``
    (per-source adaptive quality floor, top 700 permille by the fine
    quality-majors/alpha-minors score).  Stages actually exercised, in
    build order: adaptive quality gate -> repetition filter
    (top_word_bp > 4000) -> normalize -> exact dedup (quality argmax)
    -> MinHash-LSH pairs (md5, 16 perm / 4 bands, >= 2 shared) ->
    connected components -> keep-best -> FFD packing (assignment only,
    drops nothing).

    Surface: the per-source GOVERNANCE rollup — input volume, each
    stage's drop count, kept docs and kept token volume.  The oracle
    re-derives the entire composed pipeline in SQL (adaptive-cutoff
    histogram, repetition counts, normalize + md5-60 exact groups,
    the full MinHash signature/band algebra, a recursive-CTE closure,
    and the same quality-argmax keep decisions).

    Scale notes: every stage is the already-audited operator (no new
    plan shapes); the oracle ignores build_keep_drop's degenerate-
    bucket cap (max_bucket_width=2000) — no sf0.01/sf0.1 bucket comes
    near it (the cap exists for adversarial corpora).  The row
    localCheckpoints its output then drops the build's stage caches so
    repeated bench invocations don't accumulate cached blocks.  r13: the
    pipeline run is shared with corpus_build_mixture through
    ``_cb_cleaned_pool`` (one build per process; this row reads the drop
    ledger) — the oracle still re-derives everything from raw."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    _, drops = _cb_cleaned_pool(spark, sf_dir)
    base = docs.select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).alias("_nt"),
    )
    gov = governance_rollup(base, drops)
    return gov.localCheckpoint(eager=True)


def governance_rollup(base: DataFrame, drops: DataFrame,
                      reasons: tuple = ("quality", "repetition", "exact",
                                        "near-dup")) -> DataFrame:
    """Per-source governance rollup over a build's drop ledger: input
    volume, per-reason drop counts, kept docs and kept token volume.
    ``base`` is ``(doc_id, source, _nt)``; ``drops`` is the build's
    ``(doc_id, reason)``.

    Drop counts use ``count(when(...))`` — NOT ``sum(cast(...))`` — so a
    source whose docs were ALL kept reports 0, matching the oracle's
    ``count(*) FILTER``; ``sum`` over a group whose every ``reason`` is
    NULL has no non-null inputs and returns NULL (r11 advice item 1;
    regression-pinned in tests/test_r12_ops.py)."""
    lab = base.join(drops, "doc_id", "left")
    is_r = lambda r: F.count(  # noqa: E731
        F.when(F.col("reason") == r, 1)
    )
    return lab.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        *[
            is_r(r).cast("long").alias("n_drop_" + r.replace("-", "_"))
            for r in reasons
        ],
        F.sum(F.col("reason").isNull().cast("int")).cast("long")
        .alias("n_kept"),
        F.sum(F.when(F.col("reason").isNull(), F.col("_nt")).otherwise(0))
        .cast("long").alias("kept_tokens"),
    )


def _oracle_cbf_ctes() -> str:
    # the composed pipeline re-derived stage by stage; fragments shared
    # with oracle_quality_adaptive (cutoff histogram),
    # oracle_text_repetition (top-word counts), oracle_text_normalize,
    # oracle_dedup_minhash_lsh (signature/band algebra) and
    # oracle_dedup_keep_best (recursive closure + quality argmax).
    # Returns the CTE body (everything through ``all_drops``) so
    # oracle_corpus_build_full (governance rollup) and
    # oracle_corpus_build_mixture (mixture schedule over the kept set)
    # certify the SAME pipeline derivation.
    from grower_spark.operators.dedup import MINHASH_PRIME, minhash_perm_params

    rows_per_band = MINHASH_PERMS // MINHASH_BANDS
    params = minhash_perm_params(MINHASH_PERMS)
    base_h = (
        "list_transform(sh, s -> "
        + _DUCK_MD5_60.format(x="s")
        + " % 1073741824)"
    )
    sig_exprs = ", ".join(
        f"list_min(list_transform(bh, h -> (h * {a} + {b})"
        f" % {MINHASH_PRIME})) AS sig{p}"
        for p, (a, b) in enumerate(params)
    )
    band_exprs = ", ".join(
        "'" + str(b) + "_' || "
        + " || '_' || ".join(
            f"CAST(sig{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        )
        for b in range(MINHASH_BANDS)
    )
    norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    h60_norm = _DUCK_MD5_60.format(x="text_norm")
    return f"""q0 AS (
  SELECT doc_id, source, lang, text,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
    {_duck_quality_score()} AS qs,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    greatest(length(text), 1) AS n_chars1
  FROM documents WHERE text IS NOT NULL
),
fine AS (
  SELECT *, qs * 1000 + least(
      CAST(round(round(n_alpha / CAST(n_chars1 AS DOUBLE), 4) * 1000)
           AS BIGINT), 999) AS fq
  FROM q0
),
hist AS (SELECT source, fq, count(*) AS n FROM fine GROUP BY 1, 2),
ranked AS (
  SELECT source, fq, n,
    sum(n) OVER (PARTITION BY source ORDER BY fq DESC) AS cum_top,
    sum(n) OVER (PARTITION BY source) AS total
  FROM hist
),
cuts AS (
  SELECT source, max(fq) AS cutoff FROM ranked
  WHERE cum_top * 1000 >= {CBF_KEEP_PERMILLE} * total GROUP BY 1
),
drop_q AS (
  SELECT f.doc_id FROM fine f JOIN cuts c
  ON f.source IS NOT DISTINCT FROM c.source
  WHERE f.fq < c.cutoff
),
pool1 AS (
  SELECT * FROM fine WHERE doc_id NOT IN (SELECT doc_id FROM drop_q)
),
words AS (SELECT doc_id, string_split(text, ' ') AS w FROM pool1),
wcnt AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(w) AS gram FROM words) GROUP BY 1, 2
),
rep AS (
  SELECT doc_id, (max(c) * 10000) // sum(c) AS top_word_bp
  FROM wcnt GROUP BY 1
),
drop_r AS (
  SELECT doc_id FROM rep WHERE top_word_bp > {CBF_MAX_TOP_WORD_BP}
),
pool2 AS (
  SELECT doc_id, source, text, n_tok, qs, {norm} AS text_norm
  FROM pool1 WHERE doc_id NOT IN (SELECT doc_id FROM drop_r)
),
keyed AS (SELECT doc_id, qs, {h60_norm} AS h60, text_norm FROM pool2),
exact_keep AS (
  SELECT doc_id, h60, text_norm,
    row_number() OVER (PARTITION BY h60
                       ORDER BY qs DESC, doc_id) AS rn
  FROM keyed
),
drop_e AS (SELECT doc_id FROM exact_keep WHERE rn > 1),
s1 AS (SELECT doc_id, text_norm FROM exact_keep WHERE rn = 1),
shing AS (SELECT doc_id, {_duck_shingles("text_norm")} AS sh FROM s1),
based AS (SELECT doc_id, {base_h} AS bh FROM shing),
sigs AS (SELECT doc_id, {sig_exprs} FROM based),
buckets AS (SELECT doc_id, unnest([{band_exprs}]) AS bucket FROM sigs),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b AS a, id_a AS b FROM pairs),
reach(n, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n
),
cl AS (SELECT n AS doc_id, min(r) AS cluster_id FROM reach GROUP BY n),
near_keep AS (
  SELECT cl.doc_id,
    row_number() OVER (PARTITION BY cl.cluster_id
                       ORDER BY k.qs DESC, cl.doc_id) AS rn
  FROM cl JOIN keyed k USING (doc_id)
),
drop_n AS (SELECT doc_id FROM near_keep WHERE rn > 1),
all_drops AS (
  SELECT doc_id, 'quality' AS reason FROM drop_q
  UNION ALL SELECT doc_id, 'repetition' FROM drop_r
  UNION ALL SELECT doc_id, 'exact' FROM drop_e
  UNION ALL SELECT doc_id, 'near-dup' FROM drop_n
)"""


def oracle_corpus_build_full() -> str:
    return f"""
WITH RECURSIVE {_oracle_cbf_ctes()}
SELECT q.source,
  CAST(count(*) AS BIGINT) AS n_input,
  CAST(count(*) FILTER (WHERE d.reason = 'quality') AS BIGINT)
    AS n_drop_quality,
  CAST(count(*) FILTER (WHERE d.reason = 'repetition') AS BIGINT)
    AS n_drop_repetition,
  CAST(count(*) FILTER (WHERE d.reason = 'exact') AS BIGINT)
    AS n_drop_exact,
  CAST(count(*) FILTER (WHERE d.reason = 'near-dup') AS BIGINT)
    AS n_drop_near_dup,
  CAST(count(*) FILTER (WHERE d.reason IS NULL) AS BIGINT) AS n_kept,
  CAST(COALESCE(sum(q.n_tok) FILTER (WHERE d.reason IS NULL), 0)
       AS BIGINT) AS kept_tokens
FROM q0 q LEFT JOIN all_drops d USING (doc_id)
GROUP BY q.source
"""


_CBM_TARGET_ROWS = 300


def q_corpus_build_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus build WITH the temperature-mixture stage
    executed (tools/corpus_build.py ``--mixture-group lang
    --mixture-target-rows N``) — the r11 verdict's remaining composition
    ask: ``corpus_build_full`` certifies the cleaning stages compose;
    this row certifies the MIXING schedule composes with them, fitted
    over the CLEANED pool (not the raw corpus) and materialized through
    the same epoch-explode the training pipeline consumes.

    Surface: per-language mixture governance off the BUILD OUTPUT —
    materialized row volume (replicas included), distinct surviving
    docs, the deepest epoch index, and the auditable ``mixture-cut``
    drop count.  The target (300) sits below the cleaned pool size so
    BOTH regimes certify at once: the dominant language is hash-permille
    down-sampled (cuts > 0, epoch 0 only) while small languages
    up-sample past one full epoch (max_epoch >= 1).

    The oracle re-derives the ENTIRE composed pipeline (shared
    ``_oracle_cbf_ctes`` — adaptive quality histogram, repetition,
    normalize + exact argmax, MinHash band algebra, recursive-CTE
    closure, keep-best) and then the integer-exact mixture algebra
    (isqrt Newton clamp, DIV/mod epoch split, md5 hash-permille with the
    build's ``corpus-mix`` salt) over that kept set.

    r13 (r12 verdict item 6): the cleaning pipeline is shared with
    corpus_build_full through ``_cb_cleaned_pool`` — this row applies
    the build's EXACT mixture stage (tools/corpus_build.py:268-284:
    assign copies with the build's ``corpus-mix`` salt, mixture-cut
    ledger, epoch explode) over the once-built kept pool instead of
    re-running O(pipeline); the oracle is untouched and still
    re-derives cleaning + mixture from the raw table."""
    from grower_spark.operators.sampling import (
        mixture_assign_copies,
        mixture_epochs,
    )

    kept, _ = _cb_cleaned_pool(spark, sf_dir)
    assigned = mixture_assign_copies(
        kept, "lang", _CBM_TARGET_ROWS, key_col="doc_id",
        salt="corpus-mix",
    )
    mat = (
        assigned.withColumn(
            "epoch", F.explode(mixture_epochs(F.col("_n_copies")))
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_materialized"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.max("epoch").cast("long").alias("max_epoch"),
        )
    )
    cut = (
        assigned.where(F.col("_n_copies") < 1)
        .groupBy(F.col("lang").alias("_cl"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_mixture_cut"))
    )
    return (
        mat.join(cut, F.col("lang").eqNullSafe(F.col("_cl")), "left")
        .drop("_cl")
        .na.fill({"n_mixture_cut": 0})
        .localCheckpoint(eager=True)
    )


def oracle_corpus_build_mixture() -> str:
    pm = ("CAST(('0x' || substr(md5('corpus-mix|' || CAST(doc_id AS "
          "VARCHAR)), 1, 15)) AS BIGINT) % 1000")
    return f"""
WITH RECURSIVE {_oracle_cbf_ctes()},
kept AS (
  SELECT q.doc_id, q.lang FROM q0 q LEFT JOIN all_drops d USING (doc_id)
  WHERE d.reason IS NULL
),
mc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_total FROM kept GROUP BY 1),
mg AS (SELECT lang, n_total,
         CAST(floor(sqrt(CAST(n_total AS DOUBLE))) AS BIGINT) AS gg FROM mc),
mw AS (SELECT lang, n_total,
         CASE WHEN gg * gg > n_total THEN gg - 1
              WHEN (gg + 1) * (gg + 1) <= n_total THEN gg + 1
              ELSE gg END AS weight
       FROM mg),
mt AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM mw),
mp AS (SELECT lang, n_total, weight,
         ({_CBM_TARGET_ROWS} * weight) // w_total AS target_rows
       FROM mw, mt),
mq AS (SELECT lang, target_rows // n_total AS full_epochs,
         (1000 * (target_rows % n_total)) // n_total AS partial_permille
       FROM mp),
md AS (
  SELECT k.doc_id, k.lang, mq.full_epochs
    + (CASE WHEN {pm} < mq.partial_permille THEN 1 ELSE 0 END) AS n_copies
  FROM kept k JOIN mq USING (lang)
)
SELECT lang,
  CAST(sum(n_copies) AS BIGINT) AS n_materialized,
  CAST(count(*) FILTER (WHERE n_copies >= 1) AS BIGINT) AS n_docs,
  CAST(max(n_copies) - 1 AS BIGINT) AS max_epoch,
  CAST(count(*) FILTER (WHERE n_copies = 0) AS BIGINT) AS n_mixture_cut
FROM md GROUP BY lang HAVING sum(n_copies) >= 1
"""


_MIXTURE_TARGET_ROWS = 2000


def q_source_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture plan (operators/sampling.py::
    mixture_plan): the per-language sampling/repeat schedule that
    rebalances corpus shares toward sqrt(n_lang) — up-weighting the small
    languages relative to dominant English, the published GPT-3/LLaMA
    pretraining-mixture move.  Integer-exact end to end (isqrt via a
    Newton-clamped float sqrt, DIV/mod splits into full epochs + a
    hash-permille partial epoch), so the schedule is reproducible on any
    engine.  ONE corpus pass into a bounded (lang × permille) histogram;
    everything after is model-sized."""
    from grower_spark.operators.sampling import mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    return mixture_plan(
        docs, "lang", _MIXTURE_TARGET_ROWS, key_col="doc_id", salt="mixplan"
    )


def oracle_source_mixture_plan() -> str:
    return f"""
WITH h AS (
  SELECT lang,
    CAST(('0x' || substr(md5('mixplan|' || CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) % 1000 AS pm,
    count(*) AS n_pm
  FROM documents GROUP BY 1, 2
),
c AS (SELECT lang, CAST(sum(n_pm) AS BIGINT) AS n_total FROM h GROUP BY 1),
g AS (SELECT lang, n_total,
        CAST(floor(sqrt(CAST(n_total AS DOUBLE))) AS BIGINT) AS gg FROM c),
w AS (SELECT lang, n_total,
        CASE WHEN gg * gg > n_total THEN gg - 1
             WHEN (gg + 1) * (gg + 1) <= n_total THEN gg + 1
             ELSE gg END AS weight
      FROM g),
t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM w),
p AS (SELECT lang, n_total, weight,
        ({_MIXTURE_TARGET_ROWS} * weight) // w_total AS target_rows
      FROM w, t),
q AS (SELECT *, target_rows // n_total AS full_epochs,
        (1000 * (target_rows % n_total)) // n_total AS partial_permille
      FROM p),
kk AS (
  SELECT h.lang,
    CAST(sum(CASE WHEN h.pm < q.partial_permille THEN h.n_pm ELSE 0 END)
         AS BIGINT) AS n_kept_partial
  FROM h JOIN q USING (lang) GROUP BY 1
)
SELECT q.lang, q.n_total, q.weight, q.target_rows, q.full_epochs,
  q.partial_permille,
  coalesce(kk.n_kept_partial, 0) AS n_kept_partial,
  q.full_epochs * q.n_total + coalesce(kk.n_kept_partial, 0) AS planned_rows
FROM q LEFT JOIN kk USING (lang)
"""


def q_ann_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negative_topk):
    per query vector, the top-k most-cosine-similar corpus vectors with a
    DIFFERENT label — the near-boundary negatives a contrastive encoder
    fine-tune trains on.  Same bounded-broadcast-panel scan contract as
    the other ANN rows (corpus passed once map-side, never shuffled on a
    data key); the label filter is a per-pair null-safe inequality."""
    from grower_spark.operators.similarity import hard_negative_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    return hard_negative_topk(emb, q, k=ANN_TOPK)


def oracle_ann_hard_negatives() -> str:
    return f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec
           FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlabel, vec AS qvec
      FROM v WHERE vec_id < {N_ANN_QUERIES}),
cand AS (
  SELECT q.qid, c.vec_id, c.label,
    round(list_dot_product(q.qvec, c.vec)
      / (sqrt(list_dot_product(q.qvec, q.qvec))
         * sqrt(list_dot_product(c.vec, c.vec))), 4) AS sim_r4
  FROM v c JOIN q
    ON c.vec_id <> q.qid AND c.label IS DISTINCT FROM q.qlabel
)
SELECT qid, vec_id, label,
  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim_r4 DESC, vec_id)
       AS INTEGER) AS rank,
  sim_r4
FROM cand
QUALIFY rank <= {ANN_TOPK}
"""


_WINNOW_K = 3
_WINNOW_WINDOW = 4
_WINNOW_MIN_SHARED = 2
_WINNOW_MAX_DF = 1000


def q_dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing near-dup pairs (operators/dedup.py::winnowing_pairs):
    MOSS window-min fingerprints (Schleimer et al., SIGMOD 2003) — any
    shared token run of >= window+k-1 tokens yields an identical
    fingerprint in both docs, so moved/quoted blocks surface as pairs
    that whole-doc hashing misses and Jaccard dilutes.  One doc-keyed
    window shuffle to select fingerprints, then the shared posting-list
    pair emit with the stop-fingerprint df cap."""
    from grower_spark.operators.dedup import winnowing_pairs

    docs = load_table(spark, sf_dir, "documents")
    return winnowing_pairs(
        docs,
        k=_WINNOW_K,
        window=_WINNOW_WINDOW,
        min_shared=_WINNOW_MIN_SHARED,
        max_fp_df=_WINNOW_MAX_DF,
    )


def oracle_dedup_winnowing() -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
kg AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
    substr(md5(array_to_string(
      list_slice(toks, i, i + {_WINNOW_K - 1}), ' ')), 1, 15) AS h
  FROM t, LATERAL unnest(generate_series(1, len(toks) - {_WINNOW_K - 1}))
       AS g(i)
),
w AS (
  SELECT doc_id, pos,
    min(h || lpad(CAST(pos AS VARCHAR), 8, '0')) OVER (
      PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN CURRENT ROW AND {_WINNOW_WINDOW - 1} FOLLOWING) AS mk,
    count(*) OVER (PARTITION BY doc_id) AS nkg
  FROM kg
),
f AS (
  SELECT DISTINCT doc_id,
    CAST(('0x' || substr(mk, 1, 15)) AS BIGINT) AS fp
  FROM w WHERE pos <= greatest(nkg - {_WINNOW_WINDOW - 1}, 1)
),
sz AS (SELECT doc_id, count(*) AS n_fp FROM f GROUP BY 1),
d AS (SELECT fp FROM f GROUP BY fp
      HAVING count(*) BETWEEN 2 AND {_WINNOW_MAX_DF}),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM f a JOIN d ON a.fp = d.fp JOIN f b ON b.fp = d.fp
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared,
  CAST(sa.n_fp AS BIGINT) AS n_a, CAST(sb.n_fp AS BIGINT) AS n_b
FROM p JOIN sz sa ON sa.doc_id = p.id_a JOIN sz sb ON sb.doc_id = p.id_b
WHERE n_shared >= {_WINNOW_MIN_SHARED}
"""


def q_mixture_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture plan EXECUTED (operators/sampling.py::
    mixture_materialize): every kept document with its 0-based epoch
    index — up-sampled languages repeat, the over-represented one is
    hash-permille cut — totalling exactly the plan's planned_rows.  The
    schedule compiles to when-chain literals (one bounded model-sized
    collect), so materialization is a PURE MAP-SIDE explode: no join, no
    broadcast, zero shuffles."""
    from grower_spark.operators.sampling import mixture_materialize

    docs = load_table(spark, sf_dir, "documents")
    return mixture_materialize(
        docs, "lang", _MIXTURE_TARGET_ROWS, key_col="doc_id", salt="mixplan"
    ).select("doc_id", "lang", F.col("epoch").cast("int").alias("epoch"))


def oracle_mixture_materialize() -> str:
    return f"""
WITH h AS (
  SELECT lang,
    CAST(('0x' || substr(md5('mixplan|' || CAST(doc_id AS VARCHAR)), 1, 15))
         AS BIGINT) % 1000 AS pm,
    count(*) AS n_pm
  FROM documents GROUP BY 1, 2
),
c AS (SELECT lang, CAST(sum(n_pm) AS BIGINT) AS n_total FROM h GROUP BY 1),
g AS (SELECT lang, n_total,
        CAST(floor(sqrt(CAST(n_total AS DOUBLE))) AS BIGINT) AS gg FROM c),
w AS (SELECT lang, n_total,
        CASE WHEN gg * gg > n_total THEN gg - 1
             WHEN (gg + 1) * (gg + 1) <= n_total THEN gg + 1
             ELSE gg END AS weight
      FROM g),
t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM w),
p AS (SELECT lang, n_total, weight,
        ({_MIXTURE_TARGET_ROWS} * weight) // w_total AS target_rows
      FROM w, t),
q AS (SELECT lang, target_rows // n_total AS full_epochs,
        (1000 * (target_rows % n_total)) // n_total AS partial_permille
      FROM p),
d AS (
  SELECT doc_id, documents.lang, q.full_epochs
    + (CASE WHEN CAST(('0x' || substr(md5('mixplan|'
         || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
       < q.partial_permille THEN 1 ELSE 0 END) AS n_copies
  FROM documents JOIN q USING (lang)
)
SELECT doc_id, lang, CAST(e AS INTEGER) AS epoch
FROM d, LATERAL unnest(generate_series(0, n_copies - 1)) AS gs(e)
WHERE n_copies >= 1
"""


_EDITDIST_MAX_PERMILLE = 50


def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-verified near-dups (operators/dedup.py::
    edit_distance_pairs): MinHash-LSH candidates scored with exact
    Levenshtein, kept when the distance is <= 50 per-mille of the longer
    text — the character-level verdict that separates typo-level edits
    from real revisions.  The quadratic metric only touches the banded
    candidate set; integer permille arithmetic end to end."""
    from grower_spark.operators.dedup import edit_distance_pairs

    docs = load_table(spark, sf_dir, "documents")
    return edit_distance_pairs(
        docs,
        max_dist_permille=_EDITDIST_MAX_PERMILLE,
        num_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        hash_fn="md5",
    )


def oracle_dedup_edit_distance() -> str:
    base = oracle_dedup_minhash_lsh()
    return f"""
WITH mh AS ({base})
SELECT p.id_a, p.id_b,
  CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
  CAST(length(a.text) AS BIGINT) AS len_a,
  CAST(length(b.text) AS BIGINT) AS len_b,
  1000 - (1000 * levenshtein(a.text, b.text))
       // greatest(length(a.text), length(b.text), 1) AS sim_permille
FROM mh p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
WHERE 1000 - (1000 * levenshtein(a.text, b.text))
       // greatest(length(a.text), length(b.text), 1)
      >= {1000 - _EDITDIST_MAX_PERMILLE}
"""


def q_dedup_editdist_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dups over GENUINELY MULTI-BYTE text — the r12
    verdict's item 7: the operator documents that Spark's ``levenshtein``
    counts Unicode CODEPOINTS (the correct semantics for multilingual
    corpora) while DuckDB's counts BYTES, but the driver fixtures are
    pure ASCII so that claim was asserted, never certified.  This row
    accent-translates the corpus (``translate(text, 'aeio', 'àéîö')`` —
    a per-codepoint bijection, so every distance is provably unchanged)
    and runs the FULL production operator (MinHash-LSH candidates +
    capped 3-arg Levenshtein) over text where byte != codepoint on ~4 in
    10 characters.  The oracle re-derives LSH over the same accented CTE
    (md5 hashes the UTF-8 bytes identically in both engines) and
    computes the distance through a codepoint-preserving shim —
    inverse-translating both sides back to ASCII, where DuckDB's
    byte-Levenshtein IS the codepoint distance.  Without the shim the
    engines genuinely diverge (pinned in tests/test_r13_ops.py: one
    'é'->'x' edit scores codepoint distance 1 in the operator, byte
    distance 2 in raw DuckDB), so a value-hash match here certifies the
    documented codepoint semantics end to end."""
    from grower_spark.operators.dedup import edit_distance_pairs

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.translate(F.col("text"), "aeio", "àéîö").alias("text")
    )
    return edit_distance_pairs(
        docs,
        max_dist_permille=_EDITDIST_MAX_PERMILLE,
        num_perm=MINHASH_PERMS,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        hash_fn="md5",
    )


def oracle_dedup_editdist_unicode() -> str:
    import re as _re

    base = oracle_dedup_edit_distance()
    # codepoint shim: DuckDB levenshtein counts bytes, so score on the
    # inverse-translated (pure-ASCII) twins where bytes == codepoints;
    # the accent translation is a codepoint bijection, so distances are
    # identical.  length() in DuckDB is already codepoint-based, so
    # len_a/len_b/sim_permille stay computed on the accented text.
    shim = base.replace(
        "levenshtein(a.text, b.text)",
        "levenshtein(translate(a.text, 'àéîö', 'aeio'), "
        "translate(b.text, 'àéîö', 'aeio'))",
    )
    # run the whole derivation over the accented corpus
    shim = _re.sub(r"\bdocuments\b", "udocs", shim)
    assert shim.lstrip().startswith("WITH mh AS"), shim[:40]
    return shim.replace(
        "WITH mh AS",
        "WITH udocs AS (SELECT * REPLACE "
        "(translate(text, 'aeio', 'àéîö') AS text) FROM documents),\n"
        "mh AS",
        1,
    )


# ---------------------------------------------------------------------------
# Registries (driver contract)
# ---------------------------------------------------------------------------

# Registry order matters: the driver's correctness gate hashes only the
# FIRST 50 rows of queries() against their DuckDB oracles each round.
# Window layout (r17; sections are 1-8 / 9-11 / 12-15 / 16-18 / 19-50 —
# exactly 50, AST-checked for duplicate keys in tests):
#   1-8   : the §2 core surface (seven nginx_* rows + syslog_extract) —
#           always in-window so the reference-parity queries stay
#           certified.
#   9-11  : must-certify — the CHANGED-LINEAGE index trio the r16
#           verdict ordered into the lead ("What's wrong" 3 / "Next
#           round" 1): the r16 tombstone refactor changed
#           _load_index/both query operators' plans but none of these
#           sat in the r16 window — ann_index_int8,
#           ann_ivf_int8_rerank, ann_index_append.
#   12-15 : the r16 debuts RE-CERTIFIED — this round's refactor
#           (versioned codes generations, metadata seam, semi-joined
#           deletes) changed their lineage too, so by the same
#           changed-lineage rule they stay in-window instead of
#           rotating out: ann_index_delete, ann_index_rebuild,
#           ann_index_trained, ann_index_oov.
#   16-18 : r17 debuts — ann_index_compact (tombstone fold under the
#           STORED fit, no floats — r16 "Next round" 2; oracle =
#           base-fit + clamp + exclusion, so a refit, dropped append
#           rows, or a resurrected deletion all fail);
#           ann_index_trained_delete (the production config: k-means
#           coarse quantizer WITH served tombstones — r16 "Next
#           round" 7; oracle reads the published centroids AND applies
#           the exclusion); ann_index_stream_append (exactly-once
#           epoch appends with a simulated crashed attempt and a full
#           replay — r16 "Next round" 3; oracle is the ann_index_append
#           derivation, so any double-indexing fails the hash).
#   19-50 : staleness rotation — the 32-row head of the stalest tail
#           (the r12/r13-certified remainder): events_sliding_window
#           through corpus_drift.
#   51+   : stalest-first — the remaining r13/r14-certified rows, the
#           r15 leftovers, then the rows displaced from the r16 window
#           (freshest) — all covered every round by the committed
#           CORRECTNESS_LOCAL_r{N}.json full-registry artifact.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # --- 1-8: §2 core, keep certified every round ---
    "nginx_parse_agg": q_nginx_parse_agg,
    "nginx_parse_rows": q_nginx_parse_rows,
    "nginx_deadletter": q_nginx_deadletter,
    "nginx_parse_json": q_nginx_parse_json,
    "nginx_custom_casts": q_nginx_custom_casts,
    "nginx_error_rate": q_nginx_error_rate,
    "nginx_latency_percentiles": q_nginx_latency_percentiles,
    "syslog_extract": q_syslog_extract,
    # --- 9-11: r17 must-certify — the changed-lineage index trio
    # (see the layout comment above) ---
    "ann_index_int8": q_ann_index_int8,
    "ann_ivf_int8_rerank": q_ann_ivf_int8_rerank,
    "ann_index_append": q_ann_index_append,
    # --- 12-15: r16 debuts, re-certified (lineage changed again by
    # the r17 versioned-generation/metadata-seam refactor) ---
    "ann_index_delete": q_ann_index_delete,
    "ann_index_rebuild": q_ann_index_rebuild,
    "ann_index_trained": q_ann_index_trained,
    "ann_index_oov": q_ann_index_oov,
    # --- 16-18: r17 debuts — compact / trained×delete / exactly-once
    # epoch append ---
    "ann_index_compact": q_ann_index_compact,
    "ann_index_trained_delete": q_ann_index_trained_delete,
    "ann_index_stream_append": q_ann_index_stream_append,
    # --- 19-50: staleness rotation — the 32-row stalest head
    # (events_sliding_window through corpus_drift) ---
    "events_sliding_window": q_events_sliding_window,
    "events_rollup": q_events_rollup,
    "events_topk_per_user": q_events_topk_per_user,
    "dedup_editdist_unicode": q_dedup_editdist_unicode,
    "mixture_materialize": q_mixture_materialize,
    "events_exact_stats": q_events_exact_stats,
    "events_sketches": q_events_sketches,
    "text_stats": q_text_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "embedding_neardup": q_embedding_neardup,
    "dedup_simhash": q_dedup_simhash,
    "dedup_keep_best": q_dedup_keep_best,
    "nb_lang_score": q_nb_lang_score,
    "corpus_report": q_corpus_report,
    "multimodal_decode_meta": q_multimodal_decode_meta,
    "multimodal_decode_mp4": q_multimodal_decode_mp4,
    "cluster_split": q_cluster_split,
    "nginx_session_funnel": q_nginx_session_funnel,
    "corpus_token_budget": q_corpus_token_budget,
    "events_hourly_baseline": q_events_hourly_baseline,
    "nginx_top_clients": q_nginx_top_clients,
    "nginx_ip_prefix": q_nginx_ip_prefix,
    "events_lifecycle": q_events_lifecycle,
    "events_value_deciles": q_events_value_deciles,
    "doc_containment": q_doc_containment,
    "corpus_diff": q_corpus_diff,
    "sample_weighted": q_sample_weighted,
    "quality_adaptive": q_quality_adaptive,
    "embedding_diversity": q_embedding_diversity,
    "term_affinity": q_term_affinity,
    "embedding_dim_stats": q_embedding_dim_stats,
    "corpus_drift": q_corpus_drift,
    # --- 51+: stalest-first remainder; the r16 window's displaced
    # rows (freshest) close the list — all covered every round by the
    # committed CORRECTNESS_LOCAL_r{N}.json full-registry artifact ---
    "benchmark_leakage": q_benchmark_leakage,
    "lang_confusion": q_lang_confusion,
    "events_gap_stats": q_events_gap_stats,
    "doc_quality_outliers": q_doc_quality_outliers,
    "embedding_norm_outliers": q_embedding_norm_outliers,
    "tpch_q1": q_tpch_q1,
    "tpch_q2": q_tpch_q2,
    "ann_hard_negatives": q_ann_hard_negatives,
    "doc_bm25": q_doc_bm25,
    "kmeans_representatives": q_kmeans_representatives,
    "corpus_build_mixture": q_corpus_build_mixture,
    "corpus_build_full": q_corpus_build_full,
    "tpch_q3": q_tpch_q3,
    "tpch_q4": q_tpch_q4,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "events_range_join": q_events_range_join,
    "salted_join_events": q_salted_join_events,
    "text_lang_id": q_text_lang_id,
    "dedup_paragraphs": q_dedup_paragraphs,
    "text_bpe_tokens": q_text_bpe_tokens,
    "text_normalize": q_text_normalize,
    "multimodal_pipeline": q_multimodal_pipeline,
    "pack_documents": q_pack_documents,
    "chunk_documents": q_chunk_documents,
    "doc_rolling_hash61": q_doc_rolling_hash61,
    "json_fields": q_json_fields,
    "scalar_funcs": q_scalar_funcs,
    "doc_decontaminate": q_doc_decontaminate,
    "events_sample_stratified": q_events_sample_stratified,
    "text_repetition": q_text_repetition,
    "multimodal_decode_png": q_multimodal_decode_png,
    "multimodal_decode_wav": q_multimodal_decode_wav,
    "semantic_decontam_bcast": q_semantic_decontam_bcast,
    "lm_perplexity": q_lm_perplexity,
    "dsir_weights": q_dsir_weights,
    "multimodal_fused": q_multimodal_fused,
    "bigram_lm_perplexity": q_bigram_lm_perplexity,
    "dedup_prefix": q_dedup_prefix,
    "cluster_balanced_sample": q_cluster_balanced_sample,
    "source_dedup_rates": q_source_dedup_rates,
    "events_burstiness": q_events_burstiness,
    "source_mixture_plan": q_source_mixture_plan,
    "dedup_winnowing": q_dedup_winnowing,
    "salted_agg_users": q_salted_agg_users,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "ann_cosine_topk_np": q_ann_cosine_topk_np,
    "ann_lsh": q_ann_lsh,
    "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
    "semdedup": q_semdedup,
    "pii_redact": q_pii_redact,
    "corpus_vocab": q_corpus_vocab,
    "tokenize_ids": q_tokenize_ids,
    "shard_shuffle": q_shard_shuffle,
    "dedup_minhash_incremental": q_dedup_minhash_incremental,
    "events_outliers": q_events_outliers,
    "source_mix": q_source_mix,
    "semantic_decontam": q_semantic_decontam,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "lm_tail_keep": q_lm_tail_keep,
    "dedup_substring": q_dedup_substring,
    "events_transitions": q_events_transitions,
    "events_winsorized": q_events_winsorized,
    "events_robust_stats": q_events_robust_stats,
    "events_cusum": q_events_cusum,
    "bigram_lm_score_join": q_bigram_lm_score_join,
    "events_session_funnel": q_events_session_funnel,
    "source_overlap": q_source_overlap,
    "embedding_kmeans": q_embedding_kmeans,
    "doc_novelty": q_doc_novelty,
    "doc_top_terms": q_doc_top_terms,
    "events_top_paths": q_events_top_paths,
    "dedup_edit_distance": q_dedup_edit_distance,
    "ann_int8_topk": q_ann_int8_topk,
    "ann_ivf_int8": q_ann_ivf_int8,
    "ann_int8_rerank": q_ann_int8_rerank,
    "embedding_quantize_int8": q_embedding_quantize_int8,
    "events_funnel_timing": q_events_funnel_timing,
    "events_dau_wau": q_events_dau_wau,
    "ann_ivf": q_ann_ivf,
    "events_asof_join": q_events_asof_join,
    "streaming_session_funnel": q_streaming_session_funnel,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "lsh_precision": q_lsh_precision,
    "embedding_density": q_embedding_density,
    "sample_exact_k": q_sample_exact_k,
    "doc_gopher_rules": q_doc_gopher_rules,
    "token_heavy_hitters": q_token_heavy_hitters,
    "events_split_leakage": q_events_split_leakage,
    "lang_fertility": q_lang_fertility,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
    "doc_fineweb_filters": q_doc_fineweb_filters,
    "doc_length_histogram": q_doc_length_histogram,
    "source_pii_rates": q_source_pii_rates,
    "user_type_diversity": q_user_type_diversity,
    "events_churn": q_events_churn,
    "streaming_drift_gate": q_streaming_drift_gate,
    "tpch_q12": q_tpch_q12,
    "tpch_q13": q_tpch_q13,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q18": q_tpch_q18,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
    "events_window_agg": q_events_window_agg,
    "events_sessionize": q_events_sessionize,
    "events_session_window": q_events_session_window,
}

ORACLES: dict[str, str] = {
    "embedding_quantize_int8": oracle_embedding_quantize_int8(),
    "ann_int8_topk": oracle_ann_int8_topk(),
    "ann_int8_rerank": oracle_ann_int8_rerank(),
    "ann_ivf_int8": oracle_ann_ivf_int8(),
    # persisted-index twin of the flat code-tier scan: value-identical
    # contract, independently re-derived (certifies build AND query)
    "ann_index_int8": oracle_ann_index_int8(),
    "ann_ivf_int8_rerank": oracle_ann_ivf_int8_rerank(),
    "ann_index_append": oracle_ann_index_append(),
    "ann_index_delete": oracle_ann_index_delete(),
    "ann_index_rebuild": oracle_ann_index_rebuild(),
    "ann_index_trained": oracle_ann_index_trained(),
    "ann_index_oov": oracle_ann_index_oov(),
    "ann_index_compact": oracle_ann_index_compact(),
    "ann_index_trained_delete": oracle_ann_index_trained_delete(),
    # the exactly-once epoch protocol must land the SAME final state as
    # the plain two-batch append — same oracle on purpose: the planted
    # crashed-attempt file and the full replay both fail the hash if
    # they leave any extra (or missing) rows
    "ann_index_stream_append": oracle_ann_index_append(),
    "nginx_parse_agg": oracle_nginx_parse_agg(),
    "nginx_parse_rows": oracle_nginx_parse_rows(),
    "nginx_deadletter": oracle_nginx_deadletter(),
    "nginx_parse_json": oracle_nginx_parse_json(),
    "nginx_custom_casts": oracle_nginx_custom_casts(),
    "events_window_agg": oracle_events_window_agg(),
    "events_sessionize": oracle_events_sessionize(),
    "events_session_window": oracle_events_session_window(),
    "events_sliding_window": oracle_events_sliding_window(),
    "events_topk_per_user": oracle_events_topk_per_user(),
    "syslog_extract": oracle_syslog_extract(),
    "tpch_q1": oracle_tpch_q1(),
    "tpch_q3": oracle_tpch_q3(),
    "tpch_q5": oracle_tpch_q5(),
    "tpch_q4": oracle_tpch_q4(),
    "tpch_q6": oracle_tpch_q6(),
    "tpch_q10": oracle_tpch_q10(),
    "tpch_q13": oracle_tpch_q13(),
    "tpch_q14": oracle_tpch_q14(),
    "tpch_q18": oracle_tpch_q18(),
    "tpch_q2": oracle_tpch_q2(),
    "tpch_q7": oracle_tpch_q7(),
    "tpch_q8": oracle_tpch_q8(),
    "tpch_q9": oracle_tpch_q9(),
    "tpch_q11": oracle_tpch_q11(),
    "tpch_q12": oracle_tpch_q12(),
    "tpch_q15": oracle_tpch_q15(),
    "tpch_q16": oracle_tpch_q16(),
    "tpch_q17": oracle_tpch_q17(),
    "tpch_q19": oracle_tpch_q19(),
    "tpch_q20": oracle_tpch_q20(),
    "tpch_q21": oracle_tpch_q21(),
    "tpch_q22": oracle_tpch_q22(),
    "salted_agg_users": oracle_salted_agg_users(),
    "dedup_exact": oracle_dedup_exact(),
    "text_stats": oracle_text_stats(),
    "doc_fingerprint": oracle_doc_fingerprint(),
    "embedding_neardup": oracle_embedding_neardup(),
    "embedding_neardup_lsh": oracle_embedding_neardup_lsh(),
    "events_rollup": oracle_events_rollup(),
    "events_exact_stats": oracle_events_exact_stats(),
    "events_sketches": oracle_events_sketches(),
    "doc_bm25": oracle_doc_bm25(),
    "cluster_balanced_sample": oracle_cluster_balanced_sample(),
    "nginx_session_funnel": oracle_nginx_session_funnel(),
    "streaming_session_funnel": oracle_streaming_session_funnel(),
    "dedup_prefix": oracle_dedup_prefix(),
    "doc_fineweb_filters": oracle_doc_fineweb_filters(),
    "source_dedup_rates": oracle_source_dedup_rates(),
    "doc_length_histogram": oracle_doc_length_histogram(),
    "source_pii_rates": oracle_source_pii_rates(),
    "events_burstiness": oracle_events_burstiness(),
    "corpus_build_full": oracle_corpus_build_full(),
    "corpus_build_mixture": oracle_corpus_build_mixture(),
    "source_mixture_plan": oracle_source_mixture_plan(),
    "ann_hard_negatives": oracle_ann_hard_negatives(),
    "dedup_winnowing": oracle_dedup_winnowing(),
    "mixture_materialize": oracle_mixture_materialize(),
    "dedup_edit_distance": oracle_dedup_edit_distance(),
    "dedup_editdist_unicode": oracle_dedup_editdist_unicode(),
    "user_type_diversity": oracle_user_type_diversity(),
    "events_churn": oracle_events_churn(),
    "streaming_drift_gate": oracle_streaming_drift_gate(),
    "doc_gopher_rules": oracle_doc_gopher_rules(),
    "token_heavy_hitters": oracle_token_heavy_hitters(),
    "events_split_leakage": oracle_events_split_leakage(),
    "lang_fertility": oracle_lang_fertility(),
    "dedup_cluster_sizes": oracle_dedup_cluster_sizes(),
    "corpus_token_budget": oracle_corpus_token_budget(),
    "events_hourly_baseline": oracle_events_hourly_baseline(),
    "nginx_top_clients": oracle_nginx_top_clients(),
    "nginx_ip_prefix": oracle_nginx_ip_prefix(),
    "events_lifecycle": oracle_events_lifecycle(),
    "events_value_deciles": oracle_events_value_deciles(),
    "doc_containment": oracle_doc_containment(),
    "embedding_density": oracle_embedding_density(),
    "corpus_diff": oracle_corpus_diff(),
    "sample_weighted": oracle_sample_weighted(),
    "quality_adaptive": oracle_quality_adaptive(),
    "embedding_diversity": oracle_embedding_diversity(),
    "term_affinity": oracle_term_affinity(),
    "sample_exact_k": oracle_sample_exact_k(),
    "embedding_dim_stats": oracle_embedding_dim_stats(),
    "corpus_drift": oracle_corpus_drift(),
    "benchmark_leakage": oracle_benchmark_leakage(),
    "lang_confusion": oracle_lang_confusion(),
    "events_gap_stats": oracle_events_gap_stats(),
    "lsh_precision": oracle_lsh_precision(),
    "doc_quality_outliers": oracle_doc_quality_outliers(),
    "embedding_norm_outliers": oracle_embedding_norm_outliers(),
    "dedup_minhash_lsh": oracle_dedup_minhash_lsh(),
    "dedup_simhash": oracle_dedup_simhash(),
    "dedup_simhash_pairs": oracle_dedup_simhash_pairs(),
    "dedup_ngram_jaccard": oracle_dedup_ngram_jaccard(),
    "dedup_clusters": oracle_dedup_clusters(),
    # same contract, same oracle: the np scorer must reproduce the HOF
    # scorer's exact ranked output (tests/test_multiprobe.py proves it)
    "ann_cosine_topk_np": oracle_ann_cosine_topk(),
    "ann_lsh": oracle_ann_lsh(),
    "ann_lsh_multiprobe": oracle_ann_lsh_multiprobe(),
    "ann_ivf": oracle_ann_ivf(),
    "events_asof_join": oracle_events_asof_join(),
    "events_range_join": oracle_events_range_join(),
    "salted_join_events": oracle_salted_join_events(),
    "text_lang_id": oracle_text_lang_id(),
    "dedup_paragraphs": oracle_dedup_paragraphs(),
    "text_bpe_tokens": oracle_text_bpe_tokens(),
    "text_normalize": oracle_text_normalize(),
    "multimodal_pipeline": oracle_multimodal_pipeline(),
    "multimodal_decode_png": oracle_multimodal_decode_png(),
    "multimodal_decode_wav": oracle_multimodal_decode_wav(),
    "pack_documents": oracle_pack_documents(),
    "chunk_documents": oracle_chunk_documents(),
    "doc_rolling_hash61": oracle_doc_rolling_hash61(),
    "json_fields": oracle_json_fields(),
    "scalar_funcs": oracle_scalar_funcs(),
    "doc_decontaminate": oracle_doc_decontaminate(),
    "events_sample_stratified": oracle_events_sample_stratified(),
    "text_repetition": oracle_text_repetition(),
    "dedup_substring": oracle_dedup_substring(),
    "semdedup": oracle_semdedup(),
    "pii_redact": oracle_pii_redact(),
    "corpus_vocab": oracle_corpus_vocab(),
    "tokenize_ids": oracle_tokenize_ids(),
    "shard_shuffle": oracle_shard_shuffle(),
    "dedup_minhash_incremental": oracle_dedup_minhash_incremental(),
    "events_outliers": oracle_events_outliers(),
    "source_mix": oracle_source_mix(),
    "semantic_decontam": oracle_semantic_decontam(),
    # broadcast variant computes the identical contract; same oracle
    "semantic_decontam_bcast": oracle_semantic_decontam(),
    "lm_perplexity": oracle_lm_perplexity(),
    "dsir_weights": oracle_dsir_weights(),
    "multimodal_fused": oracle_multimodal_fused(),
    "bigram_lm_perplexity": oracle_bigram_lm_perplexity(),
    # broadcast-join twin computes the identical contract; same oracle
    "bigram_lm_score_join": oracle_bigram_lm_perplexity(),
    "cluster_split": oracle_cluster_split(),
    "corpus_report": oracle_corpus_report(),
    "multimodal_decode_meta": oracle_multimodal_decode_meta(),
    "multimodal_decode_mp4": oracle_multimodal_decode_mp4(),
    "events_funnel": oracle_events_funnel(),
    "events_session_funnel": oracle_events_session_funnel(),
    "source_overlap": oracle_source_overlap(),
    "embedding_kmeans": oracle_embedding_kmeans(),
    "dedup_keep_best": oracle_dedup_keep_best(),
    "doc_novelty": oracle_doc_novelty(),
    "doc_top_terms": oracle_doc_top_terms(),
    "events_top_paths": oracle_events_top_paths(),
    "kmeans_representatives": oracle_kmeans_representatives(),
    "events_funnel_timing": oracle_events_funnel_timing(),
    "events_dau_wau": oracle_events_dau_wau(),
    "nb_lang_score": oracle_nb_lang_score(),
    "events_retention": oracle_events_retention(),
    "events_transitions": oracle_events_transitions(),
    "lm_tail_keep": oracle_lm_tail_keep(),
    "nginx_error_rate": oracle_nginx_error_rate(),
    "nginx_latency_percentiles": oracle_nginx_latency_percentiles(),
    "events_cusum": oracle_events_cusum(),
    "events_winsorized": oracle_events_winsorized(),
    "events_robust_stats": oracle_events_robust_stats(),
}
