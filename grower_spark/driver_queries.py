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


def _parsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pipeline().parse(_synth_lines(spark, sf_dir))


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
    """Malformed-row drop semantics: kept vs dropped counts (§1.3 item 4)."""
    good, bad = _pipeline().parse_with_deadletter(_synth_lines(spark, sf_dir))
    kept = good.select(F.lit("kept").alias("bucket"))
    dropped = bad.select(F.lit("dropped").alias("bucket"))
    return kept.unionAll(dropped).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def oracle_nginx_deadletter() -> str:
    return (
        ORACLE_PARSED_CTE.rsplit(",\nparsed AS", 1)[0]
        + """
SELECT CASE WHEN valid THEN 'kept' ELSE 'dropped' END AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM checked GROUP BY 1
"""
    )


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


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority join: broadcast dims, shuffle only on the fact."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    joined = (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
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
    """Token counting + quality signals per document (all-integer outputs)."""
    docs = _cpu_spread(spark, load_table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    stop = F.array([F.lit(w) for w in _STOPWORDS])
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
        ).alias("sum_token_len"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def oracle_text_stats() -> str:
    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return f"""
SELECT doc_id,
  CAST(length(text) AS INTEGER) AS n_chars,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t))) AS INTEGER) AS sum_token_len,
  CAST(len(list_filter(string_split(text, ' '), t -> list_contains([{stop_list}], t))) AS INTEGER) AS n_stop,
  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
FROM documents
"""


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


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (n1 * n2)


N_ANN_QUERIES = 8
ANN_TOPK = 10


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors, one pass over
    the corpus, per-query window top-k.  The 100TB scale path is the same
    plan with the corpus partitioned; no shuffle on the corpus side."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_ANN_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pairs = emb.crossJoin(F.broadcast(queries)).where(F.col("vec_id") != F.col("qid"))
    sim = _cosine(F.col("qvec"), F.col("embedding"))
    scored = pairs.select("qid", "vec_id", F.round(sim, 4).alias("sim_r4"))
    w = Window.partitionBy("qid").orderBy(F.desc("sim_r4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= ANN_TOPK)
        .select("qid", "vec_id", "rank", "sim_r4")
    )


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
    """Embedding-cosine near-duplicate pairs, blocked by label.

    Blocking keys turn the O(n^2) all-pairs into per-block joins — the same
    shape as an LSH bucket join at 100TB (shuffle on the block key only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("vec_a"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vec_b"), "label"
    )
    pairs = a.join(b, "label").where(F.col("id_a") < F.col("id_b"))
    sim = _cosine(F.col("vec_a"), F.col("vec_b"))
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


# ---------------------------------------------------------------------------
# Registries (driver contract)
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "nginx_parse_agg": q_nginx_parse_agg,
    "nginx_parse_rows": q_nginx_parse_rows,
    "nginx_deadletter": q_nginx_deadletter,
    "syslog_extract": q_syslog_extract,
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "ann_cosine_topk": q_ann_cosine_topk,
    "embedding_neardup": q_embedding_neardup,
}

ORACLES: dict[str, str] = {
    "nginx_parse_agg": oracle_nginx_parse_agg(),
    "nginx_parse_rows": oracle_nginx_parse_rows(),
    "nginx_deadletter": oracle_nginx_deadletter(),
    "syslog_extract": oracle_syslog_extract(),
    "tpch_q1": oracle_tpch_q1(),
    "tpch_q3": oracle_tpch_q3(),
    "dedup_exact": oracle_dedup_exact(),
    "text_stats": oracle_text_stats(),
    "doc_fingerprint": oracle_doc_fingerprint(),
    "ann_cosine_topk": oracle_ann_cosine_topk(),
    "embedding_neardup": oracle_embedding_neardup(),
}
