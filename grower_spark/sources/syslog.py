"""Syslog source (reference S5: internal/services/syslog).

The reference runs an RFC3164 server on tcp/udp/unix sockets and feeds only
``parts["content"]`` (the raw nginx line inside the syslog payload) to the
row pipeline (internal/services/syslog/impl.go:89-98).

Spark-native shape (SURVEY.md §2.1 S5):
- dev mode: ``socket`` streaming source + the same RFC3164 envelope strip
  as a DataFrame transform;
- prod mode: route syslog to Kafka and use the Kafka source — Spark has no
  UDP/unix-datagram ingestion (and shouldn't: a socket into one executor
  is not a scalable source).  The envelope transform below is shared by
  both paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

# RFC3164: <PRI>Mmm dd hh:mm:ss host tag[pid]: content
RFC3164_PATTERN = (
    r"^<([0-9]{1,3})>([A-Z][a-z]{2}\ +[0-9]{1,2}\ [0-9:]{8})\ "
    r"([^ ]+)\ ([^ :\[]+)(\[[0-9]+\])?:\ (.*)$"
)


def rfc3164_extract(df: DataFrame, frame_col: str = "value") -> DataFrame:
    """Envelope fields + content from RFC3164 frames.

    Non-matching frames keep ``content = ''`` and ``pri`` NULL — feeding
    content to LogPipeline then drops them, matching the reference's
    parse-failure drop."""
    frame = F.col(frame_col)

    def grp(i: int) -> Column:
        return F.regexp_extract(frame, RFC3164_PATTERN, i)

    return df.select(
        grp(1).try_cast("int").alias("pri"),
        (grp(1).try_cast("int") / 8).cast("int").alias("facility"),
        (grp(1).try_cast("int") % 8).alias("severity"),
        grp(2).alias("syslog_ts"),
        grp(3).alias("host"),
        grp(4).alias("tag"),
        grp(6).alias("value"),
    )


def syslog_socket_stream(spark: SparkSession, host: str = "localhost",
                         port: int = 5140) -> DataFrame:
    """Dev-mode TCP syslog intake: socket source, one frame per line."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
