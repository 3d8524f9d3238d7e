"""Dead-letter sink for rows the pipeline drops.

The reference only logs a warning and discards the row
(internal/services/filelog/impl.go:179-181); persisting the raw line with
context is the superset that degrades to drop (SURVEY.md §1.3 item 4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def with_deadletter_meta(bad: DataFrame, source: str = "filelog") -> DataFrame:
    return bad.select(
        F.col("line"),
        F.lit(source).alias("source"),
        F.current_timestamp().alias("seen_at"),
        F.to_date(F.current_timestamp()).alias("seen_date"),
    )


def deadletter_writer(bad: DataFrame, path: str, checkpoint_dir: str,
                      source: str = "filelog"):
    """Streaming writer builder for the dead-letter parquet directory."""
    return (
        with_deadletter_meta(bad, source)
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("seen_date")
        .outputMode("append")
    )


def write_deadletter_batch(bad: DataFrame, path: str, source: str = "filelog") -> None:
    (
        with_deadletter_meta(bad, source)
        .write.partitionBy("seen_date")
        .mode("append")
        .parquet(path)
    )
