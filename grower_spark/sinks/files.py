"""File sinks (self-contained mode): Parquet tables laid out like the
reference's ClickHouse destination.

The reference table (migrations/sample_test.sql:17-19) is monthly
partitioned on a derived ``insert_date`` with ORDER BY (status,
insert_date).  Parquet equivalents: a derived month partition column
(partition pruning ≈ ClickHouse partition elimination) and
``sortWithinPartitions`` (row-group clustering ≈ ORDER BY locality, which
gives min/max-pruning inside files).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def pick_time_col(df: DataFrame) -> Optional[str]:
    """The reference's ``insert_date`` derives from time_local
    (sample_test.sql:13); a custom scheme partitions on its first
    time-typed column, and a scheme with none writes unpartitioned
    (``to_date`` of a non-time column would be an ANSI runtime error)."""
    if "time_local" in df.columns:
        return "time_local"
    for name, dtype in df.dtypes:
        if dtype in ("timestamp", "date"):
            return name
    return None


def with_insert_date(df: DataFrame, time_col: Optional[str] = "time_local") -> DataFrame:
    """insert_date / insert_month derived columns (sample_test.sql:13);
    pass ``time_col=None`` for schemes without a time column (no-op)."""
    if time_col is None:
        return df
    return (
        df.withColumn("insert_date", F.to_date(F.col(time_col)))
        .withColumn("insert_month", F.date_format(F.col(time_col), "yyyyMM"))
    )


def write_batch_files(
    df: DataFrame,
    path: str,
    time_col: Optional[str] = "time_local",
    order_by: Sequence[str] = ("status",),
    fmt: str = "parquet",
) -> None:
    out = with_insert_date(df, time_col)
    order_cols = [c for c in order_by if c in out.columns] + (
        ["insert_date"] if time_col is not None else []
    )
    writer = out.sortWithinPartitions(*order_cols).write if order_cols else out.write
    if time_col is not None:
        writer = writer.partitionBy("insert_month")
    writer.format(fmt).mode("append").save(path)


def file_stream_writer(
    df: DataFrame,
    path: str,
    checkpoint_dir: str,
    time_col: Optional[str] = "time_local",
    fmt: str = "parquet",
    trigger_seconds: Optional[int] = None,
    available_now: bool = False,
):
    """Streaming writer builder (caller invokes ``.start()``)."""
    out = with_insert_date(df, time_col)
    writer = (
        out.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if time_col is not None:
        writer = writer.partitionBy("insert_month")
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer
