"""Distributed exact global ranking.

``Window.orderBy`` with no partition key moves EVERY row to one
partition — fine for bounded frames (top-k over a type^3 path rollup),
a scale-killer for unbounded ones (ranking all users of a 100 TB
corpus).  ``global_row_number`` computes the exact same row_number with
the classic two-phase plan instead:

1. range-repartition on the (total) sort key — Spark's RangePartitioner
   samples boundaries so partitions are balanced and ordered end to end;
2. per-partition local row_number (a window PARTITIONED by the range
   partition id — fully parallel);
3. add each partition's starting offset, computed from the bounded
   per-partition counts (numPartitions rows, collected and folded into
   a literal CASE — the collect is bounded by the partition count, not
   the data).

The sort key list must be a TOTAL order (no ties), otherwise rows equal
on the key may straddle a range boundary and the global numbering would
depend on placement.  Callers append a unique id as the last key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def global_row_number(
    df: DataFrame,
    order: Sequence[Column],
    out_col: str = "rn",
    num_partitions: int = 64,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row_number over a total order, without a
    single-partition window.  Returns ``(df + out_col, total_rows)`` —
    the total is free from the offsets pass and callers (e.g. NTILE)
    need it as a literal.

    Triggers one job to gather the bounded per-partition counts (the
    range exchange is computed once and reused by the main pass via
    ``localCheckpoint`` so the input is not scanned twice).
    """
    ranged = df.repartitionByRange(num_partitions, *order)
    # one materialization serves both the counts job and the main pass
    ranged = ranged.localCheckpoint(eager=True)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = (
        with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    )  # bounded: num_partitions rows
    offsets: dict[int, int] = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    if not offsets:
        return df.withColumn(out_col, F.lit(None).cast("long")), 0
    off_expr = F.element_at(
        F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy(*order)
    ranked = (
        with_pid.withColumn("_local_rn", F.row_number().over(w))
        .withColumn(out_col, (off_expr + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn")
    )
    return ranked, acc


def ntile_from_rank(rank: Column, n_rows: int, n_buckets: int) -> Column:
    """SQL NTILE bucket from an exact global rank: the first
    ``n_rows % n_buckets`` buckets take ``n_rows//n_buckets + 1`` rows,
    the rest one fewer — identical to the window-function semantics on
    every engine.  ``n_rows`` is a driver-side literal (the bounded
    count from :func:`global_row_number`'s offsets pass)."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    q, r = divmod(n_rows, n_buckets)
    big = r * (q + 1)  # rows living in the (q+1)-sized buckets
    if q == 0:
        # fewer rows than buckets: bucket == rank
        return rank.cast("int")
    return (
        F.when(rank <= big, F.ceil(rank / (q + 1)))
        .otherwise(r + F.ceil((rank - big) / q))
        .cast("int")
    )
