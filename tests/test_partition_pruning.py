"""Partition pruning proof: the monthly layout the file sink writes must
let Catalyst skip non-matching partitions entirely (the parquet analog of
ClickHouse partition elimination the reference's table relies on)."""

import pyspark.sql.functions as F

from grower_spark.sinks.files import write_batch_files

from conftest import SF_SMALL


def test_month_partition_pruning(spark, tmp_path):
    from grower_spark.io_tables import load_table

    # testdata spans a single month; spread rows over three months so
    # pruning has partitions to skip
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id",
        F.expr("timestampadd(MONTH, CAST(event_id % 3 AS INT), ts)").alias(
            "time_local"
        ),
        "user_id",
    )
    out = str(tmp_path / "t")
    write_batch_files(ev, out, time_col="time_local")

    back = spark.read.parquet(out)
    months = [r["insert_month"] for r in back.select("insert_month").distinct().collect()]
    assert len(months) >= 2  # pruning is only meaningful across partitions

    one = back.where(F.col("insert_month") == months[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (applied at partition
    # discovery — non-matching directories are never listed or read) ...
    part_filters = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "insert_month" in part_filters
    # ... and NOT survive as a post-scan row Filter over all partitions
    post_scan_filters = [
        seg.split("\n")[0] for seg in plan.split("Filter ")[1:]
        if "PartitionFilters" not in seg.split("\n")[0]
    ]
    assert not any("insert_month" in seg for seg in post_scan_filters), plan
    assert one.count() > 0
    assert one.select("insert_month").distinct().count() == 1
