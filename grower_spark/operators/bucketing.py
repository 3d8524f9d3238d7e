"""Bucketed tables: co-located, co-sorted storage for shuffle-free joins.

At 100 TB the recurring cost of `lineitem ⋈ orders` is the shuffle of both
fact tables onto the join key — per query, every query.  Bucketing pays
that shuffle ONCE at write time: both tables are written pre-hashed into
the same number of buckets on the key (and sorted within buckets), so
every later equi-join or aggregation on that key is planned with zero
Exchange and zero Sort — the bucketed scan itself reports the required
hash distribution and sort order to the planner.

This is Spark's native answer to the co-location the reference gets from
single-node locality; `tests/test_bucketing.py` pins the zero-Exchange /
zero-Sort plan on real testdata, and the round-trip row equality.

Mechanics worth knowing at scale:

- bucket counts must match across join sides (or be a multiple with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- one file per bucket per writing task: repartition by the bucket column
  first so each task writes every bucket once (small-files control);
- ``sortBy`` makes SortMergeJoin sort-free, but only behind
  ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
  default since SPARK-28595: multiple files per bucket void the order);
  write_bucketed guarantees one file per bucket, the valid case.
  Without the flag buckets still kill the Exchange and SMJ re-sorts
  each bucket;
- the table must go through the catalog (``saveAsTable``/``spark.table``)
  — plain ``parquet(path)`` writes drop the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog-registered bucketed parquet table.

    Repartitions on the bucket column first so each writer task emits one
    file per bucket it owns instead of every task writing a sliver of
    every bucket (the classic bucketed-write small-files explosion:
    tasks x buckets files).
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, bucket_col)
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    left_key: str, right_key: str,
) -> DataFrame:
    """Equi-join two bucketed catalog tables on their bucket keys.

    With matching bucket counts the planner consumes the buckets'
    hashpartitioning directly: no Exchange on either side, and with
    sorted buckets no Sort either — scan → SortMergeJoin.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
