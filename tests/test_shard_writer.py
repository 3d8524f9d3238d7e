"""Sharded training-data writer: deterministic membership/order, one-file
shards, manifest round-trip, and tamper detection."""

import os
import shutil

import pyspark.sql.functions as F

from grower_spark.sinks.files import verify_shards, write_training_shards


def _docs(spark, n=120, parts=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    ).repartition(parts)


def test_shard_write_roundtrip_and_determinism(spark, tmp_path):
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_training_shards(_docs(spark, parts=1), out_a, 8, salt="s")
    mb = write_training_shards(_docs(spark, parts=7), out_b, 8, salt="s")
    # manifest identical regardless of input partitioning
    assert ma == mb and ma["total_rows"] == 120 and len(ma["shards"]) == 8
    assert verify_shards(spark, out_a)["ok"]
    # shard membership matches the hash contract and order is sorted
    df = spark.read.parquet(os.path.join(out_a, "shards"))
    from grower_spark.functions.hashing import md5_60

    bad = df.where(
        F.pmod(md5_60(F.concat(F.col("doc_id").cast("string"), F.lit(":s"))), F.lit(8))
        != F.col("shard")
    )
    assert bad.count() == 0
    # byte-identical shard files across the two writes (same membership
    # AND same within-shard order -> same parquet contents)
    rows_a = spark.read.parquet(os.path.join(out_a, "shards")).collect()
    rows_b = spark.read.parquet(os.path.join(out_b, "shards")).collect()
    assert sorted(map(tuple, rows_a)) == sorted(map(tuple, rows_b))


def test_shard_verify_detects_tamper(spark, tmp_path):
    out = str(tmp_path / "t")
    write_training_shards(_docs(spark), out, 4, salt="x")
    assert verify_shards(spark, out)["ok"]
    # drop one whole shard partition -> that shard must be flagged
    victim = next(
        d for d in os.listdir(os.path.join(out, "shards")) if d.startswith("shard=")
    )
    shutil.rmtree(os.path.join(out, "shards", victim))
    res = verify_shards(spark, out)
    assert not res["ok"]
    assert victim.split("=")[1] in res["mismatches"]


def test_shard_write_empty_corpus(spark, tmp_path):
    out = str(tmp_path / "empty")
    m = write_training_shards(
        spark.createDataFrame([], "doc_id long, text string"), out, 4
    )
    assert m["total_rows"] == 0 and m["shards"] == {}
    assert verify_shards(spark, out) == {"ok": True, "mismatches": []}
