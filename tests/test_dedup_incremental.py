"""Incremental MinHash dedup: new-batch-vs-corpus-index equals the batch
run restricted to pairs touching a new doc — old↔old work is never redone.
"""

import pyspark.sql.functions as F

from grower_spark.operators.dedup import (
    minhash_band_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
)
from tests.conftest import SF_SMALL


def _pairs_set(df):
    return {(r.id_a, r.id_b, r.n_bands) for r in df.collect()}


def test_incremental_matches_batch_restriction(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.where(F.col("doc_id") % 3 != 0)
    new = docs.where(F.col("doc_id") % 3 == 0)

    batch = minhash_lsh_pairs(docs, num_perm=16, bands=4, shingle_n=3)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    expected = {
        t for t in _pairs_set(batch) if t[0] in new_ids or t[1] in new_ids
    }

    index = minhash_band_index(old, num_perm=16, bands=4, shingle_n=3)
    got = _pairs_set(
        minhash_lsh_pairs_incremental(new, index, num_perm=16, bands=4, shingle_n=3)
    )
    assert got == expected
    assert expected  # non-degenerate fixture: some cross/new pairs exist


def test_index_roundtrips_through_parquet(spark, tmp_path):
    """The index is persistable state: write/read parquet, same result."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    )
    old = docs.where(F.col("doc_id") < 250)
    new = docs.where(F.col("doc_id") >= 250)
    path = str(tmp_path / "band_index")
    minhash_band_index(old).write.parquet(path)
    live = minhash_lsh_pairs_incremental(new, minhash_band_index(old))
    stored = minhash_lsh_pairs_incremental(new, spark.read.parquet(path))
    assert _pairs_set(live) == _pairs_set(stored)


def test_bucket_width_cap_filters_old_side(spark):
    rows = [(i, "common text shared by every doc") for i in range(1, 9)]
    old = spark.createDataFrame(rows, "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, "common text shared by every doc")], "doc_id long, text string"
    )
    index = minhash_band_index(old)
    uncapped = minhash_lsh_pairs_incremental(new, index)
    capped = minhash_lsh_pairs_incremental(new, index, max_bucket_width=4)
    # all 8 old docs collide with the new one without a cap; the capped run
    # drops the degenerate buckets entirely
    assert len(_pairs_set(uncapped)) == 8
    assert len(_pairs_set(capped)) == 0


def test_bucket_width_cap_filters_new_side_too(spark):
    """A degenerate bucket in the BATCH must also be capped — otherwise
    the new-old join emits new_width x old_width pairs uncapped."""
    old = spark.createDataFrame(
        [(1, "common text shared by every doc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100 + i, "common text shared by every doc") for i in range(8)],
        "doc_id long, text string",
    )
    index = minhash_band_index(old)
    uncapped = minhash_lsh_pairs_incremental(new, index)
    capped = minhash_lsh_pairs_incremental(new, index, max_bucket_width=4)
    assert len(_pairs_set(uncapped)) > 0
    assert len(_pairs_set(capped)) == 0


def test_bucket_width_cap_is_combined_width(spark):
    """The cap must act on the UNION's per-bucket width (r6 advice): 3 old
    + 3 new identical docs with cap=4 — neither side alone exceeds the
    cap, but the monolithic run sees width 6 and drops the bucket, so the
    incremental run must too (capped batch == capped incremental,
    restricted to new-touching pairs)."""
    old = spark.createDataFrame(
        [(i, "common text shared by every doc") for i in range(1, 4)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100 + i, "common text shared by every doc") for i in range(3)],
        "doc_id long, text string",
    )
    index = minhash_band_index(old)
    capped = minhash_lsh_pairs_incremental(new, index, max_bucket_width=4)
    batch = minhash_lsh_pairs(old.unionByName(new), max_bucket_width=4)
    assert _pairs_set(capped) == _pairs_set(batch) == set()
    # and with a cap the combined width fits under, full parity holds
    loose_inc = minhash_lsh_pairs_incremental(new, index, max_bucket_width=6)
    loose_batch = minhash_lsh_pairs(old.unionByName(new), max_bucket_width=6)
    new_ids = {100, 101, 102}
    expected = {
        t for t in _pairs_set(loose_batch)
        if t[0] in new_ids or t[1] in new_ids
    }
    assert _pairs_set(loose_inc) == expected and expected
