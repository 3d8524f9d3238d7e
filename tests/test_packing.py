"""Sequence packing (bin packing into token budgets) — invariants and
determinism."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.packing import pack_documents, pack_utilization

MAX = 1000


@pytest.fixture(scope="module")
def sized_docs(spark):
    # Zipf-ish sizes incl. an oversize doc and exact-fit docs
    rows = [(i, (i * 37) % 900 + 50) for i in range(500)]
    rows.append((1000, 5000))   # oversize: can never fit MAX
    rows.append((1001, MAX))    # exact fit
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"])


def test_every_doc_packed_exactly_once(spark, sized_docs):
    packs = pack_documents(sized_docs, MAX, num_groups=8)
    got = packs.groupBy("doc_id").count().where(F.col("count") != 1).count()
    assert got == 0
    assert packs.count() == sized_docs.count()


def test_no_pack_exceeds_budget(spark, sized_docs):
    packs = pack_documents(sized_docs, MAX, num_groups=8)
    over = (
        packs.where(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .where(F.col("t") > MAX)
    )
    assert over.count() == 0


def test_oversize_docs_flagged_and_isolated(spark, sized_docs):
    packs = pack_documents(sized_docs, MAX, num_groups=8)
    over_rows = packs.where(F.col("oversize")).collect()
    assert [r["doc_id"] for r in over_rows] == [1000]
    # the oversize doc sits alone in its pack
    pack_id = over_rows[0]["pack_id"]
    assert packs.where(F.col("pack_id") == pack_id).count() == 1
    # the exact-fit doc is NOT oversize
    exact = packs.where(F.col("doc_id") == 1001).collect()[0]
    assert not exact["oversize"]


def test_packing_deterministic_across_partitioning(spark, sized_docs):
    a = {r["doc_id"]: (r["pack_id"], r["pack_pos"])
         for r in pack_documents(sized_docs, MAX, num_groups=8).collect()}
    b = {r["doc_id"]: (r["pack_id"], r["pack_pos"])
         for r in pack_documents(sized_docs.repartition(13), MAX, num_groups=8).collect()}
    assert a == b


def test_ffd_utilization_beats_padding(spark, sized_docs):
    packs = pack_documents(sized_docs, MAX, num_groups=8)
    util = pack_utilization(packs, MAX).collect()
    total_fill = sum(r["pack_tokens"] for r in util)
    budget = MAX * len(util)
    # FFD on Zipf-ish sizes should land well above naive one-doc-per-pack
    # (which here would be ~47% mean fill); require >80% aggregate fill
    assert total_fill / budget > 0.80
    # pack_pos is a dense 0..n-1 sequence within each pack
    pos = (
        packs.groupBy("pack_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pack_pos").alias("mx"),
             F.min("pack_pos").alias("mn"))
        .where((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0))
    )
    assert pos.count() == 0


def test_pack_documents_rejects_bad_budget(spark, sized_docs):
    with pytest.raises(ValueError):
        pack_documents(sized_docs, 0)


def test_pack_documents_rejects_null_sizes(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "doc_id: long, n_tokens: long"
    )
    with pytest.raises(Exception, match="NULL or negative id/size"):
        pack_documents(df, MAX).collect()


def test_pack_invariants_property(spark):
    """Property sweep: random-ish Zipf sizes at several budgets — every doc
    packed once, no pack over budget, fill stays reasonable."""
    import hashlib

    rows = [
        (i, int(hashlib.md5(f"sz{i}".encode()).hexdigest()[:4], 16) % 997 + 3)
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    for budget in (64, 500, 1200):
        packs = pack_documents(df, budget, num_groups=16)
        assert packs.count() == 800
        per_pack = (
            packs.where(~F.col("oversize"))
            .groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("t"))
        )
        assert per_pack.where(F.col("t") > budget).count() == 0
        n_over = packs.where(F.col("oversize")).count()
        assert n_over == sum(1 for _, s in rows if s > budget)


def test_pack_documents_custom_id_column(spark):
    df = spark.createDataFrame(
        [(10, 100), (11, 200), (12, 300)], "item_id: long, sz: long"
    )
    packs = pack_documents(df, 1000, id_col="item_id", size_col="sz")
    assert "item_id" in packs.columns and "doc_id" not in packs.columns
    joined = df.join(packs, "item_id")
    assert joined.count() == 3


def test_pack_documents_string_ids(spark):
    df = spark.createDataFrame(
        [("u-1", 100), ("u-2", 950), ("u-3", 30)], "doc_id: string, n_tokens: long"
    )
    packs = pack_documents(df, 1000)
    got = {r["doc_id"] for r in packs.collect()}
    assert got == {"u-1", "u-2", "u-3"}
    assert dict(packs.dtypes)["doc_id"] == "string"


def test_pack_documents_rejects_negative_sizes(spark):
    # size(NULL) is -1 in Spark — a classic sentinel that must not be
    # packable (it would un-fill the oversize bin's full-forever marker)
    df = spark.createDataFrame(
        [(1, 5000), (2, -1), (3, 3)], "doc_id: long, n_tokens: long"
    )
    with pytest.raises(Exception, match="negative"):
        pack_documents(df, 1000).collect()
