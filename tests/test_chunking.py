"""Document chunking: window boundaries, overlap, coverage, pack synergy."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.chunking import chunk_documents
from grower_spark.operators.packing import pack_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),  # 3 windows at (4,1)
        (2, "a b"),                                  # short: one chunk
        (3, " ".join(f"x{i}" for i in range(7))),    # remainder window
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_boundaries_and_overlap(spark, docs):
    out = sorted(
        chunk_documents(docs, 4, overlap_tokens=1).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    got = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in out}
    assert got[(1, 0)] == "t0 t1 t2 t3"
    assert got[(1, 1)] == "t3 t4 t5 t6"   # shares exactly 1 token
    assert got[(1, 2)] == "t6 t7 t8 t9"
    assert got[(2, 0)] == "a b"
    assert got[(3, 1)] == "x3 x4 x5 x6"   # remainder still full here
    ids = {r["chunk_id"] for r in out}
    assert ids == {"1:0", "1:1", "1:2", "2:0", "3:0", "3:1"}


def test_every_token_covered_no_overlap(spark, docs):
    out = chunk_documents(docs, 3, overlap_tokens=0)
    # with zero overlap, chunk token counts per doc sum to the doc length
    per_doc = {
        r["doc_id"]: r["total"]
        for r in out.groupBy("doc_id")
        .agg(F.sum("n_chunk_tokens").alias("total"))
        .collect()
    }
    assert per_doc == {1: 10, 2: 2, 3: 7}


def test_chunk_rejects_bad_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError):
        chunk_documents(docs, 4, overlap_tokens=4)


def test_chunks_flow_into_packer(spark, docs):
    """The designed composition: chunk -> pack on string chunk ids."""
    chunks = chunk_documents(docs, 4, overlap_tokens=1)
    packs = pack_documents(
        chunks, max_tokens=8, id_col="chunk_id", size_col="n_chunk_tokens"
    )
    assert packs.count() == chunks.count()
    assert dict(packs.dtypes)["chunk_id"] == "string"
    over = (
        packs.where(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"))
        .where(F.col("t") > 8)
    )
    assert over.count() == 0


def test_chunk_null_text_absent(spark):
    df = spark.createDataFrame([(1, None), (2, "a b c")], ["doc_id", "text"])
    got = {r["doc_id"] for r in chunk_documents(df, 2).collect()}
    assert got == {2}
