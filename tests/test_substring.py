"""Substring-level dedup (operators/substring.py).

Pins the suffix-array-pipeline semantics of the rolling k-gram
formulation: span merging, the keep-first-owner removal policy, the
df caps, short/null-document edges, and md5/xxhash path agreement.
"""

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.substring import (
    duplicate_gram_hits,
    duplicate_spans,
    remove_duplicate_substrings,
    substring_dup_stats,
)

from conftest import SF_SMALL


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    return _df(
        spark,
        [
            (1, "a b c d e f g h i j k l m n o p"),
            (2, "x y a b c d e f g h i j z w q r"),  # shares run a..j with 1
            (3, "p q r s t u v w0 w1 w2 w3 w4 w5 w6"),  # unique
            (4, None),
            (5, "a b c d e f g h i j k l m n o p"),  # exact copy of 1
            (6, "s1 s2"),  # shorter than k
        ],
    )


def test_spans_merge_overlapping_grams(spark, corpus):
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in duplicate_spans(corpus, k=4, max_gram_df=None).collect()
    }
    # docs 1 and 5 are identical: every gram duplicated, one maximal span
    assert (1, 1, 16, 16) in spans
    assert (5, 1, 16, 16) in spans
    # doc 2 shares exactly tokens 3..12 (a..j)
    assert (2, 3, 12, 10) in spans
    assert not any(d == 3 or d == 6 for d, *_ in spans)


def test_gap_splits_spans(spark):
    # two shared 4-runs separated by >k unique tokens -> two spans
    df = _df(
        spark,
        [
            (1, "r1 r2 r3 r4 u1 u2 u3 u4 u5 s1 s2 s3 s4"),
            (2, "r1 r2 r3 r4 v1 v2 v3 v4 v5 s1 s2 s3 s4"),
        ],
    )
    spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, k=4, max_gram_df=None).collect()
    )
    assert spans == [(1, 1, 4), (1, 10, 13), (2, 1, 4), (2, 10, 13)]


def test_within_document_repetition_counts(spark):
    # min_df counts occurrences, not documents: a run repeated inside ONE
    # doc is duplication (generation loops, boilerplate stuffing)
    df = _df(spark, [(1, "a b c d x y z w a b c d")])
    spans = [(r.span_start, r.span_end) for r in duplicate_spans(df, k=4).collect()]
    assert sorted(spans) == [(1, 4), (9, 12)]


def test_max_gram_df_cap_drops_degenerate_grams(spark):
    rows = [(i, "c1 c2 c3 c4") for i in range(10)]
    df = _df(spark, rows)
    assert duplicate_spans(df, k=4, max_gram_df=5).count() == 0
    assert duplicate_spans(df, k=4, max_gram_df=None).count() == 10


def test_owner_is_corpus_first_occurrence(spark, corpus):
    hits = duplicate_gram_hits(corpus, k=4, max_gram_df=None)
    owners = hits.where("is_owner").groupBy("h").count().where("count > 1").count()
    assert owners == 0  # exactly one owner per gram
    # gram "a b c d" occurs in docs 1 (pos 1), 2 (pos 3), 5 (pos 1):
    # owner must be (1, 1) — the smallest (doc_id, pos)
    row = (
        hits.where("is_owner")
        .join(
            duplicate_gram_hits(corpus, k=4, max_gram_df=None)
            .where((F.col("doc_id") == 2) & (F.col("pos") == 3))
            .select("h"),
            on="h",
        )
        .collect()
    )
    assert {(r.doc_id, r.pos) for r in row} == {(1, 1)}


def test_removal_keeps_exactly_first_copy(spark, corpus):
    out = {r.doc_id: r for r in remove_duplicate_substrings(corpus, k=4, max_gram_df=None).collect()}
    assert out[1].text_clean == out[1].text  # owner keeps everything
    assert out[5].text_clean == ""  # exact copy fully removed
    assert out[5].n_removed == 16
    assert out[2].text_clean == "x y z w q r"  # shared run cut, rest in order
    assert out[3].text_clean == out[3].text
    assert out[6].text_clean == out[6].text  # short doc passes through
    assert 4 not in out  # null text filtered


def test_stats_consistent_with_spans_on_testdata(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    stats = substring_dup_stats(docs, k=8).cache()
    spans = duplicate_spans(docs, k=8)
    agg = spans.groupBy("doc_id").agg(
        F.count("*").alias("s_n"), F.sum("span_len").alias("s_tok")
    )
    j = stats.join(agg, on="doc_id", how="left").collect()
    for r in j:
        assert r.n_spans == (r.s_n or 0)
        assert r.dup_tokens == (r.s_tok or 0)
        assert 0 <= r.dup_tokens <= r.n_tokens
        assert r.dup_ratio_bp == r.dup_tokens * 10000 // r.n_tokens
    stats.unpersist()


def test_xxhash_path_matches_md5_path(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = sorted(map(tuple, duplicate_spans(docs, k=8, hash_fn="md5").collect()))
    b = sorted(map(tuple, duplicate_spans(docs, k=8, hash_fn="xxhash").collect()))
    assert a == b


def test_removal_then_redetect_finds_nothing_cross_doc(spark, corpus):
    # after keep-first removal, re-running detection on the cleaned corpus
    # finds no *cross-document* duplicated span at the same k
    cleaned = remove_duplicate_substrings(corpus, k=4, max_gram_df=None).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    hits = duplicate_gram_hits(cleaned, k=4, max_gram_df=None)
    cross = (
        hits.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where("nd > 1")
        .count()
    )
    assert cross == 0


def test_removal_keeps_first_copy_under_self_overlap(spark):
    """Periodic text (same token repeated): the non-owner gram at pos 2
    overlaps the owner's span — keep-one must still leave the first
    k-token copy intact, not shred it down to a single token."""
    from grower_spark.operators.substring import remove_duplicate_substrings

    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 9)), (2, "x " * 0 + "completely different words entirely here today friend ok")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_substrings(
        df, k=8, min_df=2
    ).collect()}
    assert out[1].text_clean == " ".join(["w"] * 8)
    assert out[1].n_removed == 1
