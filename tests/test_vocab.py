"""Corpus vocabulary stats (text.vocab_topk)."""

import math

from grower_spark.operators.text import vocab_topk


def test_vocab_counts_and_order(spark):
    rows = [
        (1, "a a b c"),
        (2, "a b b"),
        (3, None),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = vocab_topk(df, k=10).collect()
    got = {r.token: (r.tf, r.doc_freq, r.idf_r4, r.rank) for r in out}
    # tf: a=3, b=3, c=2; doc_freq: a=2, b=2, c=2; n_docs (non-null) = 3
    idf_2 = round(math.log(3 / 2), 4)
    assert got["a"] == (3, 2, idf_2, 1)  # tf tie a/b -> token asc
    assert got["b"] == (3, 2, idf_2, 2)
    assert got["c"] == (2, 2, idf_2, 3)


def test_vocab_limit_is_deterministic(spark):
    rows = [(i, "t%d x" % (i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in vocab_topk(df, k=3).collect()]
    b = [tuple(r) for r in vocab_topk(df.repartition(13), k=3).collect()]
    assert a == b  # layout-independent top-k (ties broken by token)
    assert len(a) == 3 and a[0][0] == "x"


def test_vocab_no_expand_in_plan(spark):
    rows = [(1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = vocab_topk(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # two-phase agg, not count+count_distinct
