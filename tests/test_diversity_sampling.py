"""Round-9 session-3 operators: weighted Poisson sampling, adaptive
per-group quality cut, embedding diversity (moment identity), token-pair
affinity."""

import math

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.diversity import embedding_diversity
from grower_spark.operators.sampling import (
    adaptive_quality_cut,
    weighted_poisson_sample,
)
from grower_spark.operators.text import term_affinity_topk


# --- weighted_poisson_sample ---------------------------------------------


def test_weighted_sample_proportional_and_deterministic(spark):
    # two weight classes, 10:1 — the heavy class must be sampled ~10x
    # more often, and two runs must agree row-for-row
    rows = [(i, 1000 if i % 2 == 0 else 100) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_poisson_sample(df, "w", target_rows=400, key_col="doc_id")
    kept = got.collect()
    again = weighted_poisson_sample(df, "w", target_rows=400, key_col="doc_id")
    assert sorted(r.doc_id for r in kept) == sorted(
        r.doc_id for r in again.collect()
    )
    heavy = sum(1 for r in kept if r.w == 1000)
    light = sum(1 for r in kept if r.w == 100)
    # E[heavy] ≈ 400*2000*1000/2.2e6 ≈ 364, E[light] ≈ 36
    assert 280 <= heavy <= 400
    assert 10 <= light <= 80
    assert abs(len(kept) - 400) < 80  # Poisson: expected size, sd ~ 19


def test_weighted_sample_certain_rows_always_kept(spark):
    # one row holding >1/k of the total weight has p >= 1 — always kept
    rows = [(0, 10_000_000)] + [(i, 1) for i in range(1, 100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_poisson_sample(df, "w", target_rows=5, key_col="doc_id")
    assert 0 in {r.doc_id for r in got.collect()}


def test_weighted_sample_partitioning_invariant(spark):
    rows = [(i, (i % 7) * 50 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = weighted_poisson_sample(df, "w", 100, key_col="doc_id").collect()
    b = weighted_poisson_sample(
        df.repartition(17), "w", 100, key_col="doc_id"
    ).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_weighted_sample_null_weight_dropped(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 1000)], "doc_id long, w long"
    )
    got = weighted_poisson_sample(df, "w", target_rows=2, key_col="doc_id")
    ids = {r.doc_id for r in got.collect()}
    assert 1 not in ids


# --- adaptive_quality_cut --------------------------------------------------


def test_adaptive_cut_per_group_thresholds(spark):
    # group A scores 0..99, group B scores 100..199: a GLOBAL top-30%
    # cut would delete group A entirely; the adaptive cut keeps 30 of each
    rows = [("a", i) for i in range(100)] + [("b", 100 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, score long")
    out = {r.grp: r for r in
           adaptive_quality_cut(df, "grp", "score", 300).collect()}
    assert out["a"].n_total == 100 and out["b"].n_total == 100
    assert out["a"].n_kept == 30 and out["b"].n_kept == 30
    assert out["a"].cutoff == 70 and out["b"].cutoff == 170


def test_adaptive_cut_ties_kept(spark):
    # all rows share one score: the cutoff lands on it and EVERYTHING is
    # kept (documented over-keep; dropping ties would delete the class)
    df = spark.createDataFrame([("a", 5)] * 10, "grp string, score long")
    row = adaptive_quality_cut(df, "grp", "score", 100).collect()[0]
    assert row.n_kept == 10 and row.cutoff == 5


def test_adaptive_cut_keep_all(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)], "grp string, score long"
    )
    row = adaptive_quality_cut(df, "grp", "score", 1000).collect()[0]
    assert row.n_kept == 10 and row.cutoff == 0


# --- embedding_diversity ----------------------------------------------------


def _brute_diversity(vecs):
    q = [[math.floor(x * 1000 + 0.5) for x in v] for v in vecs]
    n = len(q)
    s = 0
    for a in q:
        for b in q:
            s += sum((x - y) ** 2 for x, y in zip(a, b))
    return s / (n * n)


def test_diversity_matches_all_pairs(spark):
    vecs = {
        0: [[0.1, 0.2], [0.3, -0.1], [0.25, 0.05], [-0.4, 0.7]],
        1: [[1.0, 1.0], [1.0, 1.0]],  # identical pair → diversity 0
    }
    rows = [
        (i * 10 + j, lab, v)
        for lab, vs in vecs.items()
        for j, v in enumerate(vs)
        for i in [lab]
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {r.label: r for r in embedding_diversity(df).collect()}
    for lab, vs in vecs.items():
        # the moment identity gives E||x-y||^2 including x==y zero terms,
        # exactly what the brute force over all ordered pairs computes
        assert got[lab].diversity == pytest.approx(
            _brute_diversity([[float(x) for x in v] for v in vs]), abs=1e-9
        )
    assert got[1].diversity == 0.0


def test_diversity_partitioning_invariant_bits(spark):
    # integer moments are summation-order-free: repartitioning must not
    # change even the last bit of the final division
    rows = [
        (i, i % 3, [((i * 37 + d * 11) % 200 - 100) / 97.0 for d in range(8)])
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    a = {r.label: r.diversity for r in embedding_diversity(df).collect()}
    b = {
        r.label: r.diversity
        for r in embedding_diversity(df.repartition(13)).collect()
    }
    assert a == b


# --- term_affinity_topk -----------------------------------------------------


def test_term_affinity_ranks_collocation_first(spark):
    # "new york" always co-occurs; filler tokens are independent
    docs = [(i, "new york " + ("the cat " * (i % 3 + 1)).strip())
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = term_affinity_topk(df, k=5, min_count=5).collect()
    assert got[0].x == "new" and got[0].y == "york"
    assert got[0].c_xy == 40
    # affinity of the perfect collocation exceeds the grammar fillers
    assert got[0].affinity_r4 > got[-1].affinity_r4


def test_term_affinity_min_count_prunes(spark):
    df = spark.createDataFrame(
        [(1, "rare pair"), (2, "a b a b a b a b a b")],
        "doc_id long, text string",
    )
    got = term_affinity_topk(df, k=10, min_count=5).collect()
    pairs = {(r.x, r.y) for r in got}
    assert ("rare", "pair") not in pairs
    assert ("a", "b") in pairs
