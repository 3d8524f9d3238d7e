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


# --- sample_exact_k_per_group -----------------------------------------------


def test_exact_k_matches_window_definition(spark):
    from grower_spark.functions.hashing import md5_60_py
    from grower_spark.operators.sampling import sample_exact_k_per_group

    rows = [(i, f"src{i % 5}") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = sample_exact_k_per_group(df, "grp", k=25, key_col="doc_id")
    picked = sorted((r.grp, r.doc_id) for r in got.collect())
    # oracle definition: the 25 smallest (hash, id) per group
    by_grp = {}
    for i, g in rows:
        by_grp.setdefault(g, []).append((md5_60_py(f"ekg|{i}"), i))
    want = sorted(
        (g, i)
        for g, hs in by_grp.items()
        for _, i in sorted(hs)[:25]
    )
    assert picked == want
    assert len(picked) == 5 * 25


def test_exact_k_small_group_keeps_all(spark):
    from grower_spark.operators.sampling import sample_exact_k_per_group

    df = spark.createDataFrame(
        [(i, "tiny") for i in range(7)] + [(100 + i, "big") for i in range(50)],
        "doc_id long, grp string",
    )
    got = sample_exact_k_per_group(df, "grp", k=10, key_col="doc_id")
    counts = {}
    for r in got.collect():
        counts[r.grp] = counts.get(r.grp, 0) + 1
    assert counts == {"tiny": 7, "big": 10}


def test_exact_k_null_group_is_a_real_group(spark):
    """A NULL group (untagged source/lang) must get exact-k like any
    other group — the window definition (and the DuckDB oracle) treats
    NULLs as one partition.  Before the null-safe boundary join, NULL
    rows never matched their boundary bucket and were ALL kept (r9
    advice, medium)."""
    from grower_spark.operators.sampling import sample_exact_k_per_group

    rows = [(i, None) for i in range(200)] + [
        (1000 + i, "tagged") for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    got = sample_exact_k_per_group(df, "grp", k=30, key_col="doc_id")
    counts = {}
    for r in got.collect():
        counts[r.grp] = counts.get(r.grp, 0) + 1
    assert counts == {None: 30, "tagged": 30}


def test_exact_k_partitioning_invariant(spark):
    from grower_spark.operators.sampling import sample_exact_k_per_group

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(600)], "doc_id long, grp string"
    )
    a = sorted((r.grp, r.doc_id) for r in
               sample_exact_k_per_group(df, "grp", 20).collect())
    b = sorted((r.grp, r.doc_id) for r in
               sample_exact_k_per_group(df.repartition(11), "grp", 20).collect())
    assert a == b


# --- embedding_dim_stats ----------------------------------------------------


def test_dim_stats_exact(spark):
    from grower_spark.operators.diversity import embedding_dim_stats

    vecs = [[0.0, 1.0], [0.002, 3.0], [0.004, 5.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.dim: r for r in embedding_dim_stats(df).collect()}
    # quantized: dim1 -> [0, 2, 4], dim2 -> [1000, 3000, 5000]
    assert got[1].n == 3 and got[1].mean_q == 2.0
    assert got[1].var_q == pytest.approx(8.0 / 3.0, abs=0)  # (0,2,4) var
    assert got[2].mean_q == 3000.0
    assert got[2].var_q == pytest.approx(8.0 / 3.0 * 1e6, abs=0)


def test_dim_stats_partitioning_invariant_bits(spark):
    from grower_spark.operators.diversity import embedding_dim_stats

    rows = [
        (i, [((i * 13 + d * 7) % 100 - 50) / 31.0 for d in range(6)])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {r.dim: (r.mean_q, r.var_q)
         for r in embedding_dim_stats(df).collect()}
    b = {r.dim: (r.mean_q, r.var_q)
         for r in embedding_dim_stats(df.repartition(9)).collect()}
    assert a == b


# --- distribution_drift_bins ------------------------------------------------


def test_drift_bins_identical_snapshots_zero(spark):
    from grower_spark.operators.diff import distribution_drift_bins

    df = spark.createDataFrame(
        [(i % 1000,) for i in range(500)], "score long"
    )
    got = distribution_drift_bins(df, df).collect()
    assert all(r.drift_contrib == 0.0 for r in got)
    assert all(r.n_old == r.n_new for r in got)


def test_drift_bins_detects_shift(spark):
    from grower_spark.operators.diff import distribution_drift_bins

    old = spark.createDataFrame([(50,)] * 80 + [(950,)] * 20, "score long")
    new = spark.createDataFrame([(50,)] * 20 + [(950,)] * 80, "score long")
    got = {r.bin: r for r in distribution_drift_bins(old, new).collect()}
    assert got[0].share_old == 0.8 and got[0].share_new == 0.2
    # contribution: (0.2-0.8)^2/0.8 = 0.45
    assert got[0].drift_contrib == pytest.approx(0.45, abs=1e-12)
    assert got[9].drift_contrib == pytest.approx(0.36 / 0.2, abs=1e-12)


def test_drift_bins_new_class_null_contrib(spark):
    from grower_spark.operators.diff import distribution_drift_bins

    old = spark.createDataFrame([(50,)] * 10, "score long")
    new = spark.createDataFrame([(50,)] * 5 + [(550,)] * 5, "score long")
    got = {r.bin: r for r in distribution_drift_bins(old, new).collect()}
    assert got[5].n_old == 0 and got[5].n_new == 5
    assert got[5].drift_contrib is None


# --- benchmark_leakage ------------------------------------------------------


def test_benchmark_leakage_attribution_and_zeros(spark):
    from grower_spark.operators.decontam import benchmark_leakage

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),     # leaks into 2 docs
         (2, "totally clean eval item"),    # leaks nowhere
         (3, None)],                        # NULL text: excluded
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "intro alpha beta gamma delta outro"),
         (11, "alpha beta gamma here too"),
         (12, "unrelated content entirely different")],
        "doc_id long, text string",
    )
    got = {r.bench_id: r for r in
           benchmark_leakage(corpus, bench, n=3).collect()}
    assert set(got) == {1, 2}
    # item 1: doc 10 shares 'alpha beta gamma' + 'beta gamma delta',
    # doc 11 shares 'alpha beta gamma' -> 2 docs, 2 distinct grams
    assert got[1].n_docs_hit == 2 and got[1].n_grams_hit == 2
    assert got[2].n_docs_hit == 0 and got[2].n_grams_hit == 0


# --- lsh_precision_audit ----------------------------------------------------


def test_lsh_precision_exact_jaccard(spark):
    from grower_spark.operators.dedup import lsh_precision_audit

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = spark.createDataFrame(
        [(1, base + "alpha beta gamma"),
         (2, base + "alpha beta delta"),     # near-dup of 1
         (3, "completely different content nothing shared here at all")],
        "doc_id long, text string",
    )
    got = lsh_precision_audit(docs, sample_permille=1000).collect()
    assert got, "the near-dup pair must be an LSH candidate"
    row = {(r.id_a, r.id_b): r for r in got}[(1, 2)]
    # exact jaccard recomputed by hand over distinct 3-shingles
    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + 3]) for i in range(max(len(w) - 2, 1))}
    a, b = sh(docs.collect()[0].text), sh(docs.collect()[1].text)
    ni, nu = len(a & b), len(a | b)
    assert row.n_inter == ni and row.n_union == nu
    assert row.jaccard_bp == (10000 * ni) // nu


def test_lsh_precision_sample_deterministic(spark):
    from grower_spark.operators.dedup import lsh_precision_audit

    docs = spark.createDataFrame(
        [(i, f"shared prefix tokens here plus w{i} and w{i + 1} tail")
         for i in range(40)],
        "doc_id long, text string",
    )
    a = {(r.id_a, r.id_b) for r in
         lsh_precision_audit(docs, sample_permille=300).collect()}
    b = {(r.id_a, r.id_b) for r in
         lsh_precision_audit(docs.repartition(7),
                             sample_permille=300).collect()}
    full = {(r.id_a, r.id_b) for r in
            lsh_precision_audit(docs, sample_permille=1000).collect()}
    assert a == b
    assert a <= full


def test_lsh_precision_pair_budget_bounds_the_audit(spark):
    """pair_budget sizes the sample to a flat cost: on a duplicate-dense
    corpus the audited pair count stays near the budget (hash sampling:
    expected = budget, spread ~sqrt), degrades to audit-everything when
    candidates <= budget, and overrides sample_permille."""
    import pytest

    from grower_spark.operators.dedup import lsh_precision_audit

    # duplicate-dense: 120 docs in 30 near-identical quads -> dense
    # candidate set
    docs = spark.createDataFrame(
        [(i, f"shared boilerplate prefix tokens c{i // 4} plus w{i % 4}")
         for i in range(120)],
        "doc_id long, text string",
    )
    full = lsh_precision_audit(docs, sample_permille=1000).count()
    assert full >= 100  # dense enough to make the budget bind
    budget = 20
    got = lsh_precision_audit(docs, pair_budget=budget).count()
    # permille = ceil(1000*20/full); realized count is hash-binomial
    # around budget — assert the ORDER, not the exact draw
    assert got <= 3 * budget, (got, full)
    assert got >= budget // 3, (got, full)
    # degenerate: budget >= candidates -> audit everything
    assert lsh_precision_audit(docs, pair_budget=10 * full).count() == full
    with pytest.raises(ValueError, match="pair_budget"):
        lsh_precision_audit(docs, pair_budget=0)


# --- randomized brute-force parity (seeded, deterministic) -------------------


def test_adaptive_cutoffs_match_brute_force_over_random_cases(spark):
    """For 15 seeded random (group, score) multisets the histogram-derived
    cutoff and n_kept must equal the brute-force definition: the max
    score whose top-cumulative count reaches the target share, keeping
    ties."""
    import random

    from grower_spark.operators.sampling import adaptive_quality_cut

    for seed in range(15):
        rng = random.Random(seed)
        keep = rng.choice([1, 100, 300, 500, 999, 1000])
        rows = [
            (f"g{g}", rng.randint(0, 12))
            for g in range(rng.randint(1, 4))
            for _ in range(rng.randint(1, 40))
        ]
        df = spark.createDataFrame(rows, "grp string, score long")
        got = {r.grp: r for r in
               adaptive_quality_cut(df, "grp", "score", keep).collect()}
        by_g = {}
        for g, s in rows:
            by_g.setdefault(g, []).append(s)
        for g, scores in by_g.items():
            total = len(scores)
            cum, cutoff, n_kept = 0, None, 0
            for s in sorted(set(scores), reverse=True):
                cum += scores.count(s)
                if cum * 1000 >= keep * total:
                    cutoff, n_kept = s, cum
                    break
            assert got[g].cutoff == cutoff, (seed, g, keep)
            assert got[g].n_kept == n_kept, (seed, g, keep)
            assert got[g].n_total == total, (seed, g, keep)


def test_weighted_sample_membership_matches_python_twin(spark):
    """Row membership is a pure function of (salt, key, w, W): the Spark
    decision must equal the integer python twin exactly, across seeds."""
    import random

    from grower_spark.functions.hashing import md5_60_py
    from grower_spark.operators.sampling import weighted_poisson_sample

    for seed in range(10):
        rng = random.Random(100 + seed)
        rows = [(i, rng.randint(1, 5000)) for i in range(rng.randint(5, 300))]
        k = rng.randint(1, 50)
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = sorted(
            r.doc_id for r in
            weighted_poisson_sample(df, "w", k, key_col="doc_id").collect()
        )
        w_total = sum(w for _, w in rows)
        want = sorted(
            i for i, w in rows
            if (md5_60_py(f"wps|{i}") % 1_000_000) * w_total
            < 1_000_000 * k * w
        )
        assert got == want, seed


def test_exact_k_matches_brute_force_over_random_group_sizes(spark):
    """Random group sizes straddling k (including < k and == k groups):
    the two-phase plan must equal the brute 'k smallest (hash, id) per
    group' everywhere."""
    import random

    from grower_spark.functions.hashing import md5_60_py
    from grower_spark.operators.sampling import sample_exact_k_per_group

    for seed in range(8):
        rng = random.Random(200 + seed)
        k = rng.randint(1, 20)
        rows, nid = [], 0
        for g in range(rng.randint(1, 5)):
            for _ in range(rng.choice([k - 1 if k > 1 else 1, k, k + 7,
                                       rng.randint(1, 60)])):
                rows.append((nid, f"g{g}"))
                nid += 1
        df = spark.createDataFrame(rows, "doc_id long, grp string")
        got = sorted(
            (r.grp, r.doc_id) for r in
            sample_exact_k_per_group(df, "grp", k=k).collect()
        )
        by_g = {}
        for i, g in rows:
            by_g.setdefault(g, []).append((md5_60_py(f"ekg|{i}"), i))
        want = sorted(
            (g, i) for g, hs in by_g.items() for _, i in sorted(hs)[:k]
        )
        assert got == want, (seed, k)
