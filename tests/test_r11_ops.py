"""Round-11: prefix_dedup broadcast removal (window rewrite), the
adversarial-density path the r10 verdict asked for, and the no-broadcast
plan pins for the source_dedup_rates twin."""

import pyspark.sql.functions as F


def test_prefix_dedup_plan_no_broadcast_one_shuffle(spark):
    """The r10 verdict's scale-killer: a forced F.broadcast of the
    duplicate-group table (proportional to template families, which grow
    with the corpus).  Pin the window rewrite: exactly one hash exchange
    on prefix_h60, zero broadcasts, zero joins."""
    from grower_spark.operators.dedup import prefix_dedup
    from tools.explain_all import plan_stats

    df = spark.createDataFrame(
        [(i, f"tpl {i % 7} common head words here tail {i}")
         for i in range(100)],
        "doc_id long, text string",
    )
    stats = plan_stats(prefix_dedup(df, n_tokens=5))
    assert stats["broadcasts"] == 0, stats
    assert stats["joins"] == 0, stats
    assert stats["shuffles"] == 1, stats


def test_prefix_dedup_adversarial_density(spark):
    """Duplicate-dense corpus: EVERY prefix group is duplicated, so the
    old broadcast-back group table would have been half the corpus.  50k
    distinct duplicated prefixes x 2 docs; the window rewrite's shuffle
    is (hash, id) rows only and has no driver-side relation to build.
    Checks exact group accounting on the full output."""
    from grower_spark.operators.dedup import prefix_dedup

    n_groups = 50_000
    df = (
        spark.range(2 * n_groups)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("form letter variant "),
                (F.col("id") % n_groups).cast("string"),
                F.lit(" opening line unique tail "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
    )
    out = prefix_dedup(df, n_tokens=4)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("keep").alias("n_keep"),
        F.min("n_same_prefix").alias("min_sz"),
        F.max("n_same_prefix").alias("max_sz"),
        F.countDistinct("prefix_h60").alias("n_groups"),
    ).collect()[0]
    assert agg["n"] == 2 * n_groups
    assert agg["n_keep"] == n_groups          # one keeper per group
    assert agg["min_sz"] == 2 and agg["max_sz"] == 2
    assert agg["n_groups"] == n_groups
    # the keeper is the min id of its pair (id and id + n_groups share
    # a prefix): every kept doc_id must be < n_groups
    assert out.where("keep = 1 AND doc_id >= %d" % n_groups).count() == 0


def test_rate_fano_no_int64_overflow_at_extreme_scale(spark):
    """r10 ADVICE: (n_buckets * sumsq - n_events^2) * 100 in pure int64
    overflows at ~1e6 buckets x 1e6 events/bucket (sumsq ~1e18), which
    ANSI mode turns into a runtime error.  Pin the DECIMAL(38,0)
    rewrite on exactly that aggregate shape, against Python-int truth,
    under ANSI mode."""
    from grower_spark.operators.anomaly import _fano_projection

    n_buckets, per_bucket = 1_000_000, 1_000_000
    n_events = n_buckets * per_bucket
    sumsq = n_buckets * per_bucket * per_bucket      # 1e18: fits int64
    assert n_buckets * sumsq > 2**63                 # old expr overflowed
    expected = ((n_buckets * sumsq - n_events * n_events) * 100) // (
        n_buckets * n_events
    )
    agg = spark.createDataFrame(
        [("click", n_buckets, n_events, sumsq),
         ("view", 4, 10, 30)],                       # small sanity row
        "event_type string, n_buckets long, n_events long, _sumsq long",
    )
    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = {r["event_type"]: r["fano_x100"]
               for r in _fano_projection(agg, "event_type").collect()}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)
    assert out["click"] == expected
    assert out["view"] == ((4 * 30 - 100) * 100) // 40


def test_source_dedup_rates_plan_no_broadcast(spark):
    """source_dedup_rates shared the corpus-scaling broadcast; pin its
    window rewrite too (no broadcast, no join)."""
    from grower_spark.driver_queries import q_source_dedup_rates
    from tests.conftest import SF_SMALL
    from tools.explain_all import plan_stats

    stats = plan_stats(q_source_dedup_rates(spark, SF_SMALL))
    assert stats["broadcasts"] == 0, stats
    assert stats["joins"] == 0, stats


# --- r11 debuts: mixture_plan / hard_negative_topk / winnowing ---


def _md5_permille(salt: str, key) -> int:
    import hashlib

    return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16) % 1000


def test_mixture_plan_sqrt_temperature_exact_math(spark):
    """Hand-checkable schedule: groups of 9 and 4 rows -> isqrt weights
    3 and 2, W=5; target 10 -> t = 6 and 4.  Group a (n=9, t=6): 0 full
    epochs + 666-permille partial; group b (n=4, t=4): exactly 1 full
    epoch + 0 partial.  n_kept_partial must equal the brute-force count
    of keys whose md5 permille clears the cutoff."""
    from grower_spark.operators.sampling import mixture_plan

    rows = [("a", i) for i in range(9)] + [("b", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in mixture_plan(df, "g", 10, "k").collect()}
    a, b = out["a"], out["b"]
    assert (a["n_total"], a["weight"], a["target_rows"]) == (9, 3, 6)
    assert (a["full_epochs"], a["partial_permille"]) == (0, 666)
    expected_a = sum(1 for i in range(9) if _md5_permille("mixplan", i) < 666)
    assert a["n_kept_partial"] == expected_a
    assert a["planned_rows"] == expected_a
    assert (b["n_total"], b["weight"], b["target_rows"]) == (4, 2, 4)
    assert (b["full_epochs"], b["partial_permille"]) == (1, 0)
    assert (b["n_kept_partial"], b["planned_rows"]) == (0, 4)


def test_mixture_plan_proportional_and_validation(spark):
    """alpha_halves=2 keeps raw proportions; bad args raise."""
    import pytest

    from grower_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("b", 4)], "g string, k long"
    )
    out = {r["g"]: r for r in
           mixture_plan(df, "g", 8, "k", alpha_halves=2).collect()}
    assert out["a"]["weight"] == 3 and out["b"]["weight"] == 1
    assert out["a"]["target_rows"] == 6 and out["b"]["target_rows"] == 2
    with pytest.raises(ValueError):
        mixture_plan(df, "g", 0, "k")
    with pytest.raises(ValueError):
        mixture_plan(df, "g", 10, "k", alpha_halves=3)


def test_mixture_plan_isqrt_clamp_on_perfect_squares(spark):
    """isqrt must be exact at the k^2 boundaries where a drifting float
    sqrt would round across the integer."""
    from grower_spark.operators.sampling import mixture_plan

    sizes = {"s16": 16, "s15": 15, "s17": 17, "s1": 1}
    rows = [(g, 1000 * j + i) for j, (g, n) in enumerate(sorted(sizes.items()))
            for i in range(n)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r["weight"] for r in mixture_plan(df, "g", 5, "k").collect()}
    assert out == {"s16": 4, "s15": 3, "s17": 4, "s1": 1}


def test_mixture_plan_bounded_histogram_plan(spark):
    """Scale pin: the corpus is aggregated ONCE into the (group, permille)
    histogram — no corpus-side join or broadcast; every join in the plan
    is between model-sized aggregates."""
    from grower_spark.operators.sampling import mixture_plan
    from tools.explain_all import plan_stats

    df = spark.range(5000).select(
        (F.col("id") % 7).cast("string").alias("g"), F.col("id").alias("k")
    )
    stats = plan_stats(mixture_plan(df, "g", 1000, "k"))
    # the corpus feeds exactly one aggregate (the (group, permille)
    # histogram) before any join: the plan's four joins all take
    # bounded inputs (counts x 1-row total, hist x plan, plan x kept)
    assert stats["joins"] <= 4, stats
    assert stats["regex_execs"] == 0, stats


def test_hard_negative_topk_label_and_null_semantics(spark):
    """No returned neighbor shares the query's label; NULL-label corpus
    rows ARE negatives for labeled queries; NULL-vs-NULL is excluded."""
    from grower_spark.operators.similarity import hard_negative_topk

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "x"),
            (2, [1.0, 0.1], "x"),    # same label as q1 -> excluded
            (3, [0.9, 0.1], "y"),
            (4, [0.8, 0.0], None),   # NULL label -> valid negative
            (5, [0.0, 1.0], None),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (5, [0.0, 1.0], None)],
        "qid long, qvec array<double>, qlabel string",
    )
    rows = hard_negative_topk(corpus, q, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    got1 = {r["vec_id"] for r in by_q[1]}
    assert got1 == {3, 4, 5}  # not itself, not same-label 2
    # q5 (NULL label): labeled rows are negatives, NULL-label row 4 is NOT
    got5 = {r["vec_id"] for r in by_q[5]}
    assert got5 == {1, 2, 3}
    # ranks are contiguous from 1 and ordered by sim desc
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sims = [r["sim_r4"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_winnowing_guarantee_shared_run(spark):
    """The winnowing contract: two docs sharing a token run of length
    window + k - 1 (= 6 here) share at least one fingerprint, however
    different the surrounding text."""
    from grower_spark.operators.dedup import winnowing_fingerprints

    run = "alpha beta gamma delta epsilon zeta"  # 6 tokens = window+k-1
    df = spark.createDataFrame(
        [
            (1, f"unrelated head words {run} completely different tail"),
            (2, f"{run} zz yy xx ww vv uu tt"),
            (3, "nothing in common with anything else at all here"),
        ],
        "doc_id long, text string",
    )
    for hash_fn in ("md5", "xxhash"):
        fps = winnowing_fingerprints(df, k=3, window=4, hash_fn=hash_fn)
        by_doc = {}
        for r in fps.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
        assert by_doc[1] & by_doc[2], (
            f"shared run must share a fingerprint ({hash_fn})"
        )
        assert not (by_doc[1] & by_doc[3]), hash_fn
        assert not (by_doc[2] & by_doc[3]), hash_fn


def test_winnowing_short_doc_edges(spark):
    """< k tokens -> no fingerprints; >= k tokens but < window k-grams ->
    exactly one fingerprint (the single truncated window's min)."""
    from grower_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two three"), (3, "one two three four")],
        "doc_id long, text string",
    )
    counts = {
        r["doc_id"]: r["n"]
        for r in winnowing_fingerprints(df, k=3, window=4)
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 1 not in counts          # 2 tokens < k
    assert counts[2] == 1           # 1 k-gram
    assert counts[3] == 1           # 2 k-grams, still one (truncated) window
    import pytest

    with pytest.raises(ValueError):
        winnowing_fingerprints(df, k=0)


def test_winnowing_pairs_counts_and_threshold(spark):
    """Identical docs share their whole fingerprint set; the min_shared
    threshold drops weak single-fingerprint coincidences."""
    from grower_spark.operators.dedup import winnowing_fingerprints, winnowing_pairs

    text = " ".join(f"tok{i % 17}x{i % 5}" for i in range(40))
    other = " ".join(f"zz{i}q{i % 3}" for i in range(40))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id long, text string"
    )
    pairs = winnowing_pairs(df, min_shared=2).collect()
    assert len(pairs) == 1
    p = pairs[0]
    n1 = winnowing_fingerprints(df.where("doc_id = 1")).count()
    assert (p["id_a"], p["id_b"]) == (1, 2)
    assert p["n_shared"] == p["n_a"] == p["n_b"] == n1


def test_mixture_materialize_counts_and_plan_shape(spark):
    """Materialized rows per group == the plan's planned_rows; epochs are
    dense 0..n_copies-1; and the plan is map-side only (zero joins, zero
    broadcasts, zero exchanges beyond the fit)."""
    from grower_spark.operators.sampling import mixture_materialize, mixture_plan
    from tools.explain_all import plan_stats

    rows = [("a", i) for i in range(9)] + [("b", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = mixture_materialize(df, "g", 10, "k")
    got = {
        r["g"]: r["n"]
        for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    plan = {r["g"]: r["planned_rows"]
            for r in mixture_plan(df, "g", 10, "k").collect()}
    assert got == {g: n for g, n in plan.items() if n > 0}
    # group b: 1 full epoch + 0 partial -> every key exactly once, epoch 0
    b_epochs = [r["epoch"] for r in out.where("g = 'b'").collect()]
    assert b_epochs == [0, 0, 0, 0]
    # upsampled shape: target 30 -> group b gets t=12 = 3 full epochs per key
    up = mixture_materialize(df, "g", 30, "k")
    b3 = up.where("g = 'b'").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    assert {r["n"] for r in b3.collect()} == {3}
    stats = plan_stats(out)
    assert stats["joins"] == 0 and stats["broadcasts"] == 0, stats
    assert stats["shuffles"] == 0, stats


def test_edit_distance_pairs_verdicts(spark):
    """LSH proposes, Levenshtein disposes: a small in-place edit passes
    the permille gate, a heavier rewrite of the same template is proposed
    by banding but rejected by the exact metric."""
    from grower_spark.operators.dedup import edit_distance_pairs

    base = " ".join(f"token{i} word{i % 7}" for i in range(40))
    small_edit = base.replace("token3 ", "token3x ")  # exactly one token
    heavy = " ".join(
        (f"token{i} word{i % 7}" if i % 3 else f"EDIT{i} word{i % 7}")
        for i in range(40)
    )
    df = spark.createDataFrame(
        [(1, base), (2, small_edit), (3, heavy)], "doc_id long, text string"
    )
    loose = {
        (r["id_a"], r["id_b"]): r
        for r in edit_distance_pairs(df, max_dist_permille=500).collect()
    }
    assert (1, 2) in loose and loose[(1, 2)]["dist"] == 1
    tight = {
        (r["id_a"], r["id_b"])
        for r in edit_distance_pairs(df, max_dist_permille=10).collect()
    }
    assert (1, 2) in tight
    assert not any(3 in p for p in tight)
    sp = loose[(1, 2)]["sim_permille"]
    assert sp == 1000 - (1000 * 1) // max(len(base), len(small_edit))
    import pytest

    with pytest.raises(ValueError):
        edit_distance_pairs(df, max_dist_permille=1001)


def test_mixture_plan_null_group_is_a_real_group(spark):
    """A NULL group must get a full schedule INCLUDING its partial-epoch
    kept count — a bare equality join would null-reject the histogram
    rows and report n_kept_partial = 0 (the r9-advice NULL-group class).
    Keys 0..8 under NULL: at 666 permille some must clear the cutoff."""
    from grower_spark.operators.sampling import mixture_materialize, mixture_plan

    rows = [(None, i) for i in range(9)] + [("b", 100 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r["g"]: r for r in mixture_plan(df, "g", 10, "k").collect()}
    a = out[None]
    assert (a["n_total"], a["weight"], a["partial_permille"]) == (9, 3, 666)
    expected = sum(1 for i in range(9) if _md5_permille("mixplan", i) < 666)
    assert expected > 0  # the fixture actually exercises the join
    assert a["n_kept_partial"] == expected
    # and the materializer agrees (its literal compile is eqNullSafe)
    n_mat = mixture_materialize(df, "g", 10, "k").where("g IS NULL").count()
    assert n_mat == a["planned_rows"] == expected


def test_hard_negative_topk_np_parity_and_nulls(spark):
    """The BLAS twin must be ROW-IDENTICAL to the HOF reference on the
    real embeddings fixture, and must reproduce the eqNullSafe label
    semantics (NULL corpus label = negative for labeled queries;
    NULL-vs-NULL excluded)."""
    from tests.conftest import SF_SMALL
    from grower_spark.operators.similarity import (
        hard_negative_topk,
        hard_negative_topk_np,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    hof = sorted(map(tuple, hard_negative_topk(emb, q, k=10).collect()))
    blas = sorted(map(tuple, hard_negative_topk_np(emb, q, k=10).collect()))
    assert hof == blas and len(hof) == 80
    # null semantics through the numpy mask
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "x"), (2, [0.9, 0.1], None), (3, [0.8, 0.1], "y")],
        "vec_id long, embedding array<double>, label string",
    )
    qn = spark.createDataFrame(
        [(10, [1.0, 0.0], "x"), (11, [1.0, 0.0], None)],
        "qid long, qvec array<double>, qlabel string",
    )
    got = {}
    for r in hard_negative_topk_np(corpus, qn, k=5).collect():
        got.setdefault(r["qid"], set()).add(r["vec_id"])
    assert got[10] == {2, 3}   # same-label 1 excluded, NULL 2 kept
    assert got[11] == {1, 3}   # NULL-vs-NULL 2 excluded


def test_winnowing_guarantee_randomized(spark):
    """The winnowing guarantee over 30 seeded-random constructions: for
    every (k, window) in a small grid, two docs built from DISJOINT
    random vocabularies that share one random run of exactly
    window + k - 1 tokens must share >= 1 fingerprint — wherever the run
    lands in either doc.  One Spark job per (k, window), all cases in
    one frame."""
    import random

    from grower_spark.operators.dedup import winnowing_fingerprints

    rng = random.Random(4111)
    for k, window in [(3, 4), (2, 5), (4, 2)]:
        run_len = window + k - 1
        rows = []
        for case in range(10):
            run = [f"r{case}s{j}" for j in range(run_len)]
            a = [f"a{case}t{j}" for j in range(rng.randint(0, 25))]
            b = [f"b{case}t{j}" for j in range(rng.randint(0, 25))]
            ia = rng.randint(0, len(a))
            ib = rng.randint(0, len(b))
            rows.append((2 * case, " ".join(a[:ia] + run + a[ia:])))
            rows.append((2 * case + 1, " ".join(b[:ib] + run + b[ib:])))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps = {}
        for r in winnowing_fingerprints(df, k=k, window=window).collect():
            fps.setdefault(r["doc_id"], set()).add(r["fp"])
        for case in range(10):
            shared = fps.get(2 * case, set()) & fps.get(2 * case + 1, set())
            assert shared, (k, window, case)
