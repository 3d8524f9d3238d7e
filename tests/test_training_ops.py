"""Round-4 training-data operators: decontamination, deterministic
sampling, repetition quality signals."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.decontam import contamination_hits, decontaminate
from grower_spark.operators.sampling import (
    hash_permille,
    sample_stratified,
    sample_uniform,
    split_column,
)
from grower_spark.operators.text import repetition_stats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown cat sleeps all day long"),
        (4, "entirely different words about nothing in particular"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    # shares the 3-gram "the quick brown" with docs 1 and 3, nothing else
    return spark.createDataFrame(
        [(100, "the quick brown weasel runs")], ["doc_id", "text"]
    )


def test_contamination_hits_known_overlap(corpus, bench):
    hits = {
        r["doc_id"]: r["n_hit"]
        for r in contamination_hits(corpus, bench, n=3).collect()
    }
    # docs 1 and 3 share exactly "the quick brown"; 2 and 4 share nothing
    assert hits == {1: 1, 3: 1}


def test_decontaminate_drops_hit_docs(corpus, bench):
    kept = sorted(
        r["doc_id"] for r in decontaminate(corpus, bench, n=3).collect()
    )
    assert kept == [2, 4]


def test_contamination_short_doc_whole_text_gram(spark):
    # shingles() semantics: a doc shorter than n contributes its full join,
    # so an exact short match is still caught
    docs = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    bench = spark.createDataFrame([(9, "hello world")], ["doc_id", "text"])
    assert contamination_hits(docs, bench, n=8).count() == 1


def test_hash_permille_matches_python_md5(spark):
    # the cross-engine contract: Spark permille == python md5 arithmetic
    df = spark.range(50).select(
        F.col("id"), hash_permille(F.col("id"), salt="s").alias("u")
    )
    for r in df.collect():
        expect = int(hashlib.md5(f"s|{r['id']}".encode()).hexdigest()[:15], 16) % 1000
        assert r["u"] == expect


def test_sample_uniform_rate_and_determinism(spark):
    df = spark.range(20000).withColumnRenamed("id", "k")
    a = sample_uniform(df, "k", 100, salt="x")
    # membership is a pure function of (key, salt): repartitioning must not
    # change the sample, unlike df.sample()
    b = sample_uniform(df.repartition(7), "k", 100, salt="x")
    ka = sorted(r["k"] for r in a.collect())
    kb = sorted(r["k"] for r in b.collect())
    assert ka == kb
    assert 0.08 < len(ka) / 20000 < 0.12
    # different salt decorrelates: two independent 10% samples overlap at
    # ~the sample rate (10% of each other), not at 100% (same salt would)
    c = set(r["k"] for r in sample_uniform(df, "k", 100, salt="y").collect())
    overlap = len(set(ka) & c) / max(len(c), 1)
    assert 0.05 < overlap < 0.2


def test_sample_stratified_rates(spark):
    rows = [(i, "big" if i % 2 == 0 else "rare") for i in range(10000)]
    df = spark.createDataFrame(rows, ["k", "stratum"])
    out = sample_stratified(
        df, "stratum", {"big": 100, "rare": 1000}, key_col="k", salt="s"
    ).groupBy("stratum").count().collect()
    got = {r["stratum"]: r["count"] for r in out}
    assert got["rare"] == 5000  # 1000 permille keeps everything
    assert 400 < got["big"] < 600
    # unlisted strata default to 0 permille
    df2 = spark.createDataFrame([(1, "other")], ["k", "stratum"])
    assert sample_stratified(df2, "stratum", {"big": 100}, key_col="k").count() == 0


def test_split_column_partitions_completely(spark):
    df = spark.range(5000).select(
        F.col("id"), split_column(F.col("id"), 200, salt="sp").alias("part")
    )
    counts = {r["part"]: r["count"] for r in df.groupBy("part").count().collect()}
    assert set(counts) == {"train", "holdout"}
    assert counts["train"] + counts["holdout"] == 5000
    assert 800 < counts["holdout"] < 1200


def test_repetition_stats_crafted_values(spark):
    rows = [
        (1, "a a a b"),          # top word a:3/4, bigrams: "a a" x2, "a b" -> 2/3
        (2, "x y z w"),          # all distinct
        (3, "solo"),             # single token: 1 bigram == the token itself
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["distinct_ratio_bp"] == 5000       # 2 distinct / 4
    assert got[1]["top_word_bp"] == 7500             # 3/4
    assert got[1]["top_bigram_bp"] == 6666           # 2/3 floored
    assert got[2]["distinct_ratio_bp"] == 10000
    assert got[2]["top_word_bp"] == 2500
    assert got[2]["top_bigram_bp"] == 3333           # 1/3
    assert got[3]["n_tokens"] == 1
    assert got[3]["top_bigram_bp"] == 10000


def test_repetition_stats_repeated_doc_is_flagged(spark):
    rows = [(1, " ".join(["spam ham"] * 50)), (2, " ".join(f"w{i}" for i in range(100)))]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    # doc 1 is two tokens repeated 50x: distinct ratio 2/100, top word 50%
    assert got[1]["distinct_ratio_bp"] == 200
    assert got[1]["top_word_bp"] == 5000
    assert got[1]["top_bigram_bp"] > 4000
    assert got[2]["distinct_ratio_bp"] == 10000
    assert got[2]["top_word_bp"] == 100


def test_sampling_null_keys_dropped(spark):
    # NULL key -> NULL bucket -> dropped, never sampled nondeterministically
    df = spark.createDataFrame([(1,), (None,)], "k: bigint")
    got = [r["k"] for r in sample_uniform(df, "k", 1000, salt="s").collect()]
    assert got == [1]


def test_decontam_null_text_is_clean(spark, bench):
    docs = spark.createDataFrame(
        [(1, None), (2, "the quick brown weasel runs")], ["doc_id", "text"]
    )
    hits = {r["doc_id"] for r in contamination_hits(docs, bench, n=3).collect()}
    assert hits == {2}
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()}
    assert kept == {1}


def test_repetition_null_text_absent(spark):
    df = spark.createDataFrame([(1, None), (2, "a b a")], ["doc_id", "text"])
    got = {r["doc_id"] for r in repetition_stats(df).collect()}
    assert got == {2}


def test_sampling_rejects_out_of_range_rates(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "s"])
    with pytest.raises(ValueError):
        sample_uniform(df, "k", 1001)
    with pytest.raises(ValueError):
        sample_uniform(df, "k", -1)
    with pytest.raises(ValueError):
        sample_stratified(df, "s", {"a": 2000}, key_col="k")
    with pytest.raises(ValueError):
        split_column(F.col("k"), 5000)


def test_contamination_reports_matching_grams(corpus, bench):
    got = {
        r["doc_id"]: list(r["hit_grams"])
        for r in contamination_hits(corpus, bench, n=3, return_grams=True).collect()
    }
    assert got == {1: ["the quick brown"], 3: ["the quick brown"]}


def test_source_mix_water_filling(spark):
    """Non-uniform counts: the bottleneck (largest weight/count) keeps
    ~everything; other domains keep proportionally; unlisted domains drop;
    nothing is upsampled (rates capped at 1000)."""
    from grower_spark.operators.sampling import source_mix, source_mix_rates

    rows = (
        [(i, "a") for i in range(100)]
        + [(100 + i, "b") for i in range(50)]
        + [(150 + i, "c") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    rates = source_mix_rates(df, "source", {"a": 1, "b": 1})
    # b has the larger weight/count ratio -> bottleneck at 1000; a keeps
    # 50/100 of its rows' permille space
    assert rates == {"a": 500, "b": 1000}
    out = source_mix(df, "source", {"a": 1, "b": 1}, "doc_id")
    kept = out.groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    assert "c" not in by_src            # unlisted domain dropped
    assert by_src["b"] == 50            # bottleneck keeps everything
    assert 35 <= by_src["a"] <= 65      # ~50% of 100, hash-binomial
    # deterministic under replay
    again = {r.source: r["count"]
             for r in source_mix(df, "source", {"a": 1, "b": 1}, "doc_id")
             .groupBy("source").count().collect()}
    assert again == by_src


def test_semantic_decontam_zero_norm_guard(spark, tmp_path, monkeypatch):
    """A zero-norm vector must score similarity 0, not NaN (NaN compares
    greater than any threshold under Spark's ordering — a silent
    full-corpus drop)."""
    import grower_spark.driver_queries as dq
    import pyspark.sql.functions as F

    # benchmark vec_id 0 is all-zeros; corpus row 100 is normal
    rows = [(0, [0.0] * 4, 0), (100, [1.0, 0.0, 0.0, 0.0], 1),
            (101, [0.0] * 4, 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    d = str(tmp_path)
    df.write.parquet(f"{d}/embeddings.parquet")
    monkeypatch.setattr(dq, "_SEMDECON_BENCH_N", 1)
    out = {r.vec_id: r for r in dq.q_semantic_decontam(spark, d).collect()}
    assert out[100].max_sim_r4 == 0.0 and out[100].contaminated == 0
    assert out[101].max_sim_r4 == 0.0 and out[101].contaminated == 0


def test_cluster_safe_split_no_leakage(spark):
    """The leakage property itself: every near-dup pair lands in ONE
    split; the whole cluster carries its representative's label, and
    singletons split by their own id (identical to a plain hash split)."""
    import pyspark.sql.functions as F

    from grower_spark.operators.sampling import (
        cluster_safe_split,
        hash_permille,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # pair graph: chain {0,1,2}, pair {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = cluster_safe_split(docs, pairs, holdout_permille=500, salt="t")
    rows = {r["doc_id"]: (r["split_key"], r["split"]) for r in out.collect()}
    assert len(rows) == 40
    # clusters move together, keyed by the min id
    assert rows[0] == rows[1] == rows[2] and rows[0][0] == 0
    assert rows[10] == rows[11] and rows[10][0] == 10
    # singletons: same label a plain per-doc hash split would give
    perm = docs.select(
        "doc_id", hash_permille(F.col("doc_id"), "t").alias("b")
    ).collect()
    for r in perm:
        if r["doc_id"] not in (0, 1, 2, 10, 11):
            want = "holdout" if r["b"] < 500 else "train"
            assert rows[r["doc_id"]][1] == want, r["doc_id"]


def test_funnel_depth_semantics(spark):
    """Strict-order funnel: steps must occur in order, each strictly
    after the previous; same-timestamp ties do NOT advance; users with
    no step events score 0."""
    from grower_spark.operators.funnel import funnel_counts, funnel_depth

    rows = [
        # u1: full ordered funnel
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: click before any view -> that click can't count; a later
        # click after the view does
        (2, 5, "click"), (2, 10, "view"), (2, 30, "click"),
        # u3: click at the SAME instant as the view -> strictly-after
        # fails, no second step
        (3, 10, "view"), (3, 10, "click"),
        # u4: purchase without the middle step -> depth stalls at 1
        (4, 10, "view"), (4, 20, "purchase"),
        # u5: only unrelated events
        (5, 10, "error"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, event_type string")
    got = {r["user_id"]: r["funnel_depth"]
           for r in funnel_depth(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 1, 5: 0}

    counts = {r["step"]: (r["step_name"], r["n_users"])
              for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert counts == {1: ("view", 4), 2: ("click", 2), 3: ("purchase", 1)}


def test_sessionized_funnel_depth(spark):
    """Funnel within gap-sessions: a chain split across two sessions does
    NOT complete; non-step events extend a session; sessions without any
    step event still appear with depth 0."""
    from grower_spark.operators.funnel import sessionized_funnel_depth

    gap = 100
    rows = [
        # u1 session 1: full chain in one sitting
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # u1 session 2 (gap > 100): chain restarts, stalls at click
        (1, 300, "view"), (1, 320, "click"),
        # u2: view, then a bridging non-step event keeps the session
        # alive, then click -> depth 2 in ONE session
        (2, 10, "view"), (2, 100, "error"), (2, 190, "click"),
        # u3: view in session 1, click only in session 2 -> both depth 1
        # and 0 (the click alone can't start the chain)
        (3, 10, "view"), (3, 500, "click"),
        # u4: one session of only unrelated events -> depth 0
        (4, 10, "error"), (4, 20, "error"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, event_type string")
    out = sessionized_funnel_depth(ev, ["view", "click", "purchase"], gap=gap)
    got = {(r["user_id"], r["session_seq"]): (r["n_events"], r["funnel_depth"])
           for r in out.collect()}
    assert got == {
        (1, 1): (3, 3), (1, 2): (2, 2),
        (2, 1): (3, 2),
        (3, 1): (1, 1), (3, 2): (1, 0),
        (4, 1): (2, 0),
    }


def test_retention_cohorts_semantics(spark):
    """First-activity week defines the cohort; each active week counts
    once per user; offset 0 equals the cohort size."""
    import datetime as dt

    from grower_spark.operators.retention import retention_cohorts

    d = dt.datetime
    rows = [
        # u1: first week W0 (Mon 2024-01-01), active again W1 twice
        (1, d(2024, 1, 2)), (1, d(2024, 1, 9)), (1, d(2024, 1, 10)),
        # u2: W0 only
        (2, d(2024, 1, 4)),
        # u3: first week W1
        (3, d(2024, 1, 8)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # u1 + u2
        ("2024-01-01", 1): 1,   # u1 returned
        ("2024-01-08", 0): 1,   # u3's own cohort
    }


def test_event_transitions_tie_order_and_counts(spark):
    from grower_spark.operators.retention import event_transitions

    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "click"),
        # tie at t=40: order is (ts, type) -> click before view
        (1, 40, "view"), (1, 40, "click"),
        (2, 10, "view"),  # single event: no transition
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, event_type string")
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in event_transitions(ev).collect()}
    # u1 sequence: view@10, click@20, click@30, click@40, view@40
    assert got == {("view", "click"): 1, ("click", "click"): 2,
                   ("click", "view"): 1}


def test_rate_cusum_change_point(spark):
    """CUSUM closed form: a rate upshift scores B*shift*duration with the
    peak at the shift's end; zero-filled gap minutes count as evidence;
    flat types score low; ties break to the earliest bucket."""
    import datetime as dt

    from grower_spark.operators.anomaly import rate_cusum

    base = dt.datetime(2024, 1, 1)
    rows = []
    for m, c in enumerate([1, 1, 5, 5]):       # A: 1/min then 5/min
        rows += [("A", base + dt.timedelta(minutes=m, seconds=i))
                 for i in range(c)]
    for m, c in [(0, 2), (2, 2)]:              # B: flat with a gap minute
        rows += [("B", base + dt.timedelta(minutes=m, seconds=i))
                 for i in range(c)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: tuple(r)[1:] for r in rate_cusum(ev, 60).collect()}
    # A: devs 4c-12 = [-8,-8,8,8]; P=[-8,-16,-8,0]; S=[0,0,8,16]
    assert got["A"] == (4, 12, 16, int(base.timestamp()) + 180)
    # B: devs 3c-4 = [2,-4,2]; S=[2,0,2]; tie -> earliest bucket
    assert got["B"] == (3, 4, 2, int(base.timestamp()))


def test_rate_cusum_floors_negative_epoch_buckets(spark):
    """Bucket truncation must FLOOR, not truncate toward zero: pre-1970
    timestamps (negative epoch seconds) otherwise bucket differently from
    the oracle's `//` (ADVICE r7).  ts=-61s belongs to bucket -120, not
    -60."""
    import datetime as dt

    from grower_spark.operators.anomaly import rate_cusum

    utc = dt.timezone.utc
    rows = [
        ("X", dt.datetime(1969, 12, 31, 23, 58, 59, tzinfo=utc)),  # -61s
        ("X", dt.datetime(1969, 12, 31, 23, 59, 59, tzinfo=utc)),  # -1s
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: tuple(r)[1:] for r in rate_cusum(ev, 60).collect()}
    # floor: buckets -120 and -60 (trunc would give -60 and 0); devs are
    # 2*1-2 = 0 everywhere -> cusum 0, peak at the earliest bucket -120
    assert got["X"] == (2, 2, 0, -120)
    # and the ORACLE's pmod identity floors identically (DuckDB's bare
    # integer // truncates — probed r8: (-7)//2 = -3 — so the oracle
    # uses the same x - ((x % m) + m) % m form; pin both engines here)
    import duckdb

    bk = ("(x - ((x % 60000000) + 60000000) % 60000000) // 1000000")
    assert duckdb.sql(
        f"SELECT {bk} FROM (VALUES (-61000000), (-1000000)) t(x) ORDER BY 1"
    ).fetchall() == [(-120,), (-60,)]


def test_cusum_and_retention_ignore_null_rows(spark):
    """NULL timestamps/keys carry no evidence: both operators must emit
    the same result with and without NULL rows mixed in."""
    import datetime as dt

    import pyspark.sql.functions as F

    from grower_spark.operators.anomaly import rate_cusum
    from grower_spark.operators.retention import retention_cohorts

    base = dt.datetime(2024, 1, 1)
    clean = [( "A", base + dt.timedelta(minutes=m)) for m in range(4)]
    dirty = clean + [("A", None), (None, base)]
    ev_c = spark.createDataFrame(clean, "event_type string, ts timestamp")
    ev_d = spark.createDataFrame(dirty, "event_type string, ts timestamp")
    assert sorted(map(tuple, rate_cusum(ev_c, 60).collect())) == \
        sorted(map(tuple, rate_cusum(ev_d, 60).where(
            F.col("event_type").isNotNull()).collect()))

    r_clean = [(1, base), (1, base + dt.timedelta(days=7)), (2, base)]
    r_dirty = r_clean + [(1, None), (None, base)]
    rc = spark.createDataFrame(r_clean, "user_id long, ts timestamp")
    rd = spark.createDataFrame(r_dirty, "user_id long, ts timestamp")
    assert sorted(map(tuple, retention_cohorts(rc).collect())) == \
        sorted(map(tuple, retention_cohorts(rd).collect()))


def test_winsorize_and_robust_stats(spark):
    from grower_spark.operators.robust import robust_stats, winsorize

    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]] + [
        ("b", 5)] * 6
    df = spark.createDataFrame(rows, "g string, v long")
    w = {(r["g"], r["v"]): r["v_winsor"]
         for r in winsorize(df, "v", "g", 0.10, 0.90).collect()}
    # a: p10/p90 interpolated over 1..9,1000 -> extremes clamped inward
    assert w[("a", 1000)] < 1000 and w[("a", 1)] > 1
    assert w[("b", 5)] == 5  # constant group: clamp is identity
    rs = {r["g"]: r.asDict() for r in robust_stats(df, "v", "g").collect()}
    # a: med 5.5, MAD 2.5 -> only 1000 exceeds 3*MAD
    assert rs["a"]["med"] == 5.5 and rs["a"]["mad"] == 2.5
    assert rs["a"]["n_outliers"] == 1
    # b: MAD 0 -> flags nothing, not everything
    assert rs["b"]["mad"] == 0.0 and rs["b"]["n_outliers"] == 0


def test_source_overlap_matrix_hand_computed(spark):
    """Shingle-overlap matrix: shared distinct 3-grams and integer-bp
    Jaccard per lexicographically ordered source pair; short docs
    contribute their full token join; disjoint pairs are absent."""
    from grower_spark.operators.overlap import source_overlap_matrix

    rows = [
        # A grams: {a b c, b c d} ; B shares "b c d" plus own "c d e"
        (1, "a b c d", "A"),
        (2, "b c d e", "B"),
        # C: a short doc -> one gram "a b", shared with nobody's grams
        (3, "a b", "C"),
        # D: duplicates A's text -> same gram set as A
        (4, "a b c d", "D"),
        (5, None, "A"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): (r["n_shared_grams"], r["jaccard_bp"])
           for r in source_overlap_matrix(docs, shingle_n=3).collect()}
    # |A|=2 |B|=2 |D|=2: A∩B={b c d} -> 1/(2+2-1)=3333bp; A∩D full -> 10000
    assert got == {
        ("A", "B"): (1, 3333),
        ("B", "D"): (1, 3333),
        ("A", "D"): (2, 10000),
    }


def test_kmeans_quantized_hand_computed(spark):
    """Two Lloyd passes, hand-checked: integer-micro quantization, floored
    integer centroid means (negative components exercise the floor), seed
    order by id, (dist, cid) tie to the lower cluster."""
    from grower_spark.operators.clustering import kmeans_quantized

    rows = [
        (1, [0.0, 0.0]),     # seed cid=0
        (2, [10.0, 10.0]),   # seed cid=1
        (3, [1.0, 1.0]),     # -> cid 0
        (4, [9.0, 9.0]),     # -> cid 1
        (5, [-1.0, -1.0]),   # -> cid 0 (negative sums hit the floor path)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["cluster"], r["dist_sq_q"])
           for r in kmeans_quantized(emb, k=2, n_iter=2).collect()}
    # pass 1: {1,3,5} -> c0, {2,4} -> c1
    # update: c0 = floor(0/3), floor(0/3) = (0, 0); c1 = (9.5e6, 9.5e6)
    # pass 2 distances from c0=(0,0): v1=0, v3=2e12, v5=2e12
    #   from c1=(9.5e6,...): v2=2*(0.5e6)^2=5e11, v4=5e11
    assert out == {
        1: (0, 0),
        2: (1, 2 * 500_000 ** 2),
        3: (0, 2 * 1_000_000 ** 2),
        4: (1, 2 * 500_000 ** 2),
        5: (0, 2 * 1_000_000 ** 2),
    }
    # k > distinct points: cluster 2's seed duplicates nobody; a cluster
    # that captures no points keeps its seed centroid (no crash, no NaN)
    out3 = kmeans_quantized(emb, k=5, n_iter=3)
    assert out3.count() == 5


def test_kmeans_floored_negative_mean(spark):
    """A cluster whose component sum is negative and not divisible by its
    size must floor (Python // semantics == the oracle's pmod identity):
    sum=-3 over 2 members -> -2, not -1."""
    from grower_spark.operators.clustering import kmeans_quantized

    # seeds are the k LOWEST ids (1 and 2); doc 3 joins seed 1's cluster
    rows = [(1, [0.0]), (2, [10.0]), (3, [-0.000003])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in kmeans_quantized(emb, k=2, n_iter=2).collect()}
    # pass1: {1, 3} -> c0 (sum -3, mean -2 floored), {2} -> c1
    # pass2: v3 at -3 vs c0 at -2 -> dist 1
    assert out[3]["cluster"] == 0 and out[3]["dist_sq_q"] == 1


def test_keep_best_per_cluster(spark):
    """Per-cluster argmax by quality, ties to the lowest id; singletons
    keep themselves; the audit includes every doc."""
    from grower_spark.operators.dedup import keep_best_per_cluster

    docs = spark.createDataFrame(
        [(1, 2), (2, 4), (3, 4), (9, 1)], "doc_id long, q int"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["doc_id"]: (r["cluster_id"], r["kept"])
           for r in keep_best_per_cluster(docs, pairs, "q").collect()}
    # cluster {1,2,3}: best q=4 tie between 2 and 3 -> 2 kept; 9 singleton
    assert got == {1: (1, 0), 2: (1, 1), 3: (1, 0), 9: (9, 1)}


def test_ngram_novelty_hand_computed(spark):
    """df-1 gram share: doc grams unique in the corpus vs shared; short
    docs contribute their full join; NULL text absent."""
    from grower_spark.operators.text import ngram_novelty

    rows = [
        (1, "a b c d"),    # grams {a b c, b c d}: "a b c" shared with 2
        (2, "a b c x"),    # grams {a b c, b c x}
        (3, "zz yy"),      # short: one gram "zz yy", unique
        (4, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_unique_grams"], r["novelty_bp"])
           for r in ngram_novelty(docs, shingle_n=3).collect()}
    assert got == {1: (2, 1, 5000), 2: (2, 1, 5000), 3: (1, 1, 10000)}


def test_top_terms_tfidf_hand_computed(spark):
    """TF-IDF keyword extraction: ubiquitous terms score 0, rare terms
    rank by tf * floor(ln(N/df)*1e6), ties on the term string."""
    import math

    from grower_spark.operators.text import top_terms_tfidf

    rows = [
        (1, "common rare rare"),
        (2, "common other"),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["score_micro"])
           for r in top_terms_tfidf(docs, k=2).collect()}
    half = math.floor(math.log(2.0) * 1e6)  # df=1 of N=2
    # doc1: rare tf=2 score 2*half; common df=2 -> idf 0
    assert got[(1, 1)] == ("rare", 2, 2 * half)
    assert got[(1, 2)] == ("common", 1, 0)
    assert got[(2, 1)] == ("other", 1, half)
    assert got[(2, 2)] == ("common", 1, 0)
    assert len(got) == 4


def test_top_event_paths_hand_computed(spark):
    """Path mining: consecutive type triples in (ts, type) order, counted
    globally, ranked (count desc, path asc); partial windows excluded."""
    from grower_spark.operators.retention import top_event_paths

    rows = [
        (1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (1, 40, "b"),
        (2, 10, "a"), (2, 20, "b"), (2, 30, "c"),
        (3, 10, "x"), (3, 20, "y"),  # too short for a triple
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, event_type string")
    got = [(r["rank"], r["path"], r["n"])
           for r in top_event_paths(ev, length=3, k=10).collect()]
    # a>b>c twice (users 1, 2); b>c>b once (user 1)
    assert got == [(1, "a>b>c", 2), (2, "b>c>b", 1)]


def test_kmeans_representatives_top_m(spark):
    """Per-cluster top-m by centrality, ties to the lowest id; a cluster
    with fewer than m members yields them all."""
    from grower_spark.operators.clustering import kmeans_representatives

    rows = [
        (1, [0.0]), (2, [10.0]),           # seeds
        (3, [0.1]), (4, [0.2]), (5, [9.9]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_representatives(emb, k=2, n_iter=1, m=2)
    got = {(r["cluster"], r["rank"]): r["vec_id"] for r in out.collect()}
    # c0 members {1,3,4} dist 0, .1^2, .2^2 -> top2 = 1, 3
    # c1 members {2,5} dist 0, .1^2 -> 2, 5
    assert got == {(0, 1): 1, (0, 2): 3, (1, 1): 2, (1, 2): 5}


def test_funnel_step_times_hand_computed(spark):
    """Advance times follow the greedy/min-chain: per step, count of
    users reaching it and the discrete median gap from the previous
    step; steps nobody reaches are absent."""
    from grower_spark.operators.funnel import funnel_step_times

    rows = [
        # u1: view@10 click@30 purchase@70 -> gaps 20, 40
        (1, 10, "view"), (1, 30, "click"), (1, 70, "purchase"),
        # u2: view@10 click@20 -> gap 10
        (2, 10, "view"), (2, 20, "click"),
        # u3: only a view
        (3, 10, "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_ns long, event_type string")
    got = {r["step"]: (r["step_name"], r["n_reached"], r["p50_gap"])
           for r in funnel_step_times(ev, ["view", "click", "purchase"]).collect()}
    # click gaps {20, 10}: percentile_disc(0.5) picks 10 (first value at
    # cum dist >= 0.5 of 2 rows); purchase gap {40}
    assert got == {2: ("click", 2, 10), 3: ("purchase", 1, 40)}


def test_active_user_stats_hand_computed(spark):
    """DAU/WAU panel: trailing-window distinct via window-end explosion;
    gap days appear with dau 0 but non-empty trailing window; stickiness
    is integer bp."""
    import datetime as dt

    from grower_spark.operators.retention import active_user_stats

    utc = dt.timezone.utc

    def ts(d, h=12):
        return dt.datetime(2024, 1, d, h, tzinfo=utc)

    rows = [
        (1, ts(1)), (2, ts(1)),           # day 1: users {1,2}
        (1, ts(2)), (1, ts(2, 13)),       # day 2: {1} (dup event same day)
        (3, ts(5)),                       # days 3-4: nobody
        (None, ts(5)),                    # NULL user ignored
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["day"]: (r["dau"], r["wau"], r["stickiness_bp"])
           for r in active_user_stats(ev, window_days=3).collect()}
    assert got == {
        "2024-01-01": (2, 2, 10000),
        "2024-01-02": (1, 2, 5000),   # window {1,2} from day1 + {1}
        "2024-01-03": (0, 2, 0),      # trailing {1,2}
        "2024-01-04": (0, 1, 0),      # trailing {1} from day2
        "2024-01-05": (1, 1, 10000),
    }


def test_kmeans_deterministic_under_repartition(spark):
    """The whole point of the quantized design: layout must not change a
    single assignment or distance (no float accumulation-order drift,
    total tie orders everywhere)."""
    from grower_spark.operators.clustering import kmeans_quantized

    rows = [(i, [((i * 37) % 11) / 3.0, ((i * 53) % 7) / 2.0])
            for i in range(1, 200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted(tuple(r) for r in kmeans_quantized(emb, k=4, n_iter=3).collect())
    b = sorted(
        tuple(r)
        for r in kmeans_quantized(emb.repartition(13), k=4, n_iter=3).collect()
    )
    assert a == b


def test_kmeans_np_assign_parity(spark):
    """The vectorized int64 assignment kernel (assigner='np') must be
    BIT-IDENTICAL to the literal-centroid Catalyst fold — same clusters,
    same exact squared distances, same first-min tie resolution — on
    real testdata embeddings across a multi-iteration fit (centroid
    trajectories must match too, or the final assignment diverges)."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.clustering import kmeans_quantized

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    hof = {r["vec_id"]: (r["cluster"], r["dist_sq_q"])
           for r in kmeans_quantized(emb, k=7, n_iter=3).collect()}
    np_ = {r["vec_id"]: (r["cluster"], r["dist_sq_q"])
           for r in kmeans_quantized(emb, k=7, n_iter=3,
                                     assigner="np").collect()}
    assert hof == np_
    assert len(hof) == 500


def test_bm25_topk_hand_computed(spark):
    """Exact integer BM25 against an independent python recomputation:
    idf on (N, df), the k1=1.2/b=0.75 ratio as the integer form
    22*tf*S / (10*tf*S + 3*S + 9*dl*N), absent query terms score
    nothing, ranks tie to the lowest doc_id."""
    import math

    from grower_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a d"), (3, "e e e"), (4, None)],
        "doc_id long, text string",
    )
    got = {(r["qid"], r["doc_id"]): (r["score_micro"], r["rank"])
           for r in bm25_topk(docs, [(0, "a e zzz")], k=10).collect()}

    N, S = 3, 9
    def idf_micro(df_):
        return math.floor(math.log((N - df_ + 0.5) / (df_ + 0.5) + 1) * 1e6)
    def term(df_, tf, dl):
        return (idf_micro(df_) * 22 * tf * S) // (10 * tf * S + 3 * S + 9 * dl * N)

    exp = {
        (0, 1): term(2, 2, 4),   # 'a' in doc 1
        (0, 2): term(2, 1, 2),   # 'a' in doc 2
        (0, 3): term(1, 3, 3),   # 'e' in doc 3
    }
    ranked = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0][1]))
    expected = {key: (score, i + 1) for i, (key, score) in enumerate(ranked)}
    assert got == expected
    # doc 3 is the clear winner: rare term, high tf, short doc
    assert got[(0, 3)][1] == 1


def test_cluster_balanced_sample(spark):
    """Strict balance: every cluster contributes exactly min-cluster-size
    members; per_cluster>0 caps instead; selection is md5-deterministic
    (stable across runs/partitionings) and never oversamples."""
    from grower_spark.operators.sampling import cluster_balanced_sample

    assigned = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(i, 1) for i in range(100, 103)]
        + [(i, 2) for i in range(200, 206)],
        "vec_id long, cluster int",
    )
    out = cluster_balanced_sample(assigned).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r["cluster"], []).append(r["vec_id"])
    # smallest cluster has 3 -> every cluster keeps exactly 3
    assert {c: len(v) for c, v in by_c.items()} == {0: 3, 1: 3, 2: 3}
    # deterministic: a repartitioned rerun picks the SAME members
    out2 = cluster_balanced_sample(assigned.repartition(7)).collect()
    assert {(r["vec_id"], r["cluster"]) for r in out2} == \
        {(r["vec_id"], r["cluster"]) for r in out}
    # capped mode
    capped = cluster_balanced_sample(assigned, per_cluster=5).collect()
    counts = {}
    for r in capped:
        counts[r["cluster"]] = counts.get(r["cluster"], 0) + 1
    assert counts == {0: 5, 1: 3, 2: 5}


def test_select_within_token_budget(spark):
    """Row-identical to the global (quality DESC, id ASC) greedy prefix:
    whole strata above the boundary keep, the boundary stratum keeps its
    in-order prefix, everything after the first overflow drops (even
    docs that would individually fit)."""
    from grower_spark.operators.sampling import select_within_token_budget

    docs = spark.createDataFrame(
        [(1, 3, 10), (2, 3, 5), (3, 2, 10), (4, 2, 4), (5, 1, 100)],
        "doc_id long, quality_score int, n_tokens int",
    )

    def run(budget):
        return {r["doc_id"]: r["cum_tokens"]
                for r in select_within_token_budget(docs, budget).collect()}

    assert run(27) == {1: 10, 2: 15, 3: 25}   # boundary mid-stratum
    assert run(15) == {1: 10, 2: 15}          # boundary stratum all-drop
    assert run(9) == {}                        # prefix: doc 2 fits but is
    #                                            behind the overflowing doc 1
    assert run(1_000_000) == {1: 10, 2: 15, 3: 25, 4: 29, 5: 129}  # all fit
