"""Unit tests for the r9 session-2 operators: lifecycle growth
accounting, value deciles, n-gram containment, density-vs-panel
outliers.  Each test pins the semantics on a small hand-computed frame
(the registry rows certify the same operators against DuckDB oracles
at sf0.01; these pin the EDGE semantics the synthetic tables may not
exercise)."""

import datetime

import pyspark.sql.functions as F


def _d(s):
    return datetime.datetime.fromisoformat(s)


def test_user_lifecycle_classification_and_churn(spark):
    from grower_spark.operators.retention import user_lifecycle

    # weeks: W1=2024-01-01, W2=01-08, W3=01-15, W4=01-22 (Mondays)
    rows = [
        # u1: active W1, W2, W4 -> new@W1, retained@W2, resurrected@W4,
        #     churn counted at W3 (gap) but NOT at W5 (censored: W4=max)
        (1, _d("2024-01-02 10:00")),
        (1, _d("2024-01-09 10:00")),
        (1, _d("2024-01-23 10:00")),
        # u2: active W1 only -> new@W1, churn@W2
        (2, _d("2024-01-03 08:00")),
        # u3: active W4 only -> new@W4, churn censored (W4=max week)
        (3, _d("2024-01-25 12:00")),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["week"]: r for r in user_lifecycle(ev).collect()}
    assert out["2024-01-01"]["n_new"] == 2
    assert out["2024-01-01"]["n_churned"] == 0
    w2 = out["2024-01-08"]
    assert (w2["n_new"], w2["n_retained"], w2["n_resurrected"]) == (0, 1, 0)
    assert w2["n_churned"] == 1  # u2 gone after W1
    w3 = out["2024-01-15"]
    assert (w3["n_new"], w3["n_retained"], w3["n_resurrected"]) == (0, 0, 0)
    assert w3["n_churned"] == 1  # u1's W2->W4 gap
    w4 = out["2024-01-22"]
    assert (w4["n_new"], w4["n_retained"], w4["n_resurrected"]) == (1, 0, 1)
    assert w4["n_churned"] == 0
    assert "2024-01-29" not in out  # censored at max week


def test_user_lifecycle_null_rows_dropped(spark):
    from grower_spark.operators.retention import user_lifecycle

    ev = spark.createDataFrame(
        [(1, _d("2024-01-02 10:00")), (None, _d("2024-01-02 11:00")),
         (2, None)],
        "user_id long, ts timestamp",
    )
    out = user_lifecycle(ev).collect()
    assert len(out) == 1 and out[0]["n_new"] == 1


def test_value_deciles_exact_fixed_point(spark):
    from grower_spark.operators.retention import value_deciles

    # 4 users into 4 buckets; ntile assigns one per bucket, ranked by
    # total desc then user_id
    rows = [(u, _d("2024-01-01 00:00"), v) for u, v in
            [(1, 1.005), (1, 2.0), (2, 10.0), (3, 0.10), (4, 0.10)]]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["decile"]: r for r in value_deciles(ev, n_buckets=4).collect()}
    # totals (centis): u1=100+200=300 (the double 1.005 is binary
    # 100.4999..x10^-2, so round() gives 100 on BOTH engines — the
    # fixed-point contract is only about the SUM being order-exact),
    # u2=1000, u3=10, u4=10; order: u2, u1, u3, u4 (tie by user_id)
    assert out[1]["sum_centis"] == 1000
    assert out[2]["sum_centis"] == 300
    assert out[3]["sum_centis"] == 10 and out[3]["n_users"] == 1
    assert out[4]["sum_centis"] == 10 and out[4]["n_users"] == 1


def test_containment_catches_subset_jaccard_misses(spark):
    from grower_spark.operators.dedup import (
        ngram_containment_pairs, ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally different text here")],
        "doc_id long, text string",
    )
    cont = ngram_containment_pairs(docs, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["id_a"], row["id_b"]) == (1, 2)
    # every shingle of the short doc appears in the long one
    assert row["cont_a_r4"] == 1.0 and row["cont_b_r4"] < 0.1
    # the symmetric metric scores the same pair far below any dedup bar
    jac = ngram_jaccard_pairs(docs, threshold=0.0).where(
        (F.col("id_a") == 1) & (F.col("id_b") == 2)
    ).collect()
    assert jac and jac[0]["jaccard_r4"] < 0.06


def test_density_vs_panel_flags_isolated_points(spark):
    from grower_spark.operators.similarity import density_vs_panel

    # cluster along +x (ids 0-3), one orthogonal outlier (id 9)
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.95, -0.05, 0.0]),
        (3, [1.0, 0.05, 0.0]),
        (9, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    panel = emb.where(F.col("vec_id").isin(0, 9)).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec")
    )
    out = {r["vec_id"]: r for r in
           density_vs_panel(emb, panel, tau=0.8).collect()}
    assert len(out) == 5
    # non-panel cluster members see panel point 0 close
    for vid in (1, 2, 3):
        assert out[vid]["n_close"] == 1 and out[vid]["is_outlier"] == 0
    # panel members only match themselves (excluded) -> both flagged;
    # the honest contract: density-vs-panel needs panel size >> 1 before
    # panel members' own rows are meaningful
    assert out[0]["n_close"] == 0 and out[0]["is_outlier"] == 1
    assert out[9]["n_close"] == 0 and out[9]["is_outlier"] == 1


def test_density_vs_panel_self_exclusion(spark):
    from grower_spark.operators.similarity import density_vs_panel

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    panel = emb.select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec")
    )
    out = {r["vec_id"]: r for r in
           density_vs_panel(emb, panel, tau=0.5).collect()}
    # each point's only close panel vector is itself -> excluded -> outlier
    assert out[0]["n_close"] == 0 and out[0]["is_outlier"] == 1
    assert out[1]["n_close"] == 0 and out[1]["is_outlier"] == 1


def test_density_twins_agree_on_null_vec_and_empty_panel(spark):
    """The r9-advice edges: a NULL corpus embedding yields (n_close=0,
    is_outlier=1) in BOTH twins (not NULL / not a crash), and an empty
    panel yields every corpus row with n_close=0 in BOTH twins (the HOF
    version used a row-destroying crossJoin)."""
    from grower_spark.operators.similarity import (
        density_vs_panel,
        density_vs_panel_np,
    )

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>",
    )
    panel = spark.createDataFrame(
        [(100, [1.0, 0.0])], "pid long, pvec array<float>"
    )
    for fn in (density_vs_panel, density_vs_panel_np):
        out = {r["vec_id"]: r for r in fn(emb, panel, tau=0.8).collect()}
        assert len(out) == 3, fn.__name__
        assert out[1]["n_close"] == 0 and out[1]["is_outlier"] == 1
        assert out[0]["n_close"] == 1 and out[0]["is_outlier"] == 0

    empty_panel = panel.where(F.lit(False))
    for fn in (density_vs_panel, density_vs_panel_np):
        out = {r["vec_id"]: r for r in fn(emb, empty_panel, tau=0.8).collect()}
        assert len(out) == 3, fn.__name__
        assert all(r["n_close"] == 0 and r["is_outlier"] == 1
                   for r in out.values())


def test_density_kernel_auto_dispatch(spark):
    """kernel='auto' must route by dim x panel_rows (DENSITY_NP_CUTOVER)
    and both routes must produce the same rows as the explicitly-pinned
    kernels on the same inputs."""
    import numpy as np

    from grower_spark.operators.similarity import (
        DENSITY_NP_CUTOVER,
        density_vs_panel,
    )

    rng = np.random.default_rng(7)
    dim = 64
    n_panel_big = DENSITY_NP_CUTOVER // dim + 8   # above cutover
    corpus = spark.createDataFrame(
        [(i, rng.standard_normal(dim).astype("float32").tolist())
         for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    big_panel = spark.createDataFrame(
        [(1000 + i, rng.standard_normal(dim).astype("float32").tolist())
         for i in range(n_panel_big)],
        "pid long, pvec array<float>",
    )
    small_panel = big_panel.where(F.col("pid") < 1016)  # 16 rows: below

    for panel, forced, marker in (
        (big_panel, "np", "MapInPandas"),
        (small_panel, "hof", "BroadcastNestedLoopJoin"),
    ):
        # r11: auto is OPT-IN (default flipped to the oracle-exact hof
        # per r10 advice), so the routing behavior needs the explicit arg
        routed = density_vs_panel(corpus, panel, tau=0.3, kernel="auto")
        # the route itself, not just its output: np renders MapInPandas,
        # hof a broadcast NLJ
        phys = routed._jdf.queryExecution().sparkPlan().toString()
        assert marker in phys, (forced, phys[:400])
        auto = sorted(tuple(r) for r in routed.collect())
        pinned = sorted(
            tuple(r) for r in
            density_vs_panel(corpus, panel, tau=0.3, kernel=forced).collect()
        )
        assert auto == pinned and len(auto) == 300

    import pytest

    with pytest.raises(ValueError, match="kernel"):
        density_vs_panel(corpus, small_panel, kernel="blas")


def test_global_row_number_matches_window(spark):
    """The distributed two-phase rank must equal the single-partition
    window row_number on the same total order, and the NTILE arithmetic
    must equal F.ntile, for several n/bucket shapes incl. remainders."""
    from pyspark.sql import Window

    from grower_spark.operators.ranking import (
        global_row_number, ntile_from_rank,
    )

    rows = [(i, (i * 37) % 101) for i in range(97)]  # ties impossible: id unique
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.desc("v"), F.asc("id")]
    ranked, total = global_row_number(df, order, out_col="rn", num_partitions=7)
    assert total == 97
    w = Window.orderBy(*order)
    expected = df.withColumn("rn_w", F.row_number().over(w)).withColumn(
        "nt_w", F.ntile(10).over(w)
    )
    joined = ranked.withColumn(
        "nt", ntile_from_rank(F.col("rn"), total, 10)
    ).join(expected, "id")
    bad = joined.where(
        (F.col("rn") != F.col("rn_w")) | (F.col("nt") != F.col("nt_w"))
    ).count()
    assert bad == 0


def test_global_row_number_empty_and_tiny(spark):
    from grower_spark.operators.ranking import (
        global_row_number, ntile_from_rank,
    )

    empty = spark.createDataFrame([], "id long, v long")
    out, total = global_row_number(empty, [F.asc("v"), F.asc("id")])
    assert total == 0 and out.count() == 0
    # fewer rows than buckets: bucket == rank (NTILE semantics)
    tiny = spark.createDataFrame([(1, 5), (2, 3)], "id long, v long")
    ranked, n = global_row_number(tiny, [F.desc("v"), F.asc("id")])
    res = ranked.withColumn("nt", ntile_from_rank(F.col("rn"), n, 10)).collect()
    by_id = {r["id"]: (r["rn"], r["nt"]) for r in res}
    assert by_id[1] == (1, 1) and by_id[2] == (2, 2)


def test_density_np_parity_with_hof(spark):
    """The BLAS density kernel must agree with the HOF fold row-for-row
    on real test embeddings (rounding boundary absence pinned here) and
    its plan must be shuffle-free."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.similarity import (
        density_vs_panel, density_vs_panel_np,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    panel = emb.where(F.col("vec_id") % 11 == 0).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec")
    )
    hof = density_vs_panel(emb, panel, tau=0.2)
    np_ = density_vs_panel_np(emb, panel, tau=0.2)
    assert np_.exceptAll(hof.select("vec_id", "n_close", "is_outlier")).count() == 0
    assert hof.exceptAll(np_).count() == 0
    plan = np_._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "np density must be fully map-side"


def test_density_np_empty_panel(spark):
    from grower_spark.operators.similarity import density_vs_panel_np

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    panel = emb.where(F.lit(False)).select(
        F.col("vec_id").alias("pid"), F.col("embedding").alias("pvec")
    )
    out = density_vs_panel_np(emb, panel).collect()
    assert out[0]["n_close"] == 0 and out[0]["is_outlier"] == 1


def test_corpus_diff_statuses_and_null_text(spark):
    from grower_spark.operators.diff import corpus_diff, corpus_diff_summary

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone"), (5, None), (6, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh"), (5, None), (6, "filled")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "added",
        5: "unchanged",  # NULL -> NULL is not a change
        6: "changed",    # NULL -> text IS (null-safe compare)
    }
    summary = {r["status"]: r["n_docs"]
               for r in corpus_diff_summary(old, new).collect()}
    assert summary == {"unchanged": 2, "changed": 2, "removed": 1, "added": 1}
