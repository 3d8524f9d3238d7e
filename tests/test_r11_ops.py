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
