"""Funnel analysis: ordered step progression per user.

The product-analytics question a log-analytics engine's users ask first:
of everyone who did step 1 (view), how many went on to step 2 (click),
then step 3 (purchase) — with steps required to happen in order, each
STRICTLY after the previous one.

Plan shape (the 100 TB story): filter to step events (map-side, pushed
to the scan), ONE shuffle grouping by user, sort each user's events as
an in-memory array (per-user event counts are session-scale, not
corpus-scale), then a single left-to-right fold computing the reached
depth — no joins, no per-step passes, no window functions.  The k-pass
alternative (one min-aggregation per step, joined back) costs k
shuffles; this costs one regardless of funnel length.

Equivalent closed form (the oracle): t1 = min ts of step 1,
t2 = min ts of step 2 with ts > t1, ... — the fold reaches depth k iff
the min-chain has t_k non-NULL (strictly-after ties excluded by both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# sentinel earlier than any real epoch value; the first step's
# strictly-after check is vacuously true against it
_T_NEG_INF = -(1 << 62)


def funnel_depth(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts_ns",
                 type_col: str = "event_type") -> DataFrame:
    """Per-user funnel depth: how many of ``steps`` (in order, each
    strictly after the previous) the user completed.  Users present in
    ``events`` but with no step events score 0.

    Output: ``(user_id, funnel_depth int)``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    users = events.select(F.col(user_col).alias("user_id")).distinct()
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(type_col).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("_seq")
    )
    init = F.struct(
        F.lit(0).alias("d"), F.lit(_T_NEG_INF).cast("long").alias("t")
    )

    def step(acc, x):
        advance = (
            (acc.d < F.lit(len(steps)))
            & (x.e == F.element_at(steps_arr, acc.d + 1))
            & (x.t > acc.t)
        )
        return F.when(
            advance, F.struct((acc.d + 1).alias("d"), x.t.alias("t"))
        ).otherwise(acc)

    depth = F.aggregate(F.col("_seq"), init, step).getField("d")
    scored = seq.select("user_id", depth.alias("funnel_depth"))
    return users.join(scored, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("funnel_depth"), F.lit(0)).cast("int").alias(
            "funnel_depth"
        ),
    )


def sessionized_funnel_depth(events: DataFrame, steps: list[str],
                             gap: int, user_col: str = "user_id",
                             ts_col: str = "ts_ns",
                             type_col: str = "event_type") -> DataFrame:
    """Funnel depth within gap-based sessions: the funnel unit becomes
    (user, session) rather than the user's whole history — "did the user
    view→click→purchase within one sitting", the form product analytics
    actually reports.  A new session starts after more than ``gap``
    inactivity (same units as ``ts_col``); session boundaries consider
    ALL the user's events (a non-step event keeps a session alive), and
    every session appears in the output, depth 0 if its step events
    don't chain.

    Plan: ONE shuffle total — the user-keyed lag/running-sum window
    assigns session sequence numbers, and the per-(user, session) fold
    aggregation reuses that hash-partitioning (grouping key is a
    superset of the partition key).  Non-step events ride through the
    fold without advancing it, so no second pass or spine join is
    needed.  Per-session arrays are sitting-sized — bounded by human
    activity, not corpus growth.

    Output: ``(user_id, session_seq bigint, n_events bigint,
    funnel_depth int)``.
    """
    from pyspark.sql import Window

    if not steps:
        raise ValueError("steps must be non-empty")
    if gap <= 0:
        raise ValueError("gap must be positive")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(type_col).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("t")
    gapped = ev.withColumn("_prev", F.lag("t").over(w)).withColumn(
        "_new",
        (F.col("_prev").isNull() | (F.col("t") - F.col("_prev") > gap))
        .cast("int"),
    )
    sess = gapped.withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    seq = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("_seq"),
    )
    init = F.struct(
        F.lit(0).alias("d"), F.lit(_T_NEG_INF).cast("long").alias("t")
    )

    def step(acc, x):
        advance = (
            (acc.d < F.lit(len(steps)))
            & (x.e == F.element_at(steps_arr, acc.d + 1))
            & (x.t > acc.t)
        )
        return F.when(
            advance, F.struct((acc.d + 1).alias("d"), x.t.alias("t"))
        ).otherwise(acc)

    depth = F.aggregate(F.col("_seq"), init, step).getField("d")
    return seq.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        depth.cast("int").alias("funnel_depth"),
    )


def funnel_step_times(events: DataFrame, steps: list[str],
                      user_col: str = "user_id", ts_col: str = "ts_ns",
                      type_col: str = "event_type") -> DataFrame:
    """Funnel TIMING: for each step k >= 2, how many users reached it and
    the exact median time from the previous step (``percentile_disc`` —
    a real data value, discrete-percentile ties identical on both
    engines).  The same single-fold pass as ``funnel_depth``, but the
    accumulator carries the chain's advance TIMES (greedy
    earliest-advance == the min-chain closed form, inductively), so the
    per-user output is the time vector and the report is a
    step-cardinality rollup over per-step gaps.

    Output: ``(step int, step_name, n_reached bigint,
    p50_gap bigint)`` — gaps in ``ts_col`` units, one row per step
    2..len(steps), absent if no user reached the step.
    """
    if len(steps) < 2:
        raise ValueError("steps must have at least 2 entries")
    steps_arr = F.array(*[F.lit(s) for s in steps])
    ev = events.where(F.col(type_col).isin(list(steps))).select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).cast("long").alias("t"),
        F.col(type_col).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "e"))).alias("_seq")
    )
    init = F.struct(
        F.array().cast("array<long>").alias("ts"),
        F.lit(_T_NEG_INF).cast("long").alias("t"),
    )

    def step(acc, x):
        d = F.size(acc.ts)
        advance = (
            (d < F.lit(len(steps)))
            & (x.e == F.element_at(steps_arr, d + 1))
            & (x.t > acc.t)
        )
        return F.when(
            advance,
            F.struct(
                F.concat(acc.ts, F.array(x.t)).alias("ts"), x.t.alias("t")
            ),
        ).otherwise(acc)

    times = F.aggregate(F.col("_seq"), init, step).getField("ts")
    per_user = seq.select(times.alias("_ts"))
    ks = F.explode(F.sequence(F.lit(2), F.lit(len(steps)))).alias("step")
    gaps = per_user.select("_ts", ks).where(
        F.size("_ts") >= F.col("step")
    ).select(
        "step",
        (F.element_at("_ts", F.col("step"))
         - F.element_at("_ts", F.col("step") - 1)).alias("_gap"),
    )
    return (
        gaps.groupBy("step")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_reached"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY _gap)")
            .cast("long").alias("p50_gap"),
        )
        .select(
            F.col("step").cast("int").alias("step"),
            F.element_at(steps_arr, F.col("step")).alias("step_name"),
            "n_reached", "p50_gap",
        )
    )


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts_ns",
                  type_col: str = "event_type") -> DataFrame:
    """The funnel report: for each step k (1-based), how many users
    reached AT LEAST that depth — the strictly decreasing sequence a
    funnel chart plots.  One extra tiny aggregation over the per-user
    depths (user-cardinality input).

    Output: ``(step int, step_name, n_users)`` ordered by step.
    """
    depths = funnel_depth(events, steps, user_col, ts_col, type_col)
    k = F.explode(F.sequence(F.lit(1), F.lit(len(steps)))).alias("step")
    reached = depths.select("user_id", "funnel_depth", k).where(
        F.col("funnel_depth") >= F.col("step")
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    return (
        reached.groupBy("step")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            "step",
            F.element_at(steps_arr, F.col("step")).alias("step_name"),
            "n_users",
        )
        .orderBy("step")
    )
