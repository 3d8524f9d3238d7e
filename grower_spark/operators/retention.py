"""Cohort retention analysis: the second classic product-analytics
question after the funnel — of users whose FIRST activity fell in week
W (their cohort), how many were active again k weeks later?

Plan shape: first-activity per user is one user-keyed aggregation; the
(user, week) activity set is a distinct over truncated timestamps whose
shuffle carries two small values per active user-week; the final
(cohort, offset) rollup is cohort-cardinality.  Nothing scales with raw
event count past the first map-side truncation, and every aggregation
has map-side partial combining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention counts.

    Output: ``(cohort_week, week_offset, n_users)`` — users whose first
    activity was in ``cohort_week`` (ISO Monday, yyyy-MM-dd string for a
    flat cross-engine contract) and who were active in
    ``cohort_week + week_offset`` weeks (offset 0 = the cohort size
    itself; offsets only appear where n_users > 0).
    """
    wk = F.date_trunc("week", F.col(ts_col))
    # NULL timestamps carry no activity evidence: dropping them up front
    # keeps every emitted (cohort, offset) cell well-defined (a NULL week
    # would otherwise surface as a NULL-offset row)
    act = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(F.col(user_col).alias("user_id"), wk.alias("week")).distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort"))
    joined = act.join(first, "user_id").select(
        "cohort",
        (F.datediff(F.col("week"), F.col("cohort")) / 7).cast("int").alias(
            "week_offset"
        ),
    )
    return joined.groupBy("cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_users",
    )


def active_user_stats(events: DataFrame, window_days: int = 7,
                      user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """DAU / WAU / stickiness: per calendar day, the distinct active
    users that day, the distinct users active in the trailing
    ``window_days`` window, and the stickiness ratio (DAU/WAU in basis
    points) — the standard engagement panel.

    The trailing-window distinct is computed WITHOUT a distinct-over-
    window (which Spark cannot do) or a day-range self-join: each
    (user, day) activity row explodes into the ``window_days`` window
    ends it contributes to, then one distinct+count per window end —
    linear in activity rows × window size, never events².  Days inside
    the span with no activity still appear (their trailing window can be
    non-empty); stickiness is 0 where WAU is 0.

    Output: ``(day yyyy-MM-dd string, dau bigint, wau bigint,
    stickiness_bp bigint)``.
    """
    if window_days <= 0:
        raise ValueError("window_days must be positive")
    act = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    ).select(
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(user_col).alias("user_id"),
    ).distinct()
    bounds = act.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day"), F.col("hi")
    )
    dau = act.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    trail = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", window_days - 1))
        ).alias("day"),
    ).distinct()
    wau = trail.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    out = (
        spine.join(dau, "day", "left")
        .join(wau, "day", "left")
        .where(F.col("day") <= F.col("hi"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("dau"), F.lit(0)).cast("long").alias("dau"),
            F.coalesce(F.col("wau"), F.lit(0)).cast("long").alias("wau"),
        )
    )
    return out.withColumn(
        "stickiness_bp",
        F.when(
            F.col("wau") > 0, F.expr("(dau * 10000) div wau")
        ).otherwise(F.lit(0)).cast("long"),
    )


def top_event_paths(events: DataFrame, length: int = 3, k: int = 20,
                    user_col: str = "user_id", ts_col: str = "ts_ns",
                    type_col: str = "event_type") -> DataFrame:
    """Top-k most common ``length``-step event SEQUENCES across all
    users — path mining, the order-sensitive generalization of the
    transition matrix ("what journeys happen", not just "what happens
    next").  Paths are consecutive event-type windows within a user's
    (ts, type)-ordered stream (the pinned tie order), joined with
    ``>``, and ranked by (count DESC, path ASC) so the report is total.

    One shuffle (the user-keyed lag window); the path rollup has at most
    type^length cardinality with map-side partials, and the final top-k
    sorts that bounded set.

    Output: ``(rank int, path string, n bigint)``.
    """
    from pyspark.sql import Window

    if length < 2:
        raise ValueError("length must be >= 2")
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(type_col))
    steps = [F.col(type_col)] + [
        F.lag(F.col(type_col), i).over(w) for i in range(1, length)
    ]
    # steps[length-1] is the OLDEST event of the window; join oldest-first
    path = F.concat_ws(">", *reversed(steps))
    seq = events.select(
        path.alias("path"),
        steps[length - 1].isNotNull().alias("_full"),
    ).where(F.col("_full"))
    counts = seq.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counts.withColumn("rank", F.row_number().over(wr).cast("int"))
        .where(F.col("rank") <= k)
        .select("rank", "path", "n")
    )


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts_ns",
                      type_col: str = "event_type") -> DataFrame:
    """First-order event-transition matrix: counts of consecutive
    ``(from_type, to_type)`` pairs within each user's time-ordered event
    stream — the Markov view behind "what do users do next" path
    reports.

    One shuffle (the per-user lag window, keyed by user); the transition
    rollup that follows is type²-cardinality with partial aggregation.
    Ties on the timestamp are ordered by (ts, type) so the sequence —
    and therefore the matrix — is total and reproducible.

    Output: ``(from_type, to_type, n)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(type_col))
    seq = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(type_col).alias("to_type"),
        F.lag(F.col(type_col)).over(w).alias("from_type"),
    ).where(F.col("from_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
