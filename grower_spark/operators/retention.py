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


def user_lifecycle(events: DataFrame, user_col: str = "user_id",
                   ts_col: str = "ts") -> DataFrame:
    """Weekly growth accounting: every active user-week is classified as
    ``new`` (first-ever week), ``retained`` (also active the immediately
    preceding week) or ``resurrected`` (active before, but not last
    week); ``churned`` counts users active in week w-1 but not in w.
    This is the standard new/retained/resurrected/churned panel that
    decomposes WAU change week over week.

    Plan shape — ONE pass, three shuffles, no self-join and no
    recomputed subtree: a distinct over (user, monday-truncated week)
    is the only stage that sees raw events (map-side partials); one
    user-keyed lag/lead window classifies each active week AND emits
    the churn marker for week w+7 from the same rows (explode of a
    2-struct array, map-side); one week-keyed rollup with four
    conditional sums produces the panel.  Churn is censored at the
    corpus max week via a 1-row broadcast bound computed from a
    column-pruned scan of the raw timestamps (cheaper than recomputing
    the distinct a second time).

    Output: ``(week yyyy-MM-dd string, n_new, n_retained,
    n_resurrected, n_churned)`` — a row for every week with any
    non-zero count, zeros filled elsewhere.
    """
    from pyspark.sql import Window

    week7 = F.expr("INTERVAL 7 DAYS")
    clean = events.where(
        F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
    )
    act = clean.select(
        F.col(user_col).alias("user_id"),
        F.date_trunc("week", F.col(ts_col)).alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    seq = act.select(
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
    )
    status = (
        F.when(F.col("prev_week").isNull(), F.lit("new"))
        .when(F.col("prev_week") == F.col("week") - week7, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    churned_next = (
        F.col("next_week").isNull()
        | (F.col("next_week") > F.col("week") + week7)
    )
    marks = seq.select(
        F.explode(
            F.array(
                F.struct(F.col("week").alias("wk"), status.alias("st")),
                F.struct(
                    (F.col("week") + week7).alias("wk"),
                    F.when(churned_next, F.lit("churned")).alias("st"),
                ),
            )
        ).alias("m")
    ).select("m.wk", "m.st").where(F.col("st").isNotNull())
    # censor churn markers past the corpus max week: 1-row bound from a
    # ts-only scan of the raw table, broadcast and filtered map-side
    max_week = clean.agg(
        F.date_trunc("week", F.max(ts_col)).alias("max_week")
    )
    kept = marks.crossJoin(F.broadcast(max_week)).where(
        (F.col("st") != "churned") | (F.col("wk") <= F.col("max_week"))
    )
    counts = kept.groupBy("wk").agg(
        *[
            F.sum(F.when(F.col("st") == s, 1).otherwise(0))
            .cast("long").alias(f"n_{s}")
            for s in ("new", "retained", "resurrected", "churned")
        ]
    )
    return counts.select(
        F.date_format("wk", "yyyy-MM-dd").alias("week"),
        "n_new", "n_retained", "n_resurrected", "n_churned",
    )


def value_deciles(events: DataFrame, n_buckets: int = 10,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """User-value decile segmentation: rank users by lifetime value and
    report per-decile population and value share — the "whale curve"
    behind pricing and prioritization questions.

    Values are fixed-point centi-units (``round(value*100)`` summed as
    BIGINT) so the per-user totals — and therefore the decile
    boundaries — are exact integers on every engine; a float sum's
    order-dependence could flip a boundary user between buckets.
    ``ntile`` runs over (total DESC, user_id ASC), a total order.

    Plan shape: one user-keyed aggregation (map-side partials) shrinks
    events to user cardinality; the rank over that user-sized table is
    the DISTRIBUTED exact global row_number (range repartition +
    per-partition offsets, operators/ranking.py) — an unpartitioned
    ``ntile`` window would drag every user through one partition, the
    classic scale-killer this module avoids.  NTILE bucket arithmetic
    is then a literal expression over the exact rank, matching the
    window-function semantics bucket for bucket.

    Output: ``(decile int, n_users bigint, sum_centis bigint,
    min_centis bigint, max_centis bigint)``.
    """
    from grower_spark.operators.ranking import (
        global_row_number, ntile_from_rank,
    )

    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    per_user = events.where(F.col(user_col).isNotNull()).groupBy(
        F.col(user_col).alias("user_id")
    ).agg(
        F.sum(F.round(F.col(value_col) * 100).cast("long"))
        .cast("long").alias("total_centis")
    )
    ranked_df, n_users = global_row_number(
        per_user, [F.desc("total_centis"), F.asc("user_id")], out_col="_rn"
    )
    if n_users == 0:
        ranked = ranked_df.withColumn("decile", F.lit(None).cast("int"))
    else:
        ranked = ranked_df.withColumn(
            "decile", ntile_from_rank(F.col("_rn"), n_users, n_buckets)
        )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("total_centis").cast("long").alias("sum_centis"),
        F.min("total_centis").cast("long").alias("min_centis"),
        F.max("total_centis").cast("long").alias("max_centis"),
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
