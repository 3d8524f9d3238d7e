"""Rate change-point detection: one-sided CUSUM over bucketed event
counts — the monitoring question behind "when did this event type's
rate shift?"

The CUSUM recurrence ``S_k = max(0, S_{k-1} + dev_k)`` looks iterative,
but it has a closed window form: with ``P_k`` the prefix sum of
deviations, ``S_k = P_k - min_{j<=k} P_j`` — a running sum plus a
running min, both single-pass window functions over the same
(type-keyed) partitioning.  No recursion, no driver loop, and an exact
SQL twin for the oracle.

Deviations are integer cross-multiplied against the per-type mean
(``dev_k = B * c_k - total`` over B buckets), so every intermediate is
exact and order-independent — the events_outliers precedent.

Plan: one map-side bucket truncation, a per-type count aggregation
(bucket-cardinality), a per-type SPINE (sequence explode over the
type's observed span — zero-filled gaps are real evidence of a rate
drop), one window pass, one tiny per-type rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def rate_cusum(events: DataFrame, bucket_secs: int = 60,
               type_col: str = "event_type",
               ts_col: str = "ts") -> DataFrame:
    """Per event type: the maximum one-sided CUSUM of bucket-count
    deviations from that type's own mean rate, and the FIRST bucket
    achieving it (the change-point candidate; deterministic tie-break to
    the earliest bucket).

    ``cusum_max`` is in units of ``B * count`` (cross-multiplied by the
    bucket total to stay integer); ``peak_bucket`` is the epoch-second
    bucket start.  A type with a flat rate scores near 0; a sustained
    upward shift scores ~``B * shift * duration``.

    Output: ``(type_col, n_buckets, total, cusum_max, peak_bucket)``.
    """
    if bucket_secs <= 0:
        raise ValueError("bucket_secs must be positive")
    b = F.lit(bucket_secs)
    # integer end-to-end, FLOOR semantics: bucket starts must be
    # monotone in time, and truncation (`div` — and DuckDB's integer
    # `//` too, probed r8) makes the [-bucket, 0) window twice as wide
    # on pre-1970 timestamps.  `a - pmod(a, b)` is the exact floored
    # bucket start for any sign (pmod is always non-negative); the
    # oracle floors with the same identity.  ADVICE r7 (its claim that
    # DuckDB `//` floors was inverted — both engines needed the fix).
    bucket = F.expr(
        f"to_unix_timestamp({ts_col}) - pmod(to_unix_timestamp({ts_col}), {bucket_secs})"
    )
    # NULL timestamps/types can't be bucketed; dropping them up front
    # keeps the per-type totals consistent with the spine (a NULL-bucket
    # count row would inflate _total while never joining the spine)
    counts = (
        events.where(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
        .select(F.col(type_col).alias("_ty"), bucket.alias("_bk"))
        .groupBy("_ty", "_bk")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    span = counts.groupBy("_ty").agg(
        F.min("_bk").alias("_lo"), F.max("_bk").alias("_hi"),
        F.sum("_c").alias("_total"),
    )
    # zero-filled spine: every bucket in the type's span participates;
    # the bucket count is span arithmetic, not a second window pass
    spine = span.select(
        "_ty", "_total",
        ((F.col("_hi") - F.col("_lo")) / b + 1).cast("long").alias("_nb"),
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"), b)).alias("_bk"),
    )
    filled = spine.join(counts, ["_ty", "_bk"], "left").select(
        "_ty", "_bk", "_total", "_nb",
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
    )
    w = Window.partitionBy("_ty").orderBy("_bk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dev = F.col("_nb") * F.col("_c") - F.col("_total")
    # S_k = P_k - min(0, min_{j<=k} P_j): the empty prefix participates
    # (S_0 = 0), hence the least-with-zero around the running min.  Two
    # chained selects because a window over a window expression must
    # materialize the inner one first; both windows share the same
    # partitioning/ordering so Catalyst plans ONE Window node pair over
    # one sort, no extra exchange.
    prefixed = filled.select(
        "_ty", "_bk", "_total", "_nb", F.sum(dev).over(w).alias("_p")
    )
    scored = prefixed.select(
        "_ty", "_bk", "_total", "_nb",
        (F.col("_p") - F.least(F.lit(0), F.min("_p").over(w))).alias("_s"),
    )
    agg = scored.groupBy("_ty").agg(
        F.first("_nb").alias("n_buckets"),
        F.first("_total").alias("total"),
        F.max("_s").alias("cusum_max"),
        # earliest bucket attaining the max: min over (-S, bucket) structs
        F.min(F.struct((-F.col("_s")).alias("ns"), F.col("_bk").alias("bk"))).alias("_am"),
    )
    return agg.select(
        F.col("_ty").alias(type_col),
        F.col("n_buckets").cast("long"),
        F.col("total").cast("long"),
        F.col("cusum_max").cast("long"),
        F.col("_am.bk").cast("long").alias("peak_bucket"),
    )


def hourly_baseline_outliers(events: DataFrame, ts_col: str = "ts",
                             type_col: str = "event_type",
                             z_cut: float = 3.0) -> DataFrame:
    """Seasonal anomaly detection: each (type, day, hour-of-day) traffic
    cell is scored against that (type, hour-of-day)'s OWN baseline —
    median and MAD of its per-day counts — so "3am is always quiet" and
    "9am is always busy" stop registering as anomalies the way a single
    global threshold (or CUSUM against a flat mean) makes them.  The
    standard diurnal-profile guard an access-log operator wants beside
    ``rate_cusum``'s changepoint view.

    Plan: ONE event shuffle to (type, day, hod) cell counts — output
    bounded by types × days × 24, not events — then two median passes
    over the CELLS (the robust_stats pattern, group = (type, hod)) and
    a broadcast join back.  A zero MAD flags nothing (comparison is
    multiplied out, never divided).  Exact interpolated medians over
    integer counts are engine-identical (midpoints are binary
    fractions) — oracle-checkable end to end.

    The cell table is ``localCheckpoint``-ed: it is model-sized BY
    CONTRACT (types × days × 24 rows) but has three consumers (the
    median fit, the deviation join, the final score), and without the
    barrier each consumer re-runs the full event scan + cell
    aggregation — three corpus passes for one bounded table (guide
    §2.4/§5; measured 5 shuffles → 3 in the r18 plan audit).

    Output: ``(event_type, day yyyy-MM-dd, hod int, n bigint,
    med double, mad double, is_outlier int)``.
    """
    from pyspark.sql import functions as F

    cells = hourly_cells(events, ts_col=ts_col, type_col=type_col).localCheckpoint()
    mad = hourly_baselines_from_cells(cells)
    return score_hourly_cells(cells, mad, z_cut=z_cut)


def hourly_cells(events: DataFrame, ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """(type, day, hour-of-day) traffic cell counts — the bounded frame
    (types × days × 24) every hourly-baseline step runs over."""
    from pyspark.sql import functions as F

    return events.where(F.col(ts_col).isNotNull()).groupBy(
        F.col(type_col).alias("event_type"),
        F.date_format(F.to_date(ts_col), "yyyy-MM-dd").alias("day"),
        F.hour(ts_col).cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))


def hourly_baselines_from_cells(cells: DataFrame) -> DataFrame:
    """Fit the (type, hour-of-day) diurnal baseline — median and MAD of
    the per-day cell counts — over a trusted history window.  This is
    the MODEL step of the streaming twin
    (``streaming/stateful.py::streaming_hourly_anomaly``): fit offline
    on history, broadcast the bounded (types × 24)-row result against
    the live stream.  Output: ``(event_type, hod, med, mad)``."""
    from pyspark.sql import functions as F

    med = cells.groupBy("event_type", "hod").agg(
        F.expr("percentile(n, 0.5D)").alias("med")
    )
    dev = cells.join(med, ["event_type", "hod"]).withColumn(
        "_ad", F.abs(F.col("n") - F.col("med"))
    )
    return dev.groupBy("event_type", "hod").agg(
        F.first("med").alias("med"),
        F.expr("percentile(_ad, 0.5D)").alias("mad"),
    )


def score_hourly_cells(cells: DataFrame, baselines: DataFrame,
                       z_cut: float = 3.0) -> DataFrame:
    """Score traffic cells against fitted (type, hod) baselines.  A cell
    with no baseline row (type/hod unseen in history) scores med/mad
    NULL and is_outlier 0 — unseen traffic shapes are a coverage gap to
    close upstream, not an alert.  A zero MAD flags nothing (multiplied
    comparison, never a division)."""
    from pyspark.sql import functions as F

    joined = cells.join(F.broadcast(baselines), ["event_type", "hod"], "left")
    ad = F.abs(F.col("n") - F.col("med"))
    return joined.select(
        "event_type", "day", "hod", "n", "med", "mad",
        F.coalesce(
            ((F.col("mad") > 0) & (ad > F.lit(z_cut) * F.col("mad")))
            .cast("int"),
            F.lit(0),
        ).alias("is_outlier"),
    )


def rate_fano(events: DataFrame, ts_col: str = "ts",
              type_col: str = "event_type",
              bucket_secs: int = 60) -> DataFrame:
    """Per-type burstiness: the Fano factor (variance/mean) of
    per-bucket event counts, integer-exact in x100 fixed point — the
    dispersion read that separates steady traffic (Fano ~= 1, Poisson)
    from bursty/bot traffic (Fano >> 1) without any distributional fit.

    Exactness: over the n observed buckets with counts c_i,
    ``fano_x100 = floor(100 * (n*sum(c^2) - sum(c)^2) / (n * sum(c)))``
    — integer arithmetic end-to-end, identical on every engine (no
    float variance, no ddof ambiguity; population variance over
    OBSERVED buckets — empty buckets are not rows, the standard
    simplification, documented).  The intermediates run in
    DECIMAL(38,0) (r10 ADVICE): ``n_buckets * sumsq`` escapes int64
    around 1e6 buckets x 1e6 events/bucket (sumsq ~1e18), which is a
    plausible shape at 100 TB — DuckDB's SUM already widens to HUGEINT,
    so the decimal widening keeps the engines identical instead of
    tripping ANSI overflow.  The QUOTIENT still fits int64 by
    construction (fano_x100 <= 100 * max bucket count), which is what
    Spark's decimal ``div`` (BIGINT-valued) requires.  Plan: one
    map-side bucket key + two model-sized aggregations (type x buckets,
    then type).
    """
    if bucket_secs <= 0:
        raise ValueError(f"bucket_secs must be positive, got {bucket_secs}")
    # integer `div`, not float `/`: exact bucket edges on every engine
    b = F.expr(f"unix_micros({ts_col}) div {bucket_secs * 1_000_000}L")
    per_bucket = events.groupBy(
        F.col(type_col), b.alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = per_bucket.groupBy(type_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_c").cast("long").alias("n_events"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_sumsq"),
    )
    return _fano_projection(agg, type_col)


def _fano_projection(agg: DataFrame, type_col: str) -> DataFrame:
    """Final Fano projection over ``(type_col, n_buckets, n_events,
    _sumsq)`` aggregates — split out so the DECIMAL(38,0) overflow
    contract is directly pytest-able on adversarial aggregate values
    (1e6 buckets x 1e6 events/bucket) without materializing 1e12 rows."""
    return agg.selectExpr(
        type_col,
        "n_buckets",
        "n_events",
        # integer div end-to-end (no float variance, no ulp drift);
        # DECIMAL(38,0) intermediates so n_buckets*_sumsq cannot
        # overflow int64 at extreme bucket counts x volumes
        "CAST(((CAST(n_buckets AS DECIMAL(38,0))"
        "       * CAST(_sumsq AS DECIMAL(38,0))"
        "     - CAST(n_events AS DECIMAL(38,0))"
        "       * CAST(n_events AS DECIMAL(38,0))) * 100)"
        " div (CAST(n_buckets AS DECIMAL(38,0))"
        "      * CAST(n_events AS DECIMAL(38,0))) AS BIGINT)"
        " AS fano_x100",
    )
