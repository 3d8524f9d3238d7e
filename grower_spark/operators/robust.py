"""Robust numeric cleaning: winsorization and median/MAD outlier
statistics per group — the standard guards against heavy-tailed metric
columns before they feed training signals or dashboards (a mean/stddev
z-score is itself dragged by the outliers it is meant to find; the
median/MAD pair is not).

Plan shape: each operator is one exact-percentile aggregation per group
(group-cardinality output, the events_exact_stats pattern) joined back
against the rows — AQE broadcasts the tiny bounds side — plus a
map-side clamp/score.  Exact interpolated percentiles over integer
inputs are engine-identical (midpoints are exact binary fractions), so
every derived number is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def winsorize_bounds(df: DataFrame, value_col: str, group_col: str,
                     lo: float = 0.01, hi: float = 0.99) -> DataFrame:
    """Per-group winsorization bounds: exact interpolated ``lo``/``hi``
    percentiles of ``value_col``.  Output: ``(group_col, p_lo, p_hi)``."""
    return df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo}D)").alias("p_lo"),
        F.expr(f"percentile({value_col}, {hi}D)").alias("p_hi"),
    )


def winsorize(df: DataFrame, value_col: str, group_col: str,
              lo: float = 0.01, hi: float = 0.99,
              out_col: str = "v_winsor") -> DataFrame:
    """Clamp ``value_col`` into its group's [p_lo, p_hi] band.  One
    bounds aggregation + a broadcast-sized join back + a map-side
    clamp."""
    bounds = winsorize_bounds(df, value_col, group_col, lo, hi)
    v = F.col(value_col)
    return df.join(bounds, group_col).withColumn(
        out_col, F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    )


def robust_stats(df: DataFrame, value_col: str, group_col: str,
                 z_cut: float = 3.0) -> DataFrame:
    """Per-group median, MAD (median absolute deviation), and the count
    of robust outliers (|x - median| > z_cut * MAD).  Two grouped
    exact-median passes (the second over the absolute deviations of the
    first) + one counting pass; a zero MAD (over half the group
    identical) flags NOTHING rather than everything — division never
    happens, the comparison is cross-multiplied.

    Output: ``(group_col, n, med, mad, n_outliers)``.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5D)").alias("med")
    )
    dev = df.join(med, group_col).withColumn(
        "_ad", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.first("med").alias("med"),
        F.expr("percentile(_ad, 0.5D)").alias("mad"),
    )
    scored = dev.drop("med").join(mad, group_col)
    return scored.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
        F.sum(
            (
                (F.col("mad") > 0)
                & (F.col("_ad") > F.lit(z_cut) * F.col("mad"))
            ).cast("int")
        ).cast("long").alias("n_outliers"),
    )
