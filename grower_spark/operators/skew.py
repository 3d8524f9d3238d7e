"""Skew-mitigation operators.

AQE (enabled in session.py) already splits skewed shuffle partitions for
joins; these helpers cover the cases AQE can't:

- ``salted_agg``: two-phase aggregation for hot grouping keys.  Phase 1
  aggregates on (key, salt) — the hot key's rows spread over ``n_salts``
  reducers — phase 2 merges the partials per key.  Works for any algebraic
  aggregate (sum/count/min/max); the caller provides both phases.
- ``salted_broadcast_left``: explodes the small side over the salt domain
  so a salted fact side can still hash-join it (for when the dim is
  broadcastable anyway, plain broadcast is better — this is for the
  both-sides-large + hot-key case).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def with_salt(df: DataFrame, n_salts: int = 16, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts); nondeterministic by design."""
    return df.withColumn(salt_col, (F.rand() * n_salts).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate raw rows grouped by (keys + salt);
    ``final_aggs`` merge the partial columns grouped by keys.  Example::

        salted_agg(events, ["user_id"],
                   [F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s")],
                   [F.sum("cnt").alias("cnt"), F.sum("s").alias("s")])

    Spark's hash aggregate already does map-side partials, which handles
    most skew; the salt additionally spreads the *reduce* side of a hot
    key over ``n_salts`` tasks — needed when one key's partials alone
    exceed a single reducer (e.g. high-cardinality distinct-ish state).
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    small: DataFrame, n_salts: int = 16, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate the small side once per salt value so it joins a salted
    big side on (key, salt)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(salt_col)
    return small.select("*", salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side
    ``n_salts`` ways, join on (keys + salt), drop the salt.

    Result is identical to ``big.join(small, on, how)`` — the salt only
    changes the physical distribution: a hot key's rows land on
    ``n_salts`` different reducers instead of one, bounding per-task input
    when one key dominates the shuffle (AQE's skew splitting covers
    sort-merge joins after the fact; salting also covers hash-partitioned
    work feeding later stages, and degrades gracefully when statistics
    are missing).  Cost: the small side is materialized ``n_salts`` times
    — keep it dimension-sized.

    Only ``inner`` and ``left`` are allowed: a right/full join would emit
    unmatched small-side rows once per salt replica.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    b = with_salt(big, n_salts)
    s = salted_broadcast_left(small, n_salts)
    return b.join(s, [*on, "_salt"], how).drop("_salt")
