"""As-of (point-in-time) join: match each left row to the latest right row
with ``right.ts <= left.ts`` per key — the lookup a log/metrics pipeline
needs to stamp events with the most recent config change, deploy marker,
or slowly-changing dimension version.

Spark has no native ASOF JOIN; the classic workarounds are a range self
join (quadratic blowup per key) or a per-key collect (driver-bound).  The
scalable formulation used here is union + ordered window:

1. tag left rows side=1, right rows side=0, union them over the shared
   (keys, ts) shape;
2. one shuffle+sort on (keys) ordered by (ts, side) — right-before-left at
   equal ts gives ``<=`` semantics;
3. ``last(payload, ignorenulls=True)`` over the running window propagates
   the most recent right row onto every subsequent left row, where
   ``payload`` is ONE struct of (right ts, *value_cols) that is NULL only
   for left rows — so a right row whose individual value is NULL still
   wins (its NULL is carried), and all values come from the SAME right
   row, matching DuckDB ``ASOF LEFT JOIN`` exactly;
4. keep side=1 rows.

Cost: ONE shuffle + per-partition sort over |L|+|R| rows — the same as a
sort-merge join, with no pair blowup however many left rows share a right
match.  At 100TB the refinement is time-bucketed range partitioning per key
with boundary carry-in rows; per-key ordering inside a partition is what
this operator already expresses.

Unmatched left rows keep NULL right values (left-join semantics), matching
DuckDB's ``ASOF LEFT JOIN`` which the driver-query oracle uses verbatim.

NULL timestamps: a NULL ts never matches anything, on either side (the
principled ternary-logic reading of ``right.ts <= left.ts``, and what
pandas ``merge_asof`` does).  Raw DuckDB ASOF orders NULLs LAST and so
matches a NULL-ts left row to a NULL-ts right row (both act as +inf) — a
sort artifact; our semantics equal DuckDB ASOF over NULL-filtered inputs
(pinned by ``test_null_ts_matches_duckdb_asof_oracle``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_SIDE = "__side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    tolerance: Optional[int] = None,
) -> DataFrame:
    """Left as-of join: all left columns plus, for each name in
    ``value_cols``, the value from the latest right row with
    ``right[ts_col] <= left[ts_col]`` and equal ``key_cols``.

    ``tolerance`` (same unit as ``ts_col``) nulls out matches older than
    ``left.ts - tolerance`` — pass an integer ts (e.g. epoch micros) when
    using it.  Right rows at exactly ``left.ts`` DO match (<=, not <).
    """
    keys = list(key_cols)
    vals = list(value_cols)
    left_cols = [c for c in left.columns]
    clash = set(vals) & set(left_cols)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    reserved = {_SIDE, "__carry", "__rts"}
    bad = reserved & (set(vals) | set(left_cols))
    if bad:
        raise ValueError(f"reserved column names in use: {sorted(bad)}")

    # A right row with NULL ts can never be "<= left.ts" (NULL comparisons are
    # never true), so it must not enter the carry stream at all — otherwise
    # NULLS-FIRST ordering would put it before every real row and
    # last(ignorenulls) would hand its payload to left rows with no true
    # predecessor.  DuckDB ASOF drops such rows the same way.
    right = right.where(F.col(ts_col).isNotNull())

    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in vals],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in keys and c != ts_col],
        *keys,
        F.col(ts_col),
        F.lit(0).alias(_SIDE),
        *vals,
    ).select(*left_cols, _SIDE, *vals)  # align column order with l_tagged

    unioned = l_tagged.unionByName(r_tagged)
    # NULLS FIRST (explicit): with right NULL-ts rows filtered above, a left
    # row with NULL ts sorts before every right row in its key group, carries
    # NULL, and comes out unmatched — DuckDB ASOF semantics for NULL ts.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc_nulls_first(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row (NULL for left rows): last(ignorenulls) then
    # picks the newest RIGHT ROW as a unit — per-column last() would skip a
    # legitimately-NULL value and carry a stale older row's value instead,
    # and could mix values from different right rows.
    payload = F.when(
        F.col(_SIDE) == 0,
        F.struct(F.col(ts_col).alias("__rts"), *[F.col(v) for v in vals]),
    )
    carried = F.last(payload, ignorenulls=True).over(w)

    out = unioned.select(*left_cols, F.col(_SIDE), carried.alias("__carry"))
    out = out.where(F.col(_SIDE) == 1)
    if tolerance is not None:
        in_range = F.col("__carry.__rts") >= (F.col(ts_col) - F.lit(tolerance))
        picked = [F.when(in_range, F.col(f"__carry.`{v}`")).alias(v) for v in vals]
    else:
        picked = [F.col(f"__carry.`{v}`").alias(v) for v in vals]
    return out.select(*left_cols, *picked)
