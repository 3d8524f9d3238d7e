"""Range (interval) join: match point events to the intervals containing
them — event⋈[start, end) — without the O(|L|·|R|) blowup a naive
inequality join plans as (Spark turns a pure theta-join into
BroadcastNestedLoop or a cartesian product).

Scalable formulation: time is bucketized.  Each point computes ONE bucket
map-side; each interval is exploded over the buckets it covers (replication
factor = interval length / bucket width, choose the width near the typical
interval length); the join is then a plain equi-join on (keys + bucket)
followed by the exact range filter.  A matched pair appears exactly once —
the point's bucket is unique, so however many buckets an interval spans,
only the point's own bucket can produce the pair.

One shuffle on the bounded (keys, bucket) key; skew follows event-time
volume per bucket, which the bucket width controls.  This is the standard
bucketed range join (the same shape Databricks' range-join optimization
compiles to via hints).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

_BKT = "__rbkt"


def _with_floor_bucket(df: DataFrame, src: Column, width: int, out: str) -> DataFrame:
    """Add ``out = floor(src / width)`` computed with EXACT integer arithmetic.

    Spark's ``/`` on integral types is double division — above 2^53 (epoch
    nanos!) the quotient can be off by one and boundary matches silently
    drop.  SQL ``div`` is exact but truncates toward zero, so negative
    inputs need a remainder correction to get a true floor.
    """
    tmp = f"__fd_{out}"
    if tmp in df.columns or out in df.columns:
        raise ValueError(
            f"reserved column name already present: {[c for c in (tmp, out) if c in df.columns]}"
        )
    q = F.expr(f"`{tmp}` div {width}") - F.when(
        (F.col(tmp) % width) < 0, F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(tmp, src.cast("long")).withColumn(
        out, q.cast("long")
    ).drop(tmp)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (half-open) and equal ``keys``.

    ``ts_col``/``start_col``/``end_col`` must be integer-like (e.g. epoch
    micros) so bucketing is exact; ``bucket_width`` is in the same unit.
    ``how`` may be ``inner`` or ``left`` (unmatched points kept with NULL
    interval columns; implemented as a post-join recovery so the bucketed
    equi-join stays the only shuffle).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join supports inner|left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    keys = list(keys or [])
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")
    reserved = {_BKT, "__b0", "__b1", f"__fd_{_BKT}", "__fd___b0", "__fd___b1"}
    bad = reserved & (set(points.columns) | set(intervals.columns))
    if bad:
        raise ValueError(f"reserved column names in use: {sorted(bad)}")

    p = _with_floor_bucket(points, F.col(ts_col), bucket_width, _BKT)
    iv = intervals.where(F.col(end_col) > F.col(start_col))
    iv = _with_floor_bucket(iv, F.col(start_col), bucket_width, "__b0")
    # end is exclusive: a zero-length or bucket-aligned end does not reach
    # the next bucket
    iv = _with_floor_bucket(iv, F.col(end_col) - 1, bucket_width, "__b1")
    iv = iv.withColumn(
        _BKT, F.explode(F.sequence(F.col("__b0"), F.col("__b1")))
    ).drop("__b0", "__b1")

    matched = (
        p.join(iv, [*keys, _BKT], "inner")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop(_BKT)
    )
    if how == "inner":
        return matched
    iv_cols = [c for c in intervals.columns if c not in keys]
    # Unmatched recovery must be NULL-safe: plain column-list equality uses
    # `=`, under which NULL != NULL, so a *matched* point row containing a
    # NULL anywhere would reappear as a spurious NULL-extended row.
    pa = p.drop(_BKT).alias("__rj_p")
    ma = matched.select(*points.columns).alias("__rj_m")
    cond = None
    for c in points.columns:
        e = F.col(f"__rj_p.`{c}`").eqNullSafe(F.col(f"__rj_m.`{c}`"))
        cond = e if cond is None else (cond & e)
    unmatched = pa.join(ma, cond, "left_anti").select(
        *[F.col(f"__rj_p.`{c}`").alias(c) for c in points.columns],
        *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
    )
    return matched.select(*points.columns, *iv_cols).unionByName(unmatched)
