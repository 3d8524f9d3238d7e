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

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

_BKT = "__rbkt"


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
    keys = list(keys or [])
    clash = set(points.columns) & set(intervals.columns) - set(keys)
    if clash:
        raise ValueError(f"overlapping non-key columns: {sorted(clash)}")

    p = points.withColumn(_BKT, F.floor(F.col(ts_col) / bucket_width).cast("long"))
    spread = F.explode(
        F.sequence(
            F.floor(F.col(start_col) / bucket_width).cast("long"),
            # end is exclusive: a zero-length or bucket-aligned end does not
            # reach the next bucket
            F.floor((F.col(end_col) - 1) / bucket_width).cast("long"),
        )
    )
    iv = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(_BKT, spread)

    matched = (
        p.join(iv, [*keys, _BKT], "inner")
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop(_BKT)
    )
    if how == "inner":
        return matched
    iv_cols = [c for c in intervals.columns if c not in keys]
    unmatched = (
        p.drop(_BKT)
        .join(matched.select(*points.columns).distinct(), points.columns, "left_anti")
        .select(
            *points.columns,
            *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in iv_cols],
        )
    )
    return matched.select(*points.columns, *iv_cols).unionByName(unmatched)
