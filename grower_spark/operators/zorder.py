"""Z-order (Morton-curve) data layout for multi-dimensional data skipping.

At 100 TB the fastest query is the one that never reads the bytes: a
parquet scan prunes row groups whose column min/max stats exclude the
filter range.  Sorting the write by ONE column gives perfect stats for
that column and useless stats for every other; interleaving the bits of
several columns (the Z-/Morton curve) makes row groups into small
hyper-rectangles of the key space, so selective filters on ANY subset
of the layout columns skip most of the file — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, here as plain-Spark column
arithmetic + a range-partitioned sorted write.

Everything is JVM-side expression (boundary-rank + bit interleave; no
UDF); the only shuffle is the range repartition the sorted write
inherently needs, plus one tiny quantile aggregate per layout column
(boundaries are 2^bits-1 doubles — a bounded driver collect folded back
in as an array literal).  ``tests/test_zorder.py`` measures the skip:
a box filter over a z-ordered table materializes a fraction of the
rows the same filter reads from a single-column-sorted layout.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

#: bits per dimension.  256 equi-depth ranks per column is far finer
#: than row-group granularity (a 128 MB row group spans ~thousands of
#: rank cells already); the per-row rank cost is a 255-element vector
#: comparison, so keep this small — 8-10, not 16.
ZORDER_BITS = 8


def _interleave(cols: Sequence[Column], bits: int) -> Column:
    """Bit-interleave ``cols`` (integer ranks in [0, 2^bits)) into one
    BIGINT Morton code: bit b of column c lands at position
    ``b * len(cols) + c``.  Pure shift/or arithmetic — codegen-friendly."""
    n = len(cols)
    out = F.lit(0).cast("long")
    for b in range(bits):
        for c, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + c))
    return out


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = ZORDER_BITS
) -> DataFrame:
    """Add ``_zkey``: the Morton code of the EQUI-DEPTH RANKS of ``cols``
    (numeric / timestamp columns; values are compared as double).

    Ranks (not raw values) make the curve robust to skew: equi-depth
    buckets spread any marginal distribution uniformly over [0, 2^bits),
    so one hot value cannot collapse the curve onto a line.  Per column
    the boundaries come from one ``approx_percentile`` aggregate (a
    bounded collect of 2^bits-1 doubles); the rank expression is then
    "count boundaries <= value" over the sorted literal array —
    ``aggregate(array, 0, acc + (b <= v))`` — all JVM-side.  NULLs rank
    0 so they cluster at the curve origin instead of scattering.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    n_buckets = 1 << bits
    ranked = df
    rank_cols = []
    for name in cols:
        fracs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.select(
            F.percentile_approx(
                F.col(name).cast("double"), fracs, 10_000
            ).alias("b")
        ).collect()[0]["b"]  # bounded: 2^bits - 1 doubles
        # strictly-increasing subset: skewed columns repeat boundaries,
        # and a repeated boundary would double-count the rank
        uniq: list[float] = []
        for v in bounds or []:
            if v is not None and (not uniq or v > uniq[-1]):
                uniq.append(float(v))
        if uniq:
            arr = F.lit(uniq).cast("array<double>")  # one py4j call
            v = F.col(name).cast("double")
            rank = F.coalesce(
                F.aggregate(
                    arr,
                    F.lit(0).cast("long"),
                    lambda acc, b: acc + F.when(b <= v, 1).otherwise(0),
                ),
                F.lit(0),
            )
        else:  # constant or all-NULL column: a single cell
            rank = F.lit(0)
        rank_col = f"_zr_{name}"
        ranked = ranked.withColumn(rank_col, rank.cast("long"))
        rank_cols.append(rank_col)
    key = _interleave([F.col(c) for c in rank_cols], bits)
    return ranked.withColumn("_zkey", key).drop(*rank_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = ZORDER_BITS,
    num_files: int = 32,
    write_options: dict | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of ``cols``:
    range-repartition on the Morton key (balanced files in curve order)
    + sort within partitions (coherent min/max stats per row group).
    Readers need nothing special — parquet min/max pruning on the plain
    columns does the skipping.  ``write_options`` passes through to the
    parquet writer (tests shrink ``parquet.block.size`` to get many row
    groups from small data)."""
    keyed = zorder_key(df, cols, bits=bits)
    writer = (
        keyed.repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)
