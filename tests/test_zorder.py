"""Z-order layout: the data-skipping property, measured from parquet
footers.

Parquet readers prune a row group when its column min/max excludes the
filter — so the honest test of a layout is the fraction of row groups
whose stats INTERSECT a selective filter.  We write the same frame
three ways (z-ordered on (a, b); linearly sorted on a; unsorted) with
small row groups, read every row group's (min, max) per column with
pyarrow, and check:

- a slab filter on ``b`` intersects almost every row group of the
  a-sorted layout but a small fraction of the z-ordered one (the whole
  point: multi-column skipping);
- a slab on ``a`` still prunes well under z-order (interleaving costs
  each column only log2(n_cols) stats resolution);
- the z-key is a pure function (layout determinism) and the written
  rows are a permutation of the input.
"""

import glob
import os

import pyarrow.parquet as pq
import pyspark.sql.functions as F


N = 120_000
BLOCK = {"parquet.block.size": 16 * 1024}  # many row groups from small data


def _mk(spark):
    # two DECORRELATED uniform-ish columns in [0, 1000): b must not be a
    # function of a (id*k % 1000 would be, for a = id % 1000 — both are
    # determined by id mod 1000), so b comes from a hash
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 1000).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("b"),
    )


def _rg_stats(path, col):
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for i in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(i).column(idx).statistics
            out.append((st.min, st.max))
    return out


def _hit_fraction(stats, lo, hi):
    hits = sum(1 for mn, mx in stats if not (mx < lo or mn > hi))
    return hits / len(stats)


def test_zorder_skips_on_both_columns(spark, tmp_path):
    from grower_spark.operators.zorder import write_zordered

    df = _mk(spark)
    zpath = str(tmp_path / "z")
    apath = str(tmp_path / "a")
    write_zordered(df, zpath, ["a", "b"], bits=8, num_files=4,
                   write_options=BLOCK)
    (
        df.repartitionByRange(4, "a").sortWithinPartitions("a")
        .write.mode("overwrite")
        .options(**BLOCK).parquet(apath)
    )
    z_b = _rg_stats(zpath, "b")
    a_b = _rg_stats(apath, "b")
    assert len(z_b) > 40, "need many row groups for the measurement"
    # 5%-selective slab on the column the linear layout did NOT sort by
    zb = _hit_fraction(z_b, 0, 49)
    ab = _hit_fraction(a_b, 0, 49)
    assert ab > 0.9, f"a-sorted layout should NOT skip on b (got {ab})"
    assert zb < 0.5, f"z-order should skip most row groups on b (got {zb})"
    # the interleave keeps column a skippable too
    za = _hit_fraction(_rg_stats(zpath, "a"), 0, 49)
    assert za < 0.5, f"z-order should still skip on a (got {za})"


def test_zorder_preserves_rows_and_is_deterministic(spark, tmp_path):
    from grower_spark.operators.zorder import write_zordered, zorder_key

    df = _mk(spark).limit(5_000)
    p = str(tmp_path / "zz")
    write_zordered(df, p, ["a", "b"], bits=6, num_files=2,
                   write_options=BLOCK)
    back = spark.read.parquet(p)
    assert back.count() == 5_000
    assert back.select(F.sum("id")).first()[0] == df.select(F.sum("id")).first()[0]
    k1 = zorder_key(df, ["a", "b"], bits=6).select("id", "_zkey")
    k2 = zorder_key(df, ["a", "b"], bits=6).select("id", "_zkey")
    assert k1.exceptAll(k2).count() == 0


def test_zorder_null_and_constant_columns(spark):
    from grower_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(
        [(1, None, 5), (2, 3, 5), (3, 7, 5)], "id long, a long, c long"
    )
    out = zorder_key(df, ["a", "c"], bits=4).collect()
    by_id = {r["id"]: r["_zkey"] for r in out}
    assert by_id[1] is not None  # NULL ranks 0, key defined
    # constant column contributes a constant 0 rank: keys ordered by a
    assert by_id[1] <= by_id[2] <= by_id[3]


def test_layout_cli_end_to_end(spark, tmp_path):
    """`cli layout` rewrites a parquet table z-ordered — same row set,
    multiple files, reads back clean."""
    from grower_spark.cli import main

    src = str(tmp_path / "in.parquet")
    dst = str(tmp_path / "out.parquet")
    _mk(spark).limit(20_000).write.parquet(src)
    rc = main([
        "layout", "--input", src, "--output", dst,
        "--cols", "a,b", "--bits", "6", "--num-files", "4",
    ])
    assert rc == 0
    back = spark.read.parquet(dst)
    assert back.count() == 20_000
    assert back.select(F.sum("id")).first()[0] == \
        spark.read.parquet(src).select(F.sum("id")).first()[0]
