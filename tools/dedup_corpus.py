"""End-to-end corpus dedup driver: the composed training-data pipeline a
reference user runs to turn a raw document table into a keep-list.

    normalize -> exact dedup -> near-dup pairs (minhash LSH) ->
    connected components -> keep lowest id per cluster -> keep-list parquet

Every stage is one of the package operators; the composition is itself
declarative until the (iterative) clustering step.  Output:

    <out>/keep_list/    (doc_id)            — documents to KEEP
    <out>/drop_list/    (doc_id, kept_id, reason)  — dropped + why

Usage:
    python tools/dedup_corpus.py <input parquet dir/file> <out dir>
        [--text-col text] [--id-col doc_id] [--threshold-bands 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def build_keep_drop(docs, id_col: str = "doc_id", text_col: str = "text",
                    num_perm: int = 16, bands: int = 4,
                    min_shared_bands: int = 2, max_bucket_width: int = 2000):
    """Returns (keep_df[doc_id], drop_df[doc_id, kept_id, reason])."""
    from grower_spark.operators.dedup import (
        duplicate_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from grower_spark.operators.text import normalize_text

    from grower_spark.functions.hashing import md5_60

    norm = normalize_text(docs, text_col=text_col).cache()

    # 1. exact duplicates on the canonical form: doc -> keep_id via the
    #    content hash
    exact = exact_dedup(norm, text_col="text_norm", id_col=id_col)
    keyed = norm.select(F.col(id_col), md5_60(F.col("text_norm")).alias("h60"))
    exact_map = keyed.join(
        exact.select(F.col("text_h60").alias("h60"), "keep_id"), "h60"
    ).select(id_col, "keep_id")
    exact_drops = exact_map.where(F.col(id_col) != F.col("keep_id")).select(
        F.col(id_col),
        F.col("keep_id").alias("kept_id"),
        F.lit("exact").alias("reason"),
    )

    # 2. near-dup pairs among the exact survivors only
    survivors = exact_map.where(F.col(id_col) == F.col("keep_id")).select(id_col)
    pool = norm.join(survivors, id_col)
    pairs = minhash_lsh_pairs(
        pool, id_col=id_col, text_col="text_norm", num_perm=num_perm,
        bands=bands, max_bucket_width=max_bucket_width,
    ).where(F.col("n_bands") >= min_shared_bands)

    # 3. clusters -> keep the lowest id in each near-dup cluster
    clusters = duplicate_clusters(pairs, id_a="id_a", id_b="id_b")
    near_drops = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id").alias("kept_id"),
        F.lit("near-dup").alias("reason"),
    )

    drops = exact_drops.unionByName(near_drops)
    keep = docs.select(id_col).join(drops.select(id_col), id_col, "left_anti")
    return keep, drops


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold-bands", type=int, default=2,
                    help="min shared LSH bands to call a near-dup")
    args = ap.parse_args()

    from grower_spark.session import get_spark

    spark = get_spark("dedup-corpus")
    docs = spark.read.parquet(args.input)
    keep, drops = build_keep_drop(
        docs, id_col=args.id_col, text_col=args.text_col,
        min_shared_bands=args.threshold_bands,
    )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep_list"))
    drops.write.mode("overwrite").parquet(os.path.join(args.out, "drop_list"))
    n_in = docs.count()
    n_keep = keep.count()
    print(f"input={n_in} keep={n_keep} dropped={n_in - n_keep}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
