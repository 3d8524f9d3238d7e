"""Corpus snapshot diff — dataset-versioning governance.

Between two corpus snapshots (yesterday's crawl and today's, a pre- and
post-filter run, two dataset releases) the questions are always the
same: what was added, what disappeared, what changed in place, and how
big is the churn.  At 100 TB nobody diffs text; the diff is over
60-bit content hashes, one equi-join keyed by doc id.

Plan: each side reduces map-side to ``(doc_id, hash, presence)`` —
column-pruned to two columns off the scan — then ONE full-outer
hash join on doc_id and a pure column-arithmetic status.  The rollup
variant adds a 4-row aggregation.  Nothing shuffles except the join's
id partitioning, which any downstream per-doc consumer reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from grower_spark.functions.hashing import md5_60


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document diff status between two snapshots.

    Output: ``(doc_id, status)`` with status in ``added`` (id only in
    ``new``), ``removed`` (only in ``old``), ``changed`` (both, content
    hash differs — NULL-safe, so NULL->text and text->NULL count as
    changes while NULL->NULL does not), ``unchanged``.
    """
    o = old.select(
        F.col(id_col).alias("doc_id"),
        md5_60(F.col(text_col)).alias("_h_old"),
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        md5_60(F.col(text_col)).alias("_h_new"),
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("_h_old").eqNullSafe(F.col("_h_new")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"))


def corpus_diff_summary(old: DataFrame, new: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Churn rollup of :func:`corpus_diff`:
    ``(status, n_docs)`` — the four dataset-release numbers."""
    return corpus_diff(old, new, id_col=id_col, text_col=text_col).groupBy(
        "status"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
