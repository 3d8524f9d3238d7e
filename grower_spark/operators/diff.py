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


def distribution_drift_bins(old: DataFrame, new: DataFrame,
                            score_col: str = "score",
                            n_bins: int = 10,
                            bin_width: int = 100) -> DataFrame:
    """Distribution drift between two snapshots of an integer score
    (quality permille, length band, LM xent bucket): per-bin shares and
    the chi-square-style contribution ``(share_new − share_old)² /
    share_old`` — the release-gate signal for "did this filter change
    WHAT the corpus looks like, not just how big it is".  (The classic
    PSI multiplies by ``ln(share_new/share_old)`` — ln's last ulp is not
    engine-portable, and the chi-square form ranks drift identically for
    the gate's purpose.)

    Emitting PER-BIN rows, not a single total, is deliberate: the bins
    are where the diagnosis lives (which score class grew), the output
    stays model-sized either way, and each contribution is a fixed chain
    of exact-rounded IEEE ops on exact int64 counts — bit-identical
    across engines — whereas a cross-bin SUM of doubles would depend on
    summation order.

    Plan: one map-combinable (bin) histogram per side (shuffle =
    partitions × bins), a scalar total each, one n_bins-row outer join.
    Bins: ``least(score // bin_width, n_bins − 1)``, NULL scores
    excluded.  Empty-side bins get share 0; contribution is NULL when
    share_old is 0 (division by zero — a brand-new score class is
    flagged by the share columns themselves).
    """
    def hist(df: DataFrame, side: str) -> DataFrame:
        b = F.least(
            F.floor(F.col(score_col) / F.lit(bin_width)).cast("long"),
            F.lit(n_bins - 1),
        )
        return (
            df.where(F.col(score_col).isNotNull())
            .select(b.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )
    # each histogram feeds BOTH the join and its scalar total: without a
    # checkpoint the corpus scan behind it executes twice per side (the
    # source_overlap lesson); the checkpointed table is n_bins rows
    o = hist(old, "old").localCheckpoint(eager=True)
    n = hist(new, "new").localCheckpoint(eager=True)
    tot_o = o.select(F.sum("n_old").alias("_to"))
    tot_n = n.select(F.sum("n_new").alias("_tn"))
    j = (
        o.join(n, "bin", "full_outer")
        .crossJoin(F.broadcast(tot_o))
        .crossJoin(F.broadcast(tot_n))
        .select(
            "bin",
            F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            "_to", "_tn",
        )
    )
    share_o = F.col("n_old").cast("double") / F.col("_to").cast("double")
    share_n = F.col("n_new").cast("double") / F.col("_tn").cast("double")
    contrib = F.when(
        F.col("n_old") > 0,
        (share_n - share_o) * (share_n - share_o) / share_o,
    )
    return j.select(
        F.col("bin").cast("long").alias("bin"),
        "n_old", "n_new",
        share_o.alias("share_old"),
        share_n.alias("share_new"),
        contrib.alias("drift_contrib"),
    )
