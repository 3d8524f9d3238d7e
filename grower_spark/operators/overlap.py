"""Cross-source overlap diagnostics: how much n-gram mass two corpus
slices share.

The corpus question behind it: before mixing sources into a training run
(or attributing provenance), you want the contamination matrix — which
source pairs share verbatim n-gram content, and how much.  Exact-text
overlap is usually empty (boilerplate mutates); shingle-level overlap is
the robust signal, and its Jaccard over per-source distinct-gram sets is
the standard scalar.

Plan shape (the 100 TB story): explode each document's distinct shingles
(the dedup.shingles builder — JVM-side, no UDF), then ONE corpus-scale
shuffle grouping by gram with ``collect_set(source)`` — the set is
bounded by the SOURCE COUNT, not the corpus, so no gram-keyed self-join
ever materializes corpus × corpus rows.  Ordered source pairs explode
from each gram's sorted set (s·(s-1)/2 ≤ sources² per gram) and roll up
to a sources²-bounded matrix; per-source distinct-gram totals are a
second pass over the same grouped frame (gram-cardinality input,
source-cardinality output) and attach by broadcast.  Integer basis-point
Jaccard keeps the contract hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from grower_spark.operators.dedup import shingles


def source_overlap_matrix(docs: DataFrame, shingle_n: int = 3,
                          text_col: str = "text",
                          source_col: str = "source") -> DataFrame:
    """Pairwise shingle overlap between sources: for every source pair
    (a < b, lexicographic) sharing at least one distinct word
    ``shingle_n``-gram, the shared-gram count and the Jaccard similarity
    of the two sources' distinct-gram sets in basis points
    (``shared * 10000 // (|A| + |B| - shared)``, integer floor).

    Documents shorter than ``shingle_n`` tokens contribute their full
    token join as one gram (the ``shingles`` contract), so short docs
    still participate.

    Output: ``(source_a, source_b, n_shared_grams bigint,
    jaccard_bp bigint)``.
    """
    g = docs.where(F.col(text_col).isNotNull()).select(
        F.col(source_col).alias("_src"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    # collect_set dedups (source, gram) within the group, so no separate
    # distinct pass is needed — one corpus shuffle total.  by_gram feeds
    # TWO rollups (pair counts and per-source totals); without lineage
    # truncation the corpus-scale gram aggregation would execute twice
    # (measured: 4 exchanges instead of the intended 1+2 bounded), so
    # materialize it once (the duplicate_clusters pair-set precedent).
    by_gram = g.groupBy("gram").agg(
        F.sort_array(F.collect_set("_src")).alias("_ss")
    ).localCheckpoint()
    ss = F.col("_ss")
    pair_structs = F.flatten(
        F.transform(
            ss,
            lambda a, i: F.transform(
                # elements strictly after position i: ordered pairs once
                F.slice(ss, i + 2, F.size(ss)),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    pairs = (
        by_gram.where(F.size(ss) >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
    totals = (
        by_gram.select(F.explode(ss).alias("_src"))
        .groupBy("_src")
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    ta = totals.select(F.col("_src").alias("source_a"), F.col("_n").alias("_na"))
    tb = totals.select(F.col("_src").alias("source_b"), F.col("_n").alias("_nb"))
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a", "source_b", "n_shared_grams",
            F.expr(
                "(n_shared_grams * 10000) div (_na + _nb - n_shared_grams)"
            ).cast("long").alias("jaccard_bp"),
        )
    )
