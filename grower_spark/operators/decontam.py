"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

A standard LLM training-data step (the reference engine has no analog —
this extends the training-data surface alongside dedup/similarity): any
document that contains a long-enough n-gram from a held-out benchmark is
suspected of test-set contamination and dropped before training.

Plan shape (the 100 TB story):

- The benchmark side is tiny relative to the corpus (eval sets are MBs
  against 100 TB), so its distinct n-gram hash set is **broadcast** — the
  corpus is never shuffled to meet it.
- The corpus explodes its distinct per-doc n-grams map-side, inner-joins
  the broadcast hash set, and aggregates hit counts by doc id: **one
  shuffle, on doc_id, carrying only the matched grams**.  Documents with
  zero overlap are filtered at the broadcast join and never reach the
  shuffle, so shuffle volume is bounded by true contamination, not corpus
  size.
- Gram comparison happens on 60-bit hashes, not strings — constant-width
  shuffle rows regardless of n.  ``md5_60`` for cross-engine oracle runs,
  ``xxhash_60`` as the cheaper Spark-only production path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from grower_spark.functions.hashing import md5_60
from grower_spark.operators.dedup import shingles

HashFn = Callable[[Column], Column]


def benchmark_ngrams(bench: DataFrame, text_col: str = "text", n: int = 8,
                     hash_fn: HashFn = md5_60) -> DataFrame:
    """Distinct n-gram hash set of the benchmark corpus (column ``gram_h``).

    Distinct-reduced before broadcast so the driver ships each gram once.
    """
    return (
        bench.select(F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .select(hash_fn(F.col("gram")).alias("gram_h"))
        .distinct()
    )


def contamination_hits(docs: DataFrame, bench: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = 8, min_hits: int = 1,
                       hash_fn: HashFn = md5_60,
                       return_grams: bool = False) -> DataFrame:
    """Per-document count of distinct n-grams shared with the benchmark.

    Returns ``(id_col, n_hit)`` for documents with at least ``min_hits``
    overlapping n-grams; with ``return_grams=True`` adds ``hit_grams``
    (sorted array of the matching gram strings — the evidence a reviewer
    needs to audit a contamination decision; costs gram strings instead of
    fixed-width hashes through the shuffle, so keep it off for bulk runs).
    ``shingles`` semantics: documents shorter than ``n`` tokens contribute
    their full token join as a single gram, so short docs still
    participate.  NULL text produces no grams on either side: NULL-text
    corpus docs are reported clean, NULL-text benchmark rows contribute
    nothing.
    """
    grams = benchmark_ngrams(bench, text_col, n, hash_fn)
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    ).select(id_col, "gram", hash_fn(F.col("gram")).alias("gram_h"))
    joined = doc_grams.join(F.broadcast(grams), "gram_h")
    # shingles() is already per-doc distinct, so count(*) == distinct
    # shared grams
    aggs = [F.count(F.lit(1)).alias("n_hit")]
    if return_grams:
        aggs.append(F.sort_array(F.collect_list("gram")).alias("hit_grams"))
    else:
        joined = joined.drop("gram")
    hits = joined.groupBy(id_col).agg(*aggs)
    return hits.where(F.col("n_hit") >= min_hits)


def decontaminate(docs: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 8, min_hits: int = 1,
                  hash_fn: HashFn = md5_60) -> DataFrame:
    """Corpus minus contaminated documents (the keep-side of the check).

    Anti-join on the (small) contaminated id set — broadcast, so the
    corpus stays in place.
    """
    bad = contamination_hits(docs, bench, id_col, text_col, n, min_hits,
                             hash_fn).select(id_col)
    return docs.join(F.broadcast(bad), id_col, "left_anti")
