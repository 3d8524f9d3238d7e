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


def semantic_contamination(corpus: DataFrame, bench: DataFrame,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           bench_vec_col: str | None = None,
                           threshold: float = 0.8) -> DataFrame:
    """Embedding-space decontamination at production benchmark sizes:
    per corpus row, the max cosine similarity against every benchmark
    vector, plus the over-threshold flag.

    Plan shape (the 100 TB story): the benchmark rows are collected into
    ONE array-of-structs row (``collect_list`` of (vec, norm)), which is
    **broadcast** and attached to every corpus partition via a
    single-row cross join — a BroadcastNestedLoopJoin whose inner side is
    exactly one row, i.e. a constant-attach, not a pairwise blow-up.  The
    corpus is then scored in one zero-shuffle map pass (fold over the
    bench array), exactly like the plan-literal variant — but the
    benchmark travels as broadcast DATA instead of Catalyst plan
    literals, so eval sets of 10^3-10^5 embeddings don't blow up plan
    size/compile time.  Guidance: plan literals stop being sensible at
    ~10^2 vectors (every executor re-parses the plan); this variant is
    the shape for real eval suites.  Beyond ~10^6 bench vectors the
    per-row fold cost dominates and LSH-prune the bench first (see
    operators/similarity.py planes machinery).

    Each pairwise cosine is an order-fixed left-to-right float64 fold and
    max is order-insensitive, so results are bit-identical to the
    plan-literal fold (equivalence-pinned in tests/test_operators.py).
    Zero-norm vectors score 0 (try_divide -> NULL -> 0), and an EMPTY
    benchmark yields the -1.0 fold sentinel for max_sim with nothing
    flagged.

    Output: ``(id_col, max_sim double, contaminated int)``.
    """
    bench_vec_col = bench_vec_col or vec_col

    def sq_norm(col: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(col, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )

    bench_one = bench.select(
        F.struct(
            F.transform(F.col(bench_vec_col), lambda x: x.cast("double")).alias("v"),
            sq_norm(F.col(bench_vec_col)).alias("n"),
        ).alias("s")
    ).agg(F.collect_list("s").alias("_bench"))

    # crossJoin against a ONE-row broadcast side: this is a constant
    # attach (inner side cardinality == 1 by construction), not an
    # all-pairs join — the scale-killer grep should read it as the
    # broadcast-small pattern.
    scored = corpus.withColumn("_rn", sq_norm(F.col(vec_col))).crossJoin(
        F.broadcast(bench_one)
    )

    def sim(s):
        dot = F.aggregate(
            F.zip_with(
                s.v,
                F.col(vec_col),
                lambda x, y: x * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # 0/0 is the only divide hazard (zero vector forces dot = 0 too):
        # try_divide -> NULL -> similarity 0, mirroring the oracle's isnan
        return F.coalesce(F.try_divide(dot, s.n * F.col("_rn")), F.lit(0.0))

    max_sim = F.aggregate(
        F.col("_bench"), F.lit(-1.0), lambda acc, s: F.greatest(acc, sim(s))
    )
    return scored.select(
        id_col,
        max_sim.alias("max_sim"),
        (max_sim > F.lit(threshold)).cast("int").alias("contaminated"),
    )


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


def benchmark_leakage(docs: DataFrame, bench: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      bench_id_col: str = "bench_id",
                      n: int = 8, hash_fn: HashFn = md5_60) -> DataFrame:
    """The INVERSE direction of :func:`contamination_hits`: instead of
    "which corpus docs are contaminated", report per BENCHMARK item how
    compromised it is — ``(bench_id, n_docs_hit, n_grams_hit)`` for every
    benchmark row, zeros included.  This is the eval-integrity report a
    team reads before trusting a score: an item whose grams appear in
    thousands of training documents is memorization bait even after the
    corpus-side drop (decontamination filters the TRAINING set; this
    audits the EVAL set).

    Plan: same corpus-side single explode pass over the docs as
    contamination_hits, joined against the broadcast benchmark gram
    table WITH its item ids (still model-sized — ids add one int per
    gram).  Only hit rows (tiny by construction) reach the distinct
    aggregation; the zero rows come from a broadcast left join of the
    bench id list.  Nothing corpus-scale is ever shuffled.
    """
    bgrams = bench.select(
        F.col(id_col).alias(bench_id_col),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    ).select(bench_id_col, hash_fn(F.col("gram")).alias("gram_h"))
    doc_grams = docs.select(
        F.col(id_col).alias("_doc"),
        F.explode(shingles(F.col(text_col), n)).alias("gram"),
    ).select("_doc", hash_fn(F.col("gram")).alias("gram_h"))
    hits = (
        doc_grams.join(F.broadcast(bgrams), "gram_h")
        .groupBy(bench_id_col)
        .agg(
            F.count_distinct("_doc").alias("n_docs_hit"),
            F.count_distinct("gram_h").alias("n_grams_hit"),
        )
    )
    ids = bench.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias(bench_id_col)
    ).distinct()
    return ids.join(hits, bench_id_col, "left").select(
        bench_id_col,
        F.coalesce("n_docs_hit", F.lit(0)).cast("long").alias("n_docs_hit"),
        F.coalesce("n_grams_hit", F.lit(0)).cast("long").alias("n_grams_hit"),
    )
