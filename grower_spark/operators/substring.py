"""Substring-level exact deduplication (training-data dedup).

The "Deduplicating Training Data Makes Language Models Better" family of
pipelines removes *repeated substrings* — long token runs that occur more
than once across the corpus (licence boilerplate, templated pages, quoted
reposts) — which document-level exact/near dedup cannot see.  The
reference implementation builds a corpus-wide suffix array; that is a
single-machine design.  The Spark-first reformulation here gets the same
duplicated-span output from rolling k-gram hashes:

1. every document emits one 60-bit hash per overlapping k-token gram
   (per-row array expressions, map-side, no Python);
2. ONE shuffle groups gram occurrences by hash (posting-list style — the
   same pattern as ``ngram_jaccard_pairs``; a join-back formulation would
   re-compute the exploded subtree per side);
3. positions of grams whose corpus frequency is >= ``min_df`` flow back
   per document, where overlapping/adjacent gram intervals are merged
   into maximal duplicated spans with one gaps-and-islands window pass
   (partitioned by doc id, so corpus-level skew cannot create a hot key —
   a key is at most as hot as the longest document).

Any substring duplicated with length >= 2k-1 tokens is guaranteed to
contain a shared k-gram at every alignment, so spans found this way are
exact (no false positives: equal hashes at 60 bits over corpus-sized gram
counts are equal grams w.h.p., and the verify step is O(span) if needed).

Scale levers, mirroring the rest of ``operators/dedup.py``:

- ``max_gram_df`` drops degenerate posting lists (a gram occurring in
  half the corpus is boilerplate better handled by
  ``drop_common_paragraphs``; unbounded it makes the posting-list array
  as wide as the corpus).  Dropped lists are *high-frequency* content —
  at corpus scale, size the cap with expected duplication (the round-6
  x30 stress-run finding: fixed caps collapse recall as duplication
  grows).
- gram hashes are ``md5_60`` for cross-engine oracle checks; swap
  ``hash_fn="xxhash"`` in production (10x cheaper, Spark-only).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from grower_spark.functions.hashing import md5_60, xxhash_60


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def _gram_hash(col: Column, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return md5_60(col)
    if hash_fn == "xxhash":
        return xxhash_60(col)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def gram_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, pos, h): one 60-bit hash per overlapping k-token gram.

    ``pos`` is 1-indexed; the gram at ``pos`` covers tokens
    ``[pos, pos+k-1]``.  Documents shorter than k tokens emit no rows.
    Pure per-row array expressions + one explode — map-side only.
    """
    toks = _tokens(F.col(text_col))
    # the split is bound once as a lambda variable (the dedup.shingles
    # lesson): the old slice(toks, i, k) capture re-split the text per
    # gram position, O(tokens²) per row
    grams = F.flatten(
        F.transform(
            F.array(toks),
            lambda tk: F.when(
                F.size(tk) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - k + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        _gram_hash(
                            F.array_join(F.slice(tk, i, k), " "), hash_fn
                        ).alias("h"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,h:bigint>>")),
        )
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(grams).alias("g"))
        .select(F.col("_id").alias(id_col), F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def duplicate_gram_hits(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
    max_gram_df: Optional[int] = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, pos, h, gram_df, is_owner): every occurrence of every gram
    whose corpus-wide occurrence count is in [min_df, max_gram_df].

    ONE shuffle (group by gram hash); occurrences flow back by exploding
    each retained posting list — no join, no subtree recompute.  The
    posting list is sorted, so the canonical *owner* (first occurrence by
    (id, pos) — the copy substring-removal keeps) falls out as element 0.
    """
    g = gram_positions(df, id_col, text_col, k=k, hash_fn=hash_fn)
    postings = g.groupBy("h").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(id_col).alias("_id"), F.col("pos").alias("_pos")))
        ).alias("ds")
    )
    postings = postings.where(F.size("ds") >= min_df)
    if max_gram_df is not None:
        postings = postings.where(F.size("ds") <= max_gram_df)
    own = F.col("ds")[0]
    hit = F.explode(
        F.transform(
            F.col("ds"),
            lambda x: F.struct(
                x["_id"].alias("_id"),
                x["_pos"].alias("_pos"),
                ((x["_id"] == own["_id"]) & (x["_pos"] == own["_pos"])).alias("_owner"),
            ),
        )
    )
    return postings.select(F.col("h"), F.size("ds").alias("gram_df"), hit.alias("e")).select(
        F.col("e._id").alias(id_col),
        F.col("e._pos").alias("pos"),
        "h",
        "gram_df",
        F.col("e._owner").alias("is_owner"),
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
    max_gram_df: Optional[int] = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Maximal duplicated token spans per document.

    (id, span_start, span_end, span_len, n_grams) — 1-indexed inclusive
    token interval; overlapping/adjacent duplicated gram intervals merged
    (gaps-and-islands: a new span starts when the next duplicated gram
    position is more than k past the previous one, i.e. the intervals
    [pos, pos+k-1] no longer touch).

    Shuffle inventory: gram group-by (bounded rows: one per distinct gram)
    + one doc-partitioned window whose Exchange is reused by the final
    span aggregation.  Linear in corpus size.
    """
    hits = duplicate_gram_hits(
        df, id_col, text_col, k=k, min_df=min_df, max_gram_df=max_gram_df, hash_fn=hash_fn
    ).select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) > k, 1).otherwise(0)
    isl = hits.withColumn("_brk", brk).withColumn(
        "island", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k - 1)).alias("span_end"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
            "n_grams",
        )
    )


def substring_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
    max_gram_df: Optional[int] = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document duplication summary over ``duplicate_spans``:
    (id, n_tokens, n_spans, dup_tokens, dup_ratio_bp).  Documents with no
    duplicated span report zeros (left join back to the corpus)."""
    spans = duplicate_spans(
        df, id_col, text_col, k=k, min_df=min_df, max_gram_df=max_gram_df, hash_fn=hash_fn
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("span_len").alias("dup_tokens")
    )
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).alias("n_tokens")
    )
    j = base.join(per_doc, on=id_col, how="left")
    return j.select(
        id_col,
        "n_tokens",
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        F.expr("coalesce(dup_tokens, 0) * 10000 div n_tokens").alias("dup_ratio_bp"),
    )


def remove_duplicate_substrings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_clean",
    k: int = 8,
    min_df: int = 2,
    max_gram_df: Optional[int] = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """Cut duplicated substrings, keeping the corpus-first occurrence.

    A token position is removed iff it is covered by >= 1 duplicated gram
    occurrence that is NOT the gram's canonical owner (first (id, pos) in
    the sorted posting list) AND is not covered by any owner occurrence
    in the same document — so exactly one copy of each duplicated run
    survives, at its first occurrence, like the suffix-array pipeline's
    keep-one policy.  The owner-cover protection is what makes keep-one
    hold under SELF-OVERLAPPING duplicates (periodic text, e.g. the same
    token repeated: the gram at pos 1 owns, the gram at pos 2 is a
    non-owner whose span covers most of the owner's copy — without the
    protection the kept first occurrence itself gets shredded).
    Surviving tokens are reassembled in order.

    Output: (id, text, out_col, n_tokens, n_removed).  Shuffles: the gram
    group-by, one per-doc aggregation of removed positions, one id-keyed
    join back to the corpus (docs with nothing to remove pass through the
    left join untouched).
    """
    hits = duplicate_gram_hits(
        df, id_col, text_col, k=k, min_df=min_df, max_gram_df=max_gram_df, hash_fn=hash_fn
    )
    # one aggregation computes both cover sets; drop = non-owner \ owner
    pos_cover = hits.select(
        id_col,
        "is_owner",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))).alias("t"),
    )
    covered = pos_cover.groupBy(id_col).agg(
        F.array_sort(
            F.array_except(
                F.collect_set(F.when(~F.col("is_owner"), F.col("t"))),
                F.collect_set(F.when(F.col("is_owner"), F.col("t"))),
            )
        ).alias("_drop")
    )
    base = df.where(F.col(text_col).isNotNull())
    j = base.join(covered, on=id_col, how="left")
    toks = _tokens(F.col(text_col))
    drop = F.coalesce(F.col("_drop"), F.array().cast("array<int>"))
    kept = F.filter(toks, lambda t, i: ~F.array_contains(drop, (i + 1).cast("int")))
    return j.select(
        id_col,
        text_col,
        F.array_join(kept, " ").alias(out_col),
        F.size(toks).alias("n_tokens"),
        F.size(drop).cast("long").alias("n_removed"),
    )
