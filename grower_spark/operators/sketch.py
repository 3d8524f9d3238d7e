"""Bounded-state frequency sketching with EXACT verified output.

The plain "exact heavy hitters" plan (explode tokens -> groupBy token)
is already map-side combinable, but its partial-aggregation state is
vocabulary-sized: on an open token space (URLs, user agents, n-grams at
100 TB) every executor's hash map grows with the distinct count until
it spills.  The Misra-Gries summary bounds that state at k-1 counters
per partial with the classic guarantee: any token whose true frequency
exceeds n/k survives at least one partial.

The trick that makes the result CERTIFIABLE (same pattern as
lsh_precision's sampled exact verify): the sketch only proposes a
candidate set; the emitted counts come from an exact, candidate-pruned
second pass.  When the report threshold is strictly above the sketch's
error bound (k * threshold_permille > 1000), the candidate set provably
contains every true heavy hitter, so the final output is EXACTLY the
true heavy-hitter table and the DuckDB oracle is plain
unnest+count+HAVING — no approximation leaks into the result, only
into the intermediate state bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F
from pyspark.sql import types as T


def mg_heavy_hitters(df: DataFrame, text_col: str = "text",
                     threshold_permille: int = 5,
                     k: int = 512) -> DataFrame:
    """Exact tokens holding >= threshold_permille/1000 of all token
    occurrences, found through a Misra-Gries candidate pass with
    bounded per-partial state.

    Plan: (1) one Arrow ``mapInPandas`` pass emits a <= k-1 row MG
    summary per batch — per batch the exact counter reduces to k-1
    survivors by subtracting the k-th largest count (the mergeable-
    summaries reduction; underestimate <= n_batch/k, vectorized numpy,
    no per-token Python loop); (2) the distinct surviving tokens are
    the candidate set (bounded: (k-1) x batches rows); (3) one exact
    JVM-side count over ONLY candidate tokens (explode -> broadcast
    semi join -> groupBy) plus a scalar total-token aggregate decide
    membership.  Guarantee: a token with share > 1/k survives some
    batch summary, and the threshold is validated to sit strictly
    above 1/k — so candidates cover the truth and the exact pass makes
    the output identical to the naive full groupBy (the oracle).

    Output: ``(token, n_occurrences bigint, share_bp bigint)``.
    """
    if threshold_permille < 1 or threshold_permille > 1000:
        raise ValueError(
            f"threshold_permille must be in [1, 1000], got {threshold_permille}"
        )
    if k * threshold_permille <= 1000:
        raise ValueError(
            "the MG guarantee needs k * threshold_permille > 1000 "
            f"(threshold strictly above the n/k error bound), got "
            f"k={k}, threshold_permille={threshold_permille}"
        )

    import numpy as np
    import pandas as pd

    out_schema = T.StructType([T.StructField("token", T.StringType())])

    def mg_pass(batches):
        for batch in batches:
            vc = (
                batch["text"].dropna().str.split(" ").explode().value_counts()
            )  # vectorized batch counter
            if vc.empty:
                continue
            toks = vc.index.to_numpy(dtype=object)
            c = vc.to_numpy(dtype=np.int64)
            if len(c) > k - 1:
                # reduce the exact batch counter to an MG summary:
                # subtract the k-th largest count; <= k-1 stay positive
                d = np.partition(c, -k)[-k]
                toks = toks[c > d]
            yield pd.DataFrame({"token": toks})

    src = df.select(F.col(text_col).alias("text"))
    candidates = src.mapInPandas(mg_pass, out_schema).distinct()

    toks = F.split(F.col(text_col), " ")
    total = df.select(
        F.sum(F.size(toks)).cast("long").alias("n")
    ).collect()[0]["n"] or 0  # bounded: one scalar
    exact = (
        df.select(F.explode(toks).alias("token"))
        .join(F.broadcast(candidates), "token", "semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .where(F.col("n_occurrences") * 1000 >= threshold_permille * total)
    )
    return exact.select(
        "token",
        "n_occurrences",
        (F.col("n_occurrences") * 10000 / F.greatest(F.lit(total), F.lit(1)))
        .cast("long")
        .alias("share_bp"),
    )
