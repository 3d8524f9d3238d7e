"""Deterministic k-means over embedding columns (topic / domain
clustering for corpus curation).

Training-data pipelines cluster embeddings constantly — topic balancing,
domain discovery, cluster-aware sampling, SemDeDup's cells.  Generic
k-means is seed- and float-order-dependent, which breaks both cross-run
reproducibility and cross-engine certification; this variant pins every
source of nondeterminism:

- **Seeds**: the k lowest ids' vectors (data-deterministic, no RNG).
- **Quantization**: components become integer micros up front
  (``floor(x * 1e6 + 0.5)`` — identical doubles in, identical int64
  out on any engine), so distances are EXACT int64 sums — no
  accumulation-order ulp drift, ever.  dim 64 × (1e7)² per-term fits
  int64 with 3 decades of headroom.
- **Updates**: centroid components are floored integer means
  (``sum // count``); empty clusters keep their previous centroid.
- **Ties**: argmin on (distance, cluster-id).

Plan shape (the 100 TB story): each Lloyd iteration is one zero-join
map pass over the vectors — the k centroids ride as plan literals
(k·dim ≤ a few thousand int64s, one ``F.expr`` array each — the
driver-side-construction lesson) with an ``array_min`` argmin, plus one
(cluster, pos)-keyed rollup whose output is k·dim rows (model-sized,
collected and documented).  Nothing is ever corpus × corpus; the per-
iteration shuffle carries k·dim partial sums per partition, not vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

_MICRO = 1_000_000


def _quantize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _MICRO + F.lit(0.5)).cast("long"),
    )
    return emb.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), xq.alias("_xq")
    )


def _assign(q: DataFrame, cents: list[list[int]], id_col: str) -> DataFrame:
    # The argmin tree is rendered as ONE SQL string and parsed in a single
    # py4j call: the previous per-centroid Column construction (one
    # F.expr parse + two Python lambdas + struct/array per centroid) cost
    # ~0.6-1.0 s of driver round-trips per assign pass at k=8·dim=64,
    # dominating the 2000-row execution itself (guide §1.2 driver-side
    # work; same fix family as the r17 literal-construction commit).
    # The parsed tree — zip_with/aggregate fold, 0L accumulator,
    # named_struct('d', …, 'i', CAST(ci AS INT)), array_min tie order —
    # is node-for-node the tree the Column API built; output and plan
    # are unchanged.
    terms = ",".join(
        "named_struct('d', aggregate(zip_with(`_xq`, array("
        + ",".join(f"{int(v)}L" for v in c)
        + "), (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), "
        "(acc, x) -> acc + x), "
        f"'i', CAST({ci} AS INT))"
        for ci, c in enumerate(cents)
    )
    best = F.expr(f"array_min(array({terms}))")
    return q.select(
        id_col, "_xq",
        best.getField("i").alias("cluster"),
        best.getField("d").alias("dist_sq_q"),
    )


def _assign_np(q: DataFrame, cents: list[list[int]], id_col: str) -> DataFrame:
    """Vectorized assignment twin of ``_assign`` — the production path
    for large k·dim, where the literal-centroid Catalyst tree stops
    scaling (k·dim literals: plan CONSTRUCTION alone dominates past
    ~k=64 at dim 64 — measured, see SCALE.md r9 k-means leg).  One
    ``mapInPandas`` pass; the centroid matrix rides in the closure
    (k·dim int64 — model-sized).  Math is EXACT int64, identical to the
    HOF fold: |x|² - 2x·c + |c|² with every term ≤ dim·(1e7)², and ties
    argmin-to-lowest-cluster (np.argmin returns the first minimum) —
    bit-identical output, pinned by test_kmeans_np_assign_parity."""
    import numpy as np
    from pyspark.sql import types as T

    C = np.array(cents, dtype=np.int64)          # k × dim
    c_sq = (C * C).sum(axis=1)                   # k

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("_xq", T.ArrayType(T.LongType())),
        T.StructField("cluster", T.IntegerType()),
        T.StructField("dist_sq_q", T.LongType()),
    ])

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(list(pdf["_xq"]), dtype=np.int64)   # b × dim
            x_sq = (X * X).sum(axis=1)                       # b
            d = x_sq[:, None] - 2 * (X @ C.T) + c_sq[None, :]  # b × k
            best = d.argmin(axis=1)                          # first-min tie
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "_xq": pdf["_xq"],
                "cluster": best.astype("int32"),
                "dist_sq_q": d[np.arange(len(X)), best],
            })

    return q.mapInPandas(assign, schema)


def kmeans_representatives(emb: DataFrame, k: int = 8, n_iter: int = 2,
                           m: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Cluster-balanced representative selection: the ``m`` most central
    members of each k-means cluster (smallest exact squared distance to
    the final centroid; ties to the lowest id) — the deterministic
    coreset / "show me each topic" sample that a random draw can't give.

    Plan: the ``kmeans_quantized`` passes plus the cluster-keyed top-m
    rank, run through the two-level scheme shared with the ANN family
    (similarity.py::partial_topk, r14): a (cluster, input-partition)
    pre-rank bounds the final exact window's input at
    shuffle-partitions × m per cluster — the window has only k
    partitions, so without the partial stage its reducer input grows
    with the corpus's input splits no matter the cluster size.

    Output: ``(id_col, cluster int, dist_sq_q bigint, rank int)``.
    """
    from pyspark.sql import Window

    from grower_spark.operators.similarity import partial_topk

    if m <= 0:
        raise ValueError("m must be positive")
    assigned = kmeans_quantized(emb, k=k, n_iter=n_iter, id_col=id_col,
                                vec_col=vec_col)
    order = [F.asc("dist_sq_q"), F.asc(id_col)]
    assigned = partial_topk(assigned, ["cluster"], order, m)
    w = Window.partitionBy("cluster").orderBy(*order)
    return (
        assigned.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= m)
    )


def kmeans_quantized(emb: DataFrame, k: int = 8, n_iter: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     assigner: str = "hof") -> DataFrame:
    """Deterministic Lloyd k-means: ``n_iter`` assignment passes with
    ``n_iter - 1`` integer-mean centroid updates in between, seeded by
    the ``k`` lowest-id vectors (cluster c = the c-th seed in id order).

    Output: ``(id_col, cluster int, dist_sq_q bigint)`` — the final
    assignment and its exact integer squared distance in micro² units.

    ``assigner`` picks the assignment kernel; both are exact int64 and
    bit-identical (parity pinned):

    - ``"hof"`` (default): centroids as plan literals, argmin as a
      Catalyst ``array_min`` fold — zero Python, oracle-exact, the
      certified path.  Plan size is k·dim literals, and the tree's
      construction+compilation grows superlinearly in k at fixed data
      (measured warm at ×10/20k vecs, dim 64, n_iter=2, dated
      2026-08-14: k=8 1.1 s, k=64 4.8 s, k=256 18.8 s).
    - ``"np"``: one vectorized int64 matmul per Arrow batch via
      ``mapInPandas``; the centroid matrix rides in the closure.
      Same ×10 leg: k=8 0.9 s, k=64 0.8 s, k=256 0.9 s — FLAT in k
      (data volume bound, not plan bound).

    Cutover guidance: the docstring's own sizing rule is k ~ sqrt(n),
    so any real corpus wants k ≥ 64 — use ``"np"`` there; ``"hof"``
    stays the default because it is the oracle-certifiable zero-Python
    path and wins nothing is lost at the k ≤ 16 of the driver rows.
    """
    if k <= 0 or n_iter <= 0:
        raise ValueError("k and n_iter must be positive")
    assign_fn = _assign_np if assigner == "np" else _assign
    q = _quantize(emb, id_col, vec_col)
    # bounded collect: the k seed vectors (k·dim int64s — model-sized)
    seeds = q.orderBy(id_col).limit(k).collect()
    if not seeds:
        return _assign(q, [[0]], id_col).select(id_col, "cluster", "dist_sq_q")
    cents = [list(r["_xq"]) for r in seeds]
    for it in range(n_iter - 1):
        assigned = assign_fn(q, cents, id_col)
        comp = assigned.select(
            "cluster", F.posexplode("_xq").alias("_pos", "_v")
        )
        # bounded collect: k·dim (cluster, pos) partial means
        rows = (
            comp.groupBy("cluster", "_pos")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep previous
        for r in rows:
            new_cents[r["cluster"]][r["_pos"]] = r["_s"] // r["_n"]
        cents = new_cents
    return assign_fn(q, cents, id_col).select(id_col, "cluster", "dist_sq_q")
