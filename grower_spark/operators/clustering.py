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
    terms = F.array(*[
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("_xq"),
                    F.expr("array(" + ",".join(f"{int(v)}L" for v in c) + ")"),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(ci).cast("int").alias("i"),
        )
        for ci, c in enumerate(cents)
    ])
    best = F.array_min(terms)
    return q.select(
        id_col, "_xq",
        best.getField("i").alias("cluster"),
        best.getField("d").alias("dist_sq_q"),
    )


def kmeans_representatives(emb: DataFrame, k: int = 8, n_iter: int = 2,
                           m: int = 10, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Cluster-balanced representative selection: the ``m`` most central
    members of each k-means cluster (smallest exact squared distance to
    the final centroid; ties to the lowest id) — the deterministic
    coreset / "show me each topic" sample that a random draw can't give.

    Plan: the ``kmeans_quantized`` passes plus ONE cluster-keyed top-m
    window.  The window has k partitions, so k should grow with the
    corpus (k ~ sqrt(n) is the usual IVF sizing); per-partition work is
    a sort of that cluster's members, the same grouped-top-k shape as
    events_topk_per_user.

    Output: ``(id_col, cluster int, dist_sq_q bigint, rank int)``.
    """
    from pyspark.sql import Window

    if m <= 0:
        raise ValueError("m must be positive")
    assigned = kmeans_quantized(emb, k=k, n_iter=n_iter, id_col=id_col,
                                vec_col=vec_col)
    w = Window.partitionBy("cluster").orderBy(
        F.asc("dist_sq_q"), F.asc(id_col)
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= m)
    )


def kmeans_quantized(emb: DataFrame, k: int = 8, n_iter: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic Lloyd k-means: ``n_iter`` assignment passes with
    ``n_iter - 1`` integer-mean centroid updates in between, seeded by
    the ``k`` lowest-id vectors (cluster c = the c-th seed in id order).

    Output: ``(id_col, cluster int, dist_sq_q bigint)`` — the final
    assignment and its exact integer squared distance in micro² units.
    """
    if k <= 0 or n_iter <= 0:
        raise ValueError("k and n_iter must be positive")
    q = _quantize(emb, id_col, vec_col)
    # bounded collect: the k seed vectors (k·dim int64s — model-sized)
    seeds = q.orderBy(id_col).limit(k).collect()
    if not seeds:
        return _assign(q, [[0]], id_col).select(id_col, "cluster", "dist_sq_q")
    cents = [list(r["_xq"]) for r in seeds]
    for it in range(n_iter - 1):
        assigned = _assign(q, cents, id_col)
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
    return _assign(q, cents, id_col).select(id_col, "cluster", "dist_sq_q")
