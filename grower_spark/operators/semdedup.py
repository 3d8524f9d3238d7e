"""SemDeDup: semantic (embedding-space) deduplication.

The SemDeDup recipe (Abbas et al., 2023): cluster the corpus embeddings
with a coarse quantizer, compare pairs only *within* a cluster, and keep
one representative of each group of semantic duplicates (pairwise cosine
above a threshold).  Near-duplicate *meaning* — paraphrases, reposts
with edits, templated rewrites — that n-gram dedup cannot see.

Spark-first shape, same candidate-generation discipline as the ANN layer
(``operators/similarity.py``):

- cell assignment is a map-side plan-time-literal argmax over the
  injectable centroid set (the deterministic md5 grid by default — what
  makes the DuckDB oracle possible; swap ``ivf_kmeans_centroids`` in
  production);
- the ONLY corpus shuffle key is the bounded cell id;
- within-cell comparison is quadratic *in the cell*, which is the
  operator's contract: the quantizer's cell count is the knob that keeps
  cells bounded (SemDeDup itself sizes k ~ corpus/1e4).  ``max_cell_width``
  guards against degenerate cells (the round-6 x30 lesson: caps must
  scale with expected cluster size).

Keep policy: a vector is dropped iff some LOWER-id vector in its cell is
within the threshold — i.e. the first-by-id member of every duplicate
group survives (deterministic, layout-independent, and exactly the
"keep one per group" greedy the paper applies).  ``dup_of`` reports the
most-similar lower-id duplicate (ties to the lowest id) for audit.

Two scorers with one contract (pinned equal by pytest):

- ``scorer="hof"`` — Catalyst-side cell self-join + exact cosine; every
  step SQL-expressible, hence oracle-checked.
- ``scorer="np"``  — ONE shuffle (groupBy cell) + per-cell BLAS gram
  matrix in ``applyInPandas``; the production path at real embedding
  widths (the pairwise matmul is the whole point of clustering first).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from grower_spark.operators.similarity import (
    _cell_struct_sql,
    cosine,
    dot_fold,
    ivf_centroids,
    l2_norm,
)


def assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Map-side coarse quantization: argmax centroid dot per row (ties to
    the lower cell index), as a plan-time literal expression — no shuffle,
    no Python."""
    return corpus.withColumn(
        out_col, F.expr(f"least({_cell_struct_sql(vec_col, centroids)}).i")
    )


def semdedup(
    corpus: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[list[list[float]]] = None,
    max_cell_width: Optional[int] = None,
    scorer: str = "hof",
) -> DataFrame:
    """(id, cell, keep, dup_of, max_sim_r4) for every corpus vector.

    ``keep`` is False iff a lower-id vector in the same cell has rounded
    cosine >= threshold; ``dup_of``/``max_sim_r4`` identify the best such
    witness (NULL for keepers).  The threshold compares the 4-decimal
    rounded similarity so every engine agrees at the boundary.

    ``max_cell_width``: cells wider than the cap are passed through as
    keep=True (flagged nowhere — size the quantizer instead; the cap is a
    safety valve against a degenerate quantizer, not a tuning knob).
    """
    cents = centroids if centroids is not None else ivf_centroids(n_cells, dim)
    if len(cents) != n_cells:
        raise ValueError(f"expected {n_cells} centroids, got {len(cents)}")

    assigned = assign_cells(corpus, cents, vec_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"), F.col("cell")
    )

    if scorer == "np":
        import numpy as np
        import pandas as pd

        thr = threshold
        cap = max_cell_width

        def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("_id", ignore_index=True)
            n = len(pdf)
            cell = pdf["cell"].iloc[0] if n else 0
            if n < 2 or (cap is not None and n > cap):
                return pd.DataFrame(
                    {
                        "vec_id": pdf["_id"],
                        "cell": pdf["cell"],
                        "keep": [True] * n,
                        "dup_of": pd.array([None] * n, dtype="Int64"),
                        "max_sim_r4": pd.array([None] * n, dtype="float64"),
                    }
                )
            M = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            norms = np.sqrt((M * M).sum(axis=1))
            S = np.round((M @ M.T) / np.outer(norms, norms), 4)
            ids = pdf["_id"].to_numpy()
            keep, dup_of, max_sim = [], [], []
            for i in range(n):
                sims = S[i, :i]
                hit = sims >= thr
                if hit.any():
                    best = np.flatnonzero(hit & (sims == sims[hit].max()))[0]
                    keep.append(False)
                    dup_of.append(int(ids[best]))
                    max_sim.append(float(sims[best]))
                else:
                    keep.append(True)
                    dup_of.append(None)
                    max_sim.append(None)
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "cell": [cell] * n,
                    "keep": keep,
                    "dup_of": pd.array(dup_of, dtype="Int64"),
                    "max_sim_r4": pd.array(max_sim, dtype="float64"),
                }
            )

        out = assigned.groupBy("cell").applyInPandas(
            dedup_cell, "vec_id long, cell int, keep boolean, dup_of long, max_sim_r4 double"
        )
        return out.withColumnRenamed("vec_id", id_col)

    # HOF / oracle path: cell-keyed self-join, i > j pairs only.  Norms
    # are hoisted to the join SIDES — one fold per row instead of two per
    # pair in the O(cell²) stream; bit-identical floats (same fold, same
    # ``dot / (norm_a * norm_b)`` division order as ``cosine``).
    a = assigned.select(
        F.col("cell"), F.col("_id").alias("_ida"), F.col("_vec").alias("_veca"),
        l2_norm(F.col("_vec")).alias("_na"),
    )
    b = assigned.select(
        F.col("cell"), F.col("_id").alias("_idb"), F.col("_vec").alias("_vecb"),
        l2_norm(F.col("_vec")).alias("_nb"),
    )
    if max_cell_width is not None:
        widths = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_w"))
        ok = widths.where(F.col("_w") <= max_cell_width).select("cell")
        a = a.join(ok, "cell")
        b = b.join(ok, "cell")
    pairs = a.join(b, "cell").where(F.col("_ida") > F.col("_idb"))
    sims = pairs.select(
        "_ida",
        "_idb",
        F.round(
            dot_fold(F.col("_veca"), F.col("_vecb"))
            / (F.col("_na") * F.col("_nb")),
            4,
        ).alias("sim_r4"),
    ).where(F.col("sim_r4") >= threshold)
    # best lower-id witness per dropped vector: max (sim, -id) struct
    best = sims.groupBy("_ida").agg(
        F.max(F.struct(F.col("sim_r4"), (-F.col("_idb")).alias("_negid"))).alias("_b")
    ).select(
        F.col("_ida").alias("_id"),
        (-F.col("_b._negid")).alias("dup_of"),
        F.col("_b.sim_r4").alias("max_sim_r4"),
    )
    out = assigned.join(best, "_id", "left")
    return out.select(
        F.col("_id").alias(id_col),
        "cell",
        F.col("dup_of").isNull().alias("keep"),
        "dup_of",
        "max_sim_r4",
    )


def semdedup_keep(
    corpus: DataFrame,
    n_cells: int = 16,
    dim: int = 64,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[list[list[float]]] = None,
    max_cell_width: Optional[int] = None,
    scorer: str = "hof",
) -> DataFrame:
    """The corpus filtered to SemDeDup keepers (original columns)."""
    flags = semdedup(
        corpus, n_cells, dim, threshold, id_col, vec_col, centroids,
        max_cell_width, scorer,
    ).where("keep").select(id_col)
    return corpus.join(flags, id_col, "left_semi")
