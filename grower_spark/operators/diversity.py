"""Corpus embedding diversity without pair enumeration.

Mean pairwise squared euclidean distance over a set of vectors has a
closed form in the first two moments:

    E||x - y||^2  =  2 * ( E||x||^2  -  ||E x||^2 )

so the "how spread out is this corpus / topic / source" signal — used to
detect mode collapse in a filtered training set, compare source variety,
or rank clusters by internal heterogeneity — needs ZERO pairwise work:
one aggregation pass computes sum-of-squared-norms and the per-dimension
vector sum, and the identity does the rest.  The naive all-pairs form is
O(n^2 d); this is O(n d) with a model-sized result, which is the entire
100 TB story.

Integer-exact verification: vectors are quantized to milli units
(floor(x*1000 + 0.5), the clustering.py convention at a coarser scale so
the n^2-order moments stay inside int64), making every sum exact and
order-free — both engines produce bit-identical BIGINTs regardless of
partitioning or summation order, and the final double is ONE exact-
rounded int64/int64 division.  Overflow bound: with |x| <= ~8 the n*S2
term stays under 2^63 up to ~2e6 vectors per group; production runs at
float64 (summation-order noise ~1e-12, harmless for a diversity signal)
— same verification-vs-production split as md5_60/xxhash_60.

Plan shape: one posexplode → (group, pos)-keyed partial-agg shuffle
(map-side combine reduces it to partitions × groups × dim rows) →
group-keyed rollup of the model-sized moment table.  Nothing is ever
corpus × corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

_Q = 1_000  # milli quantization: keeps n*S2 inside int64 at ~1e6 rows/group


def embedding_diversity(emb: DataFrame, group_col: str = "label",
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Per-group mean pairwise squared distance via the moment identity.

    Emits, per group: ``n`` (vectors), ``s2_sum`` (Σ||x_q||², exact
    int64), ``norm_mean_sq`` (Σ_d (Σ x_q,d)², exact int64) and
    ``diversity`` = 2*(n*s2_sum − norm_mean_sq)/n² in quantized units² —
    a single exact-rounded division, engine-portable bit-for-bit.

    Groups with one vector report diversity 0 (no pairs).
    """
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )
    base = emb.where(F.col(vec_col).isNotNull()).select(
        F.col(group_col).alias("grp"), xq.alias("_xq")
    )
    # per-row squared norm folds JVM-side; the per-dim sums need the
    # (grp, pos) rollup — partial aggregation keeps the shuffle at
    # partitions x groups x dim rows, not corpus x dim
    exploded = base.select(
        "grp",
        F.posexplode("_xq").alias("pos", "xqd"),
    )
    # the per-dim rollup already counts the vectors (rows at any one pos
    # == n; max covers ragged short vectors) — deriving n here instead of
    # a second corpus-side groupBy saves a full aggregation pass
    # (r9 plan-audit fix: 3 shuffles → 2, one corpus scan)
    dims = exploded.groupBy("grp", "pos").agg(
        F.sum("xqd").alias("s1"),
        F.sum(F.col("xqd") * F.col("xqd")).alias("s2p"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    moments = dims.groupBy("grp").agg(
        F.sum(F.col("s1") * F.col("s1")).alias("norm_mean_sq"),
        F.sum("s2p").alias("s2_sum"),
        F.max("_cnt").alias("n"),
    )
    num = F.lit(2) * (F.col("n") * F.col("s2_sum") - F.col("norm_mean_sq"))
    return (
        moments
        .select(
            F.col("grp").alias(group_col),
            F.col("n").cast("long").alias("n"),
            F.col("s2_sum").cast("long").alias("s2_sum"),
            F.col("norm_mean_sq").cast("long").alias("norm_mean_sq"),
            (num.cast("double")
             / (F.col("n") * F.col("n")).cast("double")).alias("diversity"),
        )
    )


def embedding_dim_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension mean/variance of an embedding column — the fit half
    of whitening / standardization before ANN or clustering (a dimension
    with 100× the variance of the rest silently dominates every euclidean
    distance; this table is what you inspect, and what a z-score
    transform broadcasts back).

    Same integer-moment machinery as embedding_diversity: milli-quantized
    int64 sums are summation-order-free (bit-identical on any
    partitioning), and ``mean = S1/n`` / ``var = (n·S2 − S1²)/n²`` are
    single exact-rounded divisions of exact int64s, so both engines agree
    bit-for-bit.  Output is model-sized (one row per dimension);
    ``dim`` is 1-based.  The shuffle carries partitions × dim partial
    rows (map-side combine), never corpus × dim.
    """
    xq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )
    exploded = emb.where(F.col(vec_col).isNotNull()).select(
        F.posexplode(xq).alias("pos", "xqd")
    )
    agg = exploded.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xqd").alias("s1"),
        F.sum(F.col("xqd") * F.col("xqd")).alias("s2"),
    )
    var_num = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    return agg.select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("n").cast("long").alias("n"),
        (F.col("s1").cast("double") / F.col("n").cast("double")).alias("mean_q"),
        (var_num.cast("double")
         / (F.col("n") * F.col("n")).cast("double")).alias("var_q"),
    )


def _well_formed(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """The int8 family's shared row-set filter: null/empty arrays and
    arrays containing null elements are EXCLUDED, not half-processed (a
    null element would null-poison Spark's aggregate() fold while SQL
    SUM skips nulls — the engines must agree on the same row set, so
    the contract is 'well-formed vectors only' on both sides)."""
    return emb.where(
        F.col(vec_col).isNotNull() & F.col(id_col).isNotNull()
        & (F.size(F.col(vec_col)) > 0)
        & F.expr(f"!exists({vec_col}, x -> x is null)")
    )


def _xq_col(vec_col: str):
    """Milli-quantized int64 view of a float vector column — the shared
    first step of fit and encode (they MUST agree bit-for-bit)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * _Q + F.lit(0.5)).cast("long"),
    )


def quantize_fit(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict[int, tuple[int, int]]:
    """FIT half of the int8 quantizer, exposed on its own so a persisted
    ANN index can store it and query-time encodes can reuse it without
    re-scanning the corpus (r14 verdict "What's missing" 3): per-dim
    min/max over the milli-quantized well-formed rows, returned as a
    model-sized ``{0-based pos: (mn, mx)}`` dict (one bounded collect —
    dim rows, the same "model, not data" collect as tokenize_ids'
    vocabulary)."""
    clean = _well_formed(emb, vec_col, id_col)
    fit = (
        clean.select(F.posexplode(_xq_col(vec_col)).alias("pos", "xqd"))
        .groupBy("pos")
        .agg(F.min("xqd").alias("mn"), F.max("xqd").alias("mx"))
        .collect()
    )
    return {r["pos"]: (int(r["mn"]), int(r["mx"])) for r in fit}


def _lit_long_array(vals) -> Column:
    """A literal ``array<long>`` Column from one SQL parse instead of
    per-element ``F.lit`` Columns — O(1) py4j round-trips instead of
    O(len).  Empty stays on the F.array() path (zero-arg SQL ``array()``
    types as array<null> too; the cast pins it either way)."""
    if not vals:
        return F.array().cast("array<long>")
    return F.expr(
        "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"
    ).cast("array<long>")


def encode_with_fit(
    emb: DataFrame,
    by_pos: dict[int, tuple[int, int]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 254,
) -> DataFrame:
    """ENCODE half of the int8 quantizer against a PRE-FITTED per-dim
    min/max (``quantize_fit`` output or a persisted index's stored fit):
    returns the well-formed input rows with ``_codes`` (array<long>,
    values 0..levels) plus the ``_mn``/``_mx`` literal arrays still
    attached for reconstruction.  Zero-shuffle — each vector maps
    through a codegen'd ``transform`` against the fit literals; callers
    encoding QUERY vectors against a stored corpus fit get the exact
    codes the index build produced for the same floats."""
    clean = _well_formed(emb, vec_col, id_col)
    xq = _xq_col(vec_col)
    # Empty fit (every row null/empty/null-element): a zero-arg F.array()
    # is array<null> and the transform below fails type-checking
    # (r13 advice item 1) — the .cast("array<long>") pins the element
    # type either way, and the zero surviving rows make the (now
    # well-typed) expressions vacuous.
    #
    # Built as ONE sql-parsed literal per array, not F.array(*[F.lit..]):
    # the per-element Column path costs 2·dim driver->JVM round-trips per
    # call (~0.5-2 s of pure plan construction at dim=64, paid on EVERY
    # query-panel encode), the string parse costs one (guide §1.2 step 2:
    # per-call driver work is part of the operator's cost).  The parsed
    # expression tree (CAST(array(..L) AS ARRAY<BIGINT>)) is the same.
    mn_arr = _lit_long_array([by_pos[p][0] for p in sorted(by_pos)])
    mx_arr = _lit_long_array([by_pos[p][1] for p in sorted(by_pos)])
    lv = int(levels)
    # try_element_at, not element_at: with a STORED fit (the persisted
    # ANN index) a query vector can be LONGER than the fit dimensionality
    # (or the fit empty), and element_at throws out-of-bounds where the
    # contract wants null codes that the caller's full-dimensionality
    # filter then excludes.  In-range behavior is identical, so the
    # one-shot quantizer's certified outputs are unchanged.
    return (
        clean.withColumn("_xq", xq)
        .withColumn("_mn", mn_arr)
        .withColumn("_mx", mx_arr)
        .withColumn("_codes", F.expr(
            f"transform(_xq, (x, i) -> CASE "
            f"WHEN try_element_at(_mx, i+1) = try_element_at(_mn, i+1) "
            f"THEN CAST(0 AS BIGINT) "
            f"ELSE ((x - try_element_at(_mn, i+1)) * CAST({lv} AS BIGINT)) "
            f"div (try_element_at(_mx, i+1) - try_element_at(_mn, i+1)) "
            f"END)"
        ))
    )


def quantized_codes(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 254,
) -> DataFrame:
    """The quantizer's core, exposed for downstream consumers (the
    summary row and int8 ANN): :func:`quantize_fit` (per-dim min/max
    collected into plan literals) composed with :func:`encode_with_fit`
    (zero-shuffle codegen transform); see quantize_embeddings_int8 for
    the full contract.  Callers that want fit-once/encode-many (the
    persisted ANN index) use the two halves directly."""
    return encode_with_fit(
        emb, quantize_fit(emb, vec_col=vec_col, id_col=id_col),
        vec_col=vec_col, id_col=id_col, levels=levels,
    )


def quantize_embeddings_int8(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 254,
) -> DataFrame:
    """Scalar int8 quantization of an embedding column — the 4× memory
    cut that makes a 100 TB float32 embedding store fit hot storage (and
    the baseline every PQ/OPQ scheme is measured against).

    Two-phase plan, shaped for scale:

    * FIT: one posexplode → (pos)-keyed min/max aggregation.  Map-side
      combine reduces the shuffle to partitions × dim rows and the
      result is model-sized (one row per dimension) — it is collect()ed
      into plan literals, the same bounded "model, not data" collect as
      tokenize_ids' vocabulary.
    * ENCODE: zero-shuffle — each vector maps through a codegen'd
      ``transform`` against the broadcast min/max literals; nothing is
      ever corpus × corpus and no row leaves its partition.

    Integer-exact verification (the embedding_dim_stats discipline):
    values are milli-quantized to int64 first, so the affine code
    ``(xq - mn) * levels DIV (mx - mn)`` (codes 0..levels, offset-binary
    for int8 at levels=254: subtract 127 on storage) and the
    reconstruction ``mn + code * (mx - mn) DIV levels`` are pure int64
    arithmetic — bit-identical across engines and partitionings.  A
    constant dimension (mx == mn) codes to 0.  Output is one flat row
    per vector: code moments + a position-weighted checksum + the total
    fixed-point reconstruction error, so the certified hash pins every
    individual code without shipping arrays (the driver contract needs
    flat scalars).
    """
    coded = quantized_codes(emb, vec_col=vec_col, id_col=id_col,
                            levels=levels).withColumn("_recon", F.expr(
        f"transform(_codes, (c, i) -> element_at(_mn, i+1) + "
        f"(c * (element_at(_mx, i+1) - element_at(_mn, i+1))) "
        f"div CAST({int(levels)} AS BIGINT))"
    ))
    return coded.select(
        F.col(id_col).cast("long").alias(id_col),
        F.size("_codes").cast("int").alias("n_dims"),
        F.expr("aggregate(_codes, 0L, (a, c) -> a + c)").alias("sum_code"),
        F.array_min("_codes").cast("long").alias("min_code"),
        F.array_max("_codes").cast("long").alias("max_code"),
        F.expr(
            "aggregate(transform(_codes, (c, i) -> c * (CAST(i AS BIGINT)"
            " + 1)), 0L, (a, v) -> a + v)"
        ).alias("code_checksum"),
        F.expr(
            "aggregate(zip_with(_xq, _recon, (x, r) -> abs(x - r)), "
            "0L, (a, v) -> a + v)"
        ).alias("sum_abs_err_q"),
    )
