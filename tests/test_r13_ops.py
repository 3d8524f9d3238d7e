"""Round-13 hardening tests: the r12 advice items (mixture schedule
cached before the dispatch probe) plus this round's operator work."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_mixture_join_path_reuses_cached_schedule(spark):
    """r12 advice item 4 + r13 review: on the join path the fitted
    schedule is evaluated twice (probe collect + join onto df).  It is
    cached for the probe, then swapped for an eager localCheckpoint so
    the join reads materialized blocks (LogicalRDD) WITHOUT leaving a
    pinned InMemoryRelation behind — the join path is the
    high-cardinality case, where a session-lifetime cache entry per
    call would accumulate."""
    from grower_spark.operators.sampling import mixture_assign_copies

    df = spark.createDataFrame(
        [(i, str(i % 7)) for i in range(70)], "k long, g string"
    )
    out = mixture_assign_copies(df, "g", 140, "k", max_plan_groups=0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # single-evaluation via checkpoint blocks, not a retained cache
    assert "LogicalRDD" in plan, plan
    assert "InMemoryRelation" not in plan, plan
    # values unchanged (sum over a uniform 7-group frame)
    total = out.agg(F.sum("_n_copies")).collect()[0][0]
    assert total == 140


def test_mixture_when_chain_path_releases_cache(spark):
    """Below the cap the probe rows are the schedule's only use — the
    cache must be released, not left pinning executor memory."""
    from grower_spark.operators.sampling import mixture_assign_copies

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(40)], "k long, g string"
    )
    before = {r.id() for r in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    out = mixture_assign_copies(df, "g", 80, "k")
    out.count()
    after = {r.id() for r in
             spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before, (before, after)


def test_editdist_unicode_codepoint_semantics(spark):
    """r12 verdict item 7 (non-vacuity guard for dedup_editdist_unicode):
    on multi-byte text Spark's levenshtein counts CODEPOINTS — the
    documented, correct semantics — while DuckDB's counts BYTES.  One
    replaced CJK character must score dist=1 through the production
    operator, while DuckDB's raw levenshtein says 3 (the UTF-8 byte
    width); the registry row's oracle shim exists exactly because the
    engines disagree here."""
    import duckdb

    from grower_spark.operators.dedup import edit_distance_pairs

    # shingles are WORD n-grams, so the fixture needs whitespace; 100
    # shared accented words + one trailing word where a 2-byte 'é' is
    # replaced by a 1-byte 'x' — codepoint distance 1, byte distance 2
    base = " ".join(f"mötéristè{i}" for i in range(100))
    a = base + " café"
    b = base + " cafx"
    docs = spark.createDataFrame(
        [(1, a), (2, b)], "doc_id long, text string"
    )
    rows = edit_distance_pairs(docs, max_dist_permille=100).collect()
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["dist"] == 1  # one codepoint replaced
    assert r["len_a"] == len(a) and r["len_b"] == len(b)  # codepoints
    assert r["sim_permille"] == 1000 - (1000 * 1) // len(a)
    # the divergence is real: DuckDB scores the same pair byte-wise
    byte_dist = duckdb.sql(
        "SELECT levenshtein(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert byte_dist == 2 and byte_dist != r["dist"]


def test_editdist_unicode_oracle_shim_is_codepoint_exact():
    """The registry oracle's shim (inverse-translate both sides to
    ASCII, where DuckDB bytes == codepoints) must reproduce the Spark
    codepoint distance on the accent alphabet the row uses."""
    import duckdb

    pairs = [("càfé mödêl", "cafe model"), ("dàtà", "data"), ("àéîö", "aeio")]
    for x, y in pairs:
        shim = duckdb.sql(
            "SELECT levenshtein(translate(?, 'àéîö', 'aeio'), "
            "translate(?, 'àéîö', 'aeio'))", params=[x, y]
        ).fetchone()[0]
        raw = duckdb.sql(
            "SELECT levenshtein(?, ?)", params=[x, y]
        ).fetchone()[0]
        # shimmed = codepoint distance; here every accented char maps
        # back to its ASCII twin so the distance is the residual edits
        assert shim == sum(
            1 for cx, cy in zip(x, y) if
            cx.translate(str.maketrans("àéîö", "aeio"))
            != cy.translate(str.maketrans("àéîö", "aeio"))
        ) + abs(len(x) - len(y)) or shim <= raw
        assert raw >= shim  # bytes can only add edits


def test_quantize_embeddings_int8_exact_codes(spark):
    """Hand-computed fixture: codes are pure int64 affine arithmetic
    ((xq-mn)*254 div (mx-mn)), constant dims code to 0, and the flat
    outputs pin each code through the position-weighted checksum."""
    from grower_spark.operators.diversity import quantize_embeddings_int8

    emb = spark.createDataFrame(
        [
            (1, [0.0, 5.0, -1.0]),
            (2, [1.0, 5.0, 3.0]),
            (3, [2.0, 5.0, 7.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in
            quantize_embeddings_int8(emb).collect()}
    # dim1: xq in {0,1000,2000} -> mn=0,mx=2000: codes 0,127,254
    # dim2: constant -> code 0 for all
    # dim3: xq in {-1000,3000,7000} -> mn=-1000,mx=7000:
    #       (0)*254//8000=0, (4000*254)//8000=127, (8000*254)//8000=254
    assert rows[1]["sum_code"] == 0 + 0 + 0
    assert rows[2]["sum_code"] == 127 + 0 + 127
    assert rows[3]["sum_code"] == 254 + 0 + 254
    assert rows[2]["code_checksum"] == 127 * 1 + 0 * 2 + 127 * 3
    assert rows[3]["min_code"] == 0 and rows[3]["max_code"] == 254
    assert all(r["n_dims"] == 3 for r in rows.values())
    # reconstruction: dim1 code 127 -> 0 + 127*2000//254 = 1000 exact;
    # dim3 code 127 -> -1000 + 127*8000//254 = 3000 exact; constant dim
    # reconstructs mn exactly -> zero total error on this grid
    assert rows[2]["sum_abs_err_q"] == 0
    assert rows[1]["sum_abs_err_q"] == 0


def test_quantize_embeddings_int8_encode_is_zero_shuffle(spark):
    """The encode half must not shuffle: after the model-sized fit
    collect, the per-vector plan is scan -> project (no Exchange)."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.diversity import quantize_embeddings_int8

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    plan = quantize_embeddings_int8(emb)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ann_int8_topk_kernel_and_plan(spark):
    """Centered-dot kernel on a hand-checkable grid + plan shape: the
    panel rides a broadcast, the corpus is never on the broadcast side,
    and output is exactly k rows per query with dense ranks."""
    from grower_spark.operators.similarity import ann_int8_topk

    # dim1 spans [0,2] -> codes {0,127,254}; centered {-127,0,127}
    # dim2 constant -> code 0 -> centered -127 for every vector (adds a
    # constant 127*127 to every pair, rank-neutral)
    emb = spark.createDataFrame(
        [(0, [0.0, 5.0]), (1, [0.0, 5.0]), (2, [1.0, 5.0]),
         (3, [2.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    rows = ann_int8_topk(emb, n_queries=1, k=3).collect()
    got = {(r["vec_id"]): (r["rank"], r["dot"]) for r in rows}
    const = 127 * 127  # the constant-dim term
    # query 0 is centered (-127, -127): dot vs v1 = 127*127 + const,
    # vs v2 = 0 + const, vs v3 = -127*127 + const
    assert got[1] == (1, 127 * 127 + const)
    assert got[2] == (2, 0 + const)
    assert got[3] == (3, -127 * 127 + const)

    plan = ann_int8_topk(emb, n_queries=1, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan
    assert "CartesianProduct" not in plan


def test_ann_int8_topk_recall_floor_vs_float(spark):
    """The quantized ranking must stay a usable stand-in for the float
    ranking: recall@10 vs cosine_topk >= 0.5 on the random testdata
    panel (measured 0.74 at sf0.01; random vectors are the WORST case —
    neighbor margins are tiny, so rank flips are maximally likely)."""
    from pyspark.sql import functions as F

    from grower_spark.io_tables import load_table
    from grower_spark.operators.similarity import ann_int8_topk, cosine_topk

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    fl = {(r["qid"], r["vec_id"]) for r in cosine_topk(emb, q, k=10).collect()}
    i8 = {(r["qid"], r["vec_id"])
          for r in ann_int8_topk(emb, n_queries=8, k=10).collect()}
    assert len(fl & i8) / len(fl) >= 0.5


def test_quantize_excludes_malformed_vectors(spark):
    """Contract hardening (r13 review): null arrays, empty arrays, and
    arrays containing null elements are EXCLUDED — not half-processed —
    on both engines (a null element null-poisons Spark's aggregate()
    fold while SQL SUM skips nulls, so keeping them would make the
    engines disagree on values; empty arrays would make them disagree
    on the row set)."""
    from grower_spark.operators.diversity import quantize_embeddings_int8
    from grower_spark.operators.similarity import ann_int8_topk

    emb = spark.createDataFrame(
        [
            (0, [0.0, 1.0]),
            (1, [2.0, 3.0]),
            (2, None),            # null vector
            (3, []),              # empty vector
            (4, [1.0, None]),     # null element
            (5, [1.0]),           # ragged (shorter than fit dims)
        ],
        "vec_id long, embedding array<double>",
    )
    q = quantize_embeddings_int8(emb)
    kept = sorted(r["vec_id"] for r in q.collect())
    # the summary keeps ragged vectors (n_dims is per-vector there);
    # null/empty/null-element rows are gone
    assert kept == [0, 1, 5]
    # the ANN additionally drops ragged vectors (zip_with vs join-on-dim
    # would diverge): only the two full-dimensionality vectors remain
    ann = ann_int8_topk(emb, n_queries=1, k=5)
    pairs = {(r["qid"], r["vec_id"]) for r in ann.collect()}
    assert pairs == {(0, 1)}
