"""Multi-probe LSH: recall against brute-force ground truth must rise
monotonically with probes, and probe buckets must be distinct (no pair
duplication through the bucket join)."""

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.similarity import cosine_topk, lsh_ann_topk

from conftest import SF_SMALL

K = 5
N_QUERIES = 12


@pytest.fixture(scope="module")
def emb_and_queries(spark):
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").cache()
    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return emb, q


def _pairs(df):
    return {(r["qid"], r["vec_id"]) for r in df.collect()}


def test_multiprobe_recall_lift(spark, emb_and_queries):
    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])
    truth = _pairs(cosine_topk(emb, q, k=K))

    recalls = {}
    n_cands = {}
    for probes in (0, 2, 4):
        got = lsh_ann_topk(emb, q, k=K, n_planes=8, dim=dim, n_probes=probes)
        found = _pairs(got)
        recalls[probes] = len(found & truth) / len(truth)
        n_cands[probes] = len(found)

    # monotone: more probes never lose recall, and the full probe budget
    # must beat the single-bucket baseline on this data
    assert recalls[0] <= recalls[2] <= recalls[4], recalls
    assert recalls[4] > recalls[0], recalls
    # cost grows with probes but stays bounded by (n_probes+1) buckets
    assert n_cands[0] <= n_cands[2] <= n_cands[4]


def test_numpy_scorer_matches_hof_scorer(spark, emb_and_queries):
    """cosine_topk_np (BLAS matmul in mapInPandas, map-side partial top-k)
    must produce the same ranked neighbors as the Catalyst-HOF version —
    same contract, different physical strategy."""
    from grower_spark.operators.similarity import cosine_topk_np

    emb, q = emb_and_queries
    hof = {(r["qid"], r["vec_id"], r["rank"]) for r in cosine_topk(emb, q, k=K).collect()}
    np_ = {(r["qid"], r["vec_id"], r["rank"]) for r in cosine_topk_np(emb, q, k=K).collect()}
    assert hof == np_


def test_ivf_recall_monotone_in_probes(spark, emb_and_queries):
    """IVF ANN: probing more cells never loses recall and covers the whole
    corpus at n_probe == n_cells (exhaustive fallback == brute force)."""
    from grower_spark.operators.similarity import ivf_ann_topk

    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])
    truth = _pairs(cosine_topk(emb, q, k=K))

    recalls = {}
    for probe in (1, 4, 8):
        got = ivf_ann_topk(emb, q, k=K, n_cells=8, n_probe=probe, dim=dim)
        recalls[probe] = len(_pairs(got) & truth) / len(truth)
    assert recalls[1] <= recalls[4] <= recalls[8], recalls
    # probing every cell IS brute force
    assert recalls[8] == 1.0, recalls


def test_probe_buckets_distinct_no_pair_duplication(spark, emb_and_queries):
    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])
    got = lsh_ann_topk(emb, q, k=1000, n_planes=8, dim=dim, n_probes=4)
    # if the same (qid, vec_id) matched via two probes, row_number would
    # emit it twice with different ranks
    dupes = (
        got.groupBy("qid", "vec_id").count().where(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_np_rerank_matches_hof_rerank_lsh_and_ivf(spark, emb_and_queries):
    """scorer="np" must only change the scoring kernel, never the candidate
    set or the ranking (same rounded-to-4 scores, same tie-break)."""
    from grower_spark.operators.similarity import ivf_ann_topk

    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])

    def rows(df):
        return sorted(
            (r["qid"], r["rank"], r["vec_id"], r["sim_r4"]) for r in df.collect()
        )

    lsh_kw = dict(k=K, n_planes=8, dim=dim, n_probes=2)
    assert rows(lsh_ann_topk(emb, q, scorer="np", **lsh_kw)) == rows(
        lsh_ann_topk(emb, q, **lsh_kw)
    )
    ivf_kw = dict(k=K, n_cells=16, n_probe=2, dim=dim)
    assert rows(ivf_ann_topk(emb, q, scorer="np", **ivf_kw)) == rows(
        ivf_ann_topk(emb, q, **ivf_kw)
    )
    with pytest.raises(ValueError, match="hof|np"):
        lsh_ann_topk(emb, q, scorer="blas", **lsh_kw)


def test_kmeans_centroids_beat_fixed_grid(spark, emb_and_queries):
    """The trained spherical-k-means quantizer must dominate the
    data-independent md5 grid on recall@10 (deterministic: fixed sample,
    grid init, fixed iteration count)."""
    from grower_spark.operators.similarity import cosine_topk_np, ivf_ann_topk
    from grower_spark.operators.similarity import ivf_kmeans_centroids

    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])
    truth = _pairs(cosine_topk_np(emb, q, k=K))
    cents = ivf_kmeans_centroids(emb, n_cells=16, dim=dim)
    assert len(cents) == 16 and len(cents[0]) == dim

    def recall(centroids):
        got = _pairs(ivf_ann_topk(emb, q, k=K, n_cells=16, n_probe=2, dim=dim,
                                  scorer="np", centroids=centroids))
        return len(got & truth) / len(truth)

    r_grid, r_kmeans = recall(None), recall(cents)
    assert r_kmeans >= r_grid, (r_kmeans, r_grid)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="centroids"):
        ivf_ann_topk(emb, q, n_cells=16, dim=dim, centroids=cents[:5])


def test_np_paths_empty_query_set(spark, emb_and_queries):
    """Empty query sets must return empty results, not crash in numpy."""
    from grower_spark.operators.similarity import cosine_topk_np, ivf_ann_topk

    emb, q = emb_and_queries
    dim = len(emb.select("embedding").first()[0])
    empty_q = q.where("qid < -1")
    assert cosine_topk_np(emb, empty_q).count() == 0
    assert lsh_ann_topk(emb, empty_q, n_planes=4, dim=dim, scorer="np").count() == 0
    assert ivf_ann_topk(emb, empty_q, n_cells=4, dim=dim, scorer="np").count() == 0


def test_kmeans_centroids_empty_corpus_loud(spark):
    import pytest as _pytest
    from grower_spark.operators.similarity import ivf_kmeans_centroids

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="empty corpus sample"):
        ivf_kmeans_centroids(empty, n_cells=4, dim=4)
