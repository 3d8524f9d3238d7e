"""SemDeDup (operators/semdedup.py).

Pins keep-first-by-id group semantics, cell blocking (cross-cell dups are
NOT compared — the operator's contract), the width cap, the np/hof scorer
parity, and the keep-side filter.
"""

import math

import pytest

from grower_spark.operators.semdedup import semdedup, semdedup_keep
from grower_spark.operators.similarity import ivf_centroids

from conftest import SF_SMALL

DIM = 8
CENTS = ivf_centroids(4, DIM)


def _vec(seed: float) -> list:
    # unit-ish vector tilted along centroid 0 plus a seed-driven wobble
    base = list(CENTS[0])
    v = [b + 0.001 * seed * ((i % 3) - 1) for i, b in enumerate(base)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


@pytest.fixture(scope="module")
def corpus(spark):
    far = list(CENTS[1])
    rows = [
        (10, _vec(0.0)),
        (11, _vec(0.1)),   # ~identical to 10 -> dropped, dup_of=10
        (12, _vec(0.2)),   # ~identical -> dropped, dup_of in {10, 11}
        (20, far),         # different cell, alone -> kept
        (30, [-x for x in CENTS[0]]),  # anti-parallel: same-ish region? different cell
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_keep_first_by_id(spark, corpus):
    out = {r.vec_id: r for r in semdedup(corpus, n_cells=4, dim=DIM, threshold=0.99, centroids=CENTS).collect()}
    assert out[10].keep and out[10].dup_of is None and out[10].max_sim_r4 is None
    assert not out[11].keep and out[11].dup_of == 10
    assert not out[12].keep and out[12].dup_of in (10, 11)
    assert out[20].keep
    assert out[30].keep


def test_dup_of_is_most_similar_lower_id(spark, corpus):
    out = {r.vec_id: r for r in semdedup(corpus, n_cells=4, dim=DIM, threshold=0.99, centroids=CENTS).collect()}
    # 12 is closer to 11 (wobble 0.1 apart) than to 10 (0.2 apart) unless
    # rounding ties them; either way dup_of must match the max rounded sim
    assert out[12].max_sim_r4 >= out[11].max_sim_r4 - 1e-9


def test_cell_blocking_is_the_contract(spark):
    # two near-identical vectors pushed into DIFFERENT cells are not
    # compared: semantic dedup only sees within-cluster pairs
    a = list(CENTS[0])
    b = list(CENTS[1])
    mid = [(x + y) / 2 for x, y in zip(a, b)]
    rows = [(1, a), (2, mid), (3, b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, n_cells=4, dim=DIM, threshold=0.0, centroids=CENTS)
    flags = {r.vec_id: r for r in out.collect()}
    cells = {k: v.cell for k, v in flags.items()}
    for vid, r in flags.items():
        if r.dup_of is not None:
            assert cells[vid] == cells[r.dup_of]


def test_max_cell_width_cap_passes_cells_through(spark, corpus):
    capped = semdedup(
        corpus, n_cells=4, dim=DIM, threshold=0.99, centroids=CENTS, max_cell_width=2
    )
    # cell of 10/11/12 has width 3 > 2: nothing dropped there
    out = {r.vec_id: r for r in capped.collect()}
    assert all(out[i].keep for i in (10, 11, 12))


def test_np_scorer_matches_hof_on_testdata(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    hof = sorted(map(tuple, semdedup(emb, threshold=0.4).collect()))
    np_ = sorted(map(tuple, semdedup(emb, threshold=0.4, scorer="np").collect()))
    assert hof == np_


def test_keep_filter_matches_flags(spark, corpus):
    kept = semdedup_keep(corpus, n_cells=4, dim=DIM, threshold=0.99, centroids=CENTS)
    flags = semdedup(corpus, n_cells=4, dim=DIM, threshold=0.99, centroids=CENTS)
    assert sorted(r.vec_id for r in kept.collect()) == sorted(
        r.vec_id for r in flags.where("keep").collect()
    )
