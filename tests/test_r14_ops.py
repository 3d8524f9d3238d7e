"""Round-14 additions.

- Map-side partial top-k ahead of the exact rank window in the top-k
  family (r13 verdict item 2): cosine_topk / hard_negative_topk /
  ann_int8_topk used to funnel the full N x Q scored stream into
  <= n_queries reducer tasks; now a (key, input-partition) pre-rank
  bounds the final window's input at partitions x k per key.  The
  certified output must be IDENTICAL — pinned here by parity against a
  plain single-window reference and by partitioning invariance.
- ann_int8_rerank (r13 verdict "What's missing" 2): int8 shortlist ->
  float cosine rerank; recall@10 pinned strictly above the int8-only
  scan's.
- quantized_codes empty-fit short-circuit (r13 advice item 1).
- Native-frame receive ceiling (r13 advice item 2).
"""

import struct

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from grower_spark.operators.similarity import (
    ann_int8_rerank,
    ann_int8_topk,
    cosine,
    cosine_topk,
    hard_negative_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def _single_window_cosine_topk(corpus, queries, k=10):
    """The pre-r14 reference implementation: one global rank window over
    the whole scored stream (correct, but fixed-width at scale)."""
    pairs = corpus.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("qid")
    )
    scored = pairs.select(
        "qid", "vec_id",
        F.round(cosine(F.col("qvec"), F.col("embedding")), 4).alias("sim_r4"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_r4"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "vec_id", "rank", "sim_r4")
    )


def test_partial_topk_matches_single_window(spark):
    """Exact parity: the two-level scheme keeps a superset of the global
    top-k per key (any global top-k row is within its own partition's
    top-k under the same total order), so the final window's output is
    bit-identical to the single-window reference."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").repartition(13)
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    got = sorted(map(tuple, cosine_topk(emb, q, k=10).collect()))
    ref = sorted(map(tuple, _single_window_cosine_topk(emb, q, k=10)
                     .collect()))
    assert got == ref and len(got) == 80


def test_partial_topk_partitioning_invariance(spark):
    """The _pp column is layout-dependent; the OUTPUT must not be: the
    same corpus through 1 partition and 16 partitions ranks
    identically (total order => the partial cut is layout-neutral)."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a = sorted(map(tuple,
                   ann_int8_topk(emb.repartition(1), n_queries=4, k=10)
                   .collect()))
    b = sorted(map(tuple,
                   ann_int8_topk(emb.repartition(16), n_queries=4, k=10)
                   .collect()))
    assert a == b and len(a) == 40


def test_partial_topk_plan_two_level_window(spark):
    """Plan pin (r13 verdict item 2 'Done' criterion): the top-k plan
    carries TWO rank windows — the (qid, _pp) partial stage whose
    shuffle key cardinality grows with the corpus, then the exact
    per-qid window over the bounded survivors."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = ann_int8_topk(emb, n_queries=4, k=10)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Window") >= 2, plan
    assert "_pp" in plan, plan
    # the partial stage must hash on (qid, _pp), not qid alone
    import re
    assert re.search(r"hashpartitioning\(qid[^)]*_pp", plan), plan


def test_hard_negative_partial_parity(spark):
    """hard_negative_topk through many partitions == through one
    (the label filter composes with the partial cut unchanged)."""
    rows = [(i, [float(i % 7), float((3 * i) % 5), 1.0], f"l{i % 3}")
            for i in range(60)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    q = corpus.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"))
    a = sorted(map(tuple, hard_negative_topk(
        corpus.repartition(1), q, k=7).collect()))
    b = sorted(map(tuple, hard_negative_topk(
        corpus.repartition(11), q, k=7).collect()))
    assert a == b and a


def test_partial_topk_bounds_final_window_input(spark):
    """The scale claim itself: the row count entering the final window
    is <= input-partitions x k per query — NOT proportional to corpus
    size.  Doubling the corpus at fixed partitioning must leave the
    bounded stream's size unchanged."""
    from grower_spark.operators.similarity import partial_topk

    def bounded_count(n_rows):
        rows = [(i, [float(i % 9) + 1.0, float((7 * i) % 11) + 1.0])
                for i in range(n_rows)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>").repartition(8)
        q = emb.where(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        pairs = emb.crossJoin(F.broadcast(q)).where(
            F.col("vec_id") != F.col("qid"))
        scored = pairs.select(
            "qid", "vec_id",
            F.round(cosine(F.col("qvec"), F.col("embedding")), 4)
            .alias("sim_r4"))
        pruned = partial_topk(
            scored, ["qid"], [F.desc("sim_r4"), F.asc("vec_id")], 10)
        return pruned.count()

    small, big = bounded_count(400), bounded_count(4000)
    # 4 queries x 8 partitions x k=10 = 320 cap, reached at both scales
    assert small <= 320 and big <= 320
    assert big <= small  # corpus x10 does not grow the window input


def test_grouped_topk_family_partitioning_invariance(spark):
    """The r14 partial stage extended to the OTHER corpus-scale top-k
    windows: kmeans_representatives (k cluster keys),
    cluster_balanced_sample (min-target branch now a bounded-fit plan
    literal — a joined rank cut was opaque to group-limit pruning), and
    bm25_topk (|queries| keys).  Each must be layout-invariant and keep
    its pre-change semantics."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.clustering import kmeans_representatives
    from grower_spark.operators.sampling import cluster_balanced_sample
    from grower_spark.operators.text import bm25_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    a = sorted(map(tuple, kmeans_representatives(
        emb.repartition(1), k=3, n_iter=1, m=4).collect()))
    b = sorted(map(tuple, kmeans_representatives(
        emb.repartition(9), k=3, n_iter=1, m=4).collect()))
    assert a == b and len(a) == 12

    assigned = spark.createDataFrame(
        [(i, i % 3) for i in range(40)] + [(100 + i, 7) for i in range(2)],
        "vec_id long, cluster int",
    )
    out1 = sorted(map(tuple, cluster_balanced_sample(
        assigned.repartition(1)).collect()))
    out11 = sorted(map(tuple, cluster_balanced_sample(
        assigned.repartition(11)).collect()))
    assert out1 == out11
    # strict balance: every cluster contributes exactly the smallest
    # cluster's size (2), ranks dense
    from collections import Counter
    sizes = Counter(c for _, c, _ in out1)
    assert set(sizes.values()) == {2} and len(sizes) == 4
    # capped branch still bounded + invariant
    cap = sorted(map(tuple, cluster_balanced_sample(
        assigned.repartition(5), per_cluster=3).collect()))
    assert Counter(c for _, c, _ in cap)[0] == 3
    # empty input: zero rows, no exception (the bounded fit is empty)
    empty = assigned.where(F.lit(False))
    assert cluster_balanced_sample(empty).count() == 0

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    qs = [(0, "the data pipeline"), (1, "model training")]
    r1 = sorted(map(tuple, bm25_topk(docs.repartition(1), qs, k=5)
                    .collect()))
    r9 = sorted(map(tuple, bm25_topk(docs.repartition(9), qs, k=5)
                    .collect()))
    assert r1 == r9 and r1


def test_ann_int8_rerank_recall_beats_int8_only(spark):
    """The rerank tier's reason to exist: recall@10 vs the exact float
    ranking strictly above the int8-only scan's (0.74 measured at
    sf0.01), because the float cosine re-orders the m=4k shortlist
    exactly and only shortlist misses remain."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    fl = {(r["qid"], r["vec_id"])
          for r in cosine_topk(emb, q, k=10).collect()}
    i8 = {(r["qid"], r["vec_id"])
          for r in ann_int8_topk(emb, n_queries=8, k=10).collect()}
    rr = {(r["qid"], r["vec_id"])
          for r in ann_int8_rerank(emb, n_queries=8, m=40, k=10).collect()}
    recall_i8 = len(fl & i8) / len(fl)
    recall_rr = len(fl & rr) / len(fl)
    assert recall_rr > recall_i8
    assert recall_rr >= 0.85  # measured 0.95 at sf0.001; floor with margin


def test_ann_int8_rerank_shape_and_plan(spark):
    """k rows per query, sims non-increasing within a query, ranks
    dense; shortlist and panel ride broadcasts — never a cartesian."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    df = ann_int8_rerank(emb, n_queries=4, m=20, k=5)
    rows = df.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["sim_r4"]))
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, 6))
        sims = [s for _, s in rs]
        assert sims == sorted(sims, reverse=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ann_ivf_int8_composition(spark):
    """IVF × int8 composed: every returned candidate must live in one of
    its query's probed cells (the IVF contract), scores must equal the
    exact int8 centered dot of that pair (the code-tier contract), and
    the result is layout-invariant.  Against the full int8 scan the
    probed subset keeps usable recall on the random panel."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.similarity import (
        _cell_ranking,
        ann_ivf_int8,
        ivf_centroids,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    out = ann_ivf_int8(emb, n_queries=4, k=10, n_cells=16, n_probe=2,
                       dim=64)
    rows = out.collect()
    assert rows and all(r["rank"] <= 10 for r in rows)

    # layout invariance
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, ann_ivf_int8(
        emb.repartition(13), n_queries=4, k=10, n_cells=16, n_probe=2,
        dim=64).collect()))
    assert a == b

    # membership: candidate's argmax cell ∈ query's probed cells
    cents = ivf_centroids(16, 64)
    cells = {
        r["vec_id"]: r["cells"]
        for r in emb.where(F.col("embedding").isNotNull()).select(
            "vec_id", _cell_ranking("embedding", cents).alias("cells")
        ).collect()
    }
    for r in rows:
        probed = cells[r["qid"]][:2]
        assert cells[r["vec_id"]][0] in probed, r

    # recall vs the exhaustive int8 scan: probing 2/16 cells keeps a
    # usable share of the true code-tier top-10 on random vectors
    full = {(r["qid"], r["vec_id"])
            for r in ann_int8_topk(emb, n_queries=4, k=10).collect()}
    ivf = {(r["qid"], r["vec_id"]) for r in rows}
    assert len(full & ivf) / len(full) >= 0.2

    # plan: the panel rides a broadcast; never a cartesian
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_quantize_empty_fit_short_circuit(spark):
    """r13 advice item 1: an all-malformed corpus (every row null/empty/
    null-element) used to make the zero-arg F.array() literals NullType
    and fail analysis with DATATYPE_MISMATCH; the array<long> cast keeps
    the plan well-typed and the result is simply zero rows — for the
    quantizer, the code-tier scan, and the rerank tier."""
    from grower_spark.operators.diversity import quantize_embeddings_int8

    emb = spark.createDataFrame(
        [(0, None), (1, []), (2, [1.0, None])],
        "vec_id long, embedding array<double>",
    )
    from grower_spark.operators.similarity import ann_ivf_int8

    assert quantize_embeddings_int8(emb).count() == 0
    assert ann_int8_topk(emb, n_queries=2, k=3).count() == 0
    assert ann_int8_rerank(emb, n_queries=2, m=6, k=3).count() == 0
    assert ann_ivf_int8(emb, n_queries=2, k=3, dim=2).count() == 0


def test_read_frame_rejects_oversize_declared_sizes():
    """r13 advice item 2: comp_size/data_size are u32 and are acted on
    BEFORE the checksum can verify, so a 25-byte header could demand a
    multi-GiB allocation.  Declared sizes above MAX_FRAME_RECV refuse
    the stream up front (ProtocolError), before any body read."""
    from grower_spark.sinks.chnative import (
        MAX_FRAME_RECV,
        ProtocolError,
        Reader,
        compress_frame,
        read_frame,
    )

    # sanity: a legitimate frame still round-trips
    data = b"x" * 100
    assert read_frame(Reader(data=compress_frame(data))) == data

    for comp_size, data_size in (
        (MAX_FRAME_RECV + 10, 100),      # oversize compressed
        (100, MAX_FRAME_RECV + 1),       # oversize decompressed
        (0xFFFFFFFF, 0xFFFFFFFF),        # hostile max-u32 header
    ):
        header = struct.pack("<BII", 0x82, comp_size, data_size)
        frame = b"\x00" * 16 + header    # checksum never reached
        with pytest.raises(ProtocolError, match="ceiling"):
            read_frame(Reader(data=frame))
