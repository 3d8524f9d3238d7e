"""End-to-end corpus dedup composition (tools/dedup_corpus.py):
normalize -> exact dedup -> LSH near-dup pairs -> clusters -> keep-list.
Planted exact variants and near-dups must drop; unique docs must keep."""

import pyspark.sql.functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while a cat sleeps near "
    "the warm stove and birds sing outside the open window all day long"
)


def test_keep_drop_composition(spark):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from dedup_corpus import build_keep_drop

    docs = spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE.upper()),                     # exact after normalize
            (2, BASE + "  "),                      # exact after normalize
            (3, BASE.replace("cat", "kitten")),    # near-dup of 0
            (4, "entirely different content about rivers and mountains and "
                "forests stretching far beyond the horizon under a pale sky"),
        ],
        ["doc_id", "text"],
    )
    keep, drops = build_keep_drop(docs, min_shared_bands=1)
    kept = sorted(r["doc_id"] for r in keep.collect())
    dropped = {r["doc_id"]: (r["kept_id"], r["reason"]) for r in drops.collect()}

    assert 0 in kept and 4 in kept          # cluster representative + unique
    assert dropped[1] == (0, "exact")
    assert dropped[2] == (0, "exact")
    assert 3 in dropped and dropped[3][1] == "near-dup" and dropped[3][0] == 0
    assert set(kept) | set(dropped) == {0, 1, 2, 3, 4}
    assert set(kept) & set(dropped) == set()


def test_append_keep_drop_incremental(spark, tmp_path):
    """Continuous-ingest dedup: append batches against persisted state —
    all four drop reasons exercised, and batch 2 is deduped against
    batch 1's survivors (the state update), not just the initial corpus."""
    from tools.dedup_corpus import append_keep_drop, write_dedup_state

    base = " ".join(f"tok{i}" for i in range(40))
    corpus = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, base + " ending"),
    ], "doc_id long, text string")
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)

    batch1 = spark.createDataFrame([
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (11, "brand new content eleven twelve thirteen fourteen fifteen"),
        (12, "brand new content eleven twelve thirteen fourteen fifteen"),
        (13, base + " changed"),
        (14, " ".join(f"z{i}" for i in range(40)) + " endone"),
        (15, " ".join(f"z{i}" for i in range(40)) + " endtwo"),
    ], "doc_id long, text string")
    keep, drops = append_keep_drop(spark, batch1, state, min_shared_bands=1)
    assert sorted(r.doc_id for r in keep.collect()) == [11, 14]
    assert sorted((r.doc_id, r.kept_id, r.reason) for r in drops.collect()) == [
        (10, 1, "exact-vs-corpus"),
        (12, 11, "exact"),
        (13, 2, "near-dup-vs-corpus"),
        (15, 14, "near-dup"),
    ]

    batch2 = spark.createDataFrame(
        [(20, "brand new content eleven twelve thirteen fourteen fifteen")],
        "doc_id long, text string",
    )
    keep2, drops2 = append_keep_drop(spark, batch2, state, min_shared_bands=1)
    assert [r.doc_id for r in keep2.collect()] == []
    assert [(r.doc_id, r.kept_id, r.reason) for r in drops2.collect()] == [
        (20, 11, "exact-vs-corpus")
    ]


def test_append_without_state_update_leaves_state_alone(spark, tmp_path):
    from tools.dedup_corpus import append_keep_drop, write_dedup_state

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)
    batch = spark.createDataFrame(
        [(10, "completely different content here")], "doc_id long, text string"
    )
    keep, _ = append_keep_drop(spark, batch, state, update_state=False)
    assert [r.doc_id for r in keep.collect()] == [10]
    # state unchanged: the same batch appended again still survives
    keep2, _ = append_keep_drop(spark, batch, state, update_state=False)
    assert [r.doc_id for r in keep2.collect()] == [10]


def test_exact_drop_repoints_to_corpus_canonical(spark, tmp_path):
    """An in-batch exact drop whose keeper is itself dropped
    exact-vs-corpus must point at the SURVIVING corpus doc, not the
    non-surviving in-batch keeper (r6 advice)."""
    from tools.dedup_corpus import append_keep_drop, write_dedup_state

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    _, drops = append_keep_drop(spark, batch, state, update_state=False)
    got = {(r.doc_id, r.kept_id, r.reason) for r in drops.collect()}
    assert got == {(10, 1, "exact-vs-corpus"), (11, 1, "exact")}


def test_exact_drop_repoints_through_near_dup_drops(spark, tmp_path):
    """The kept_id invariant must survive the NEAR stages too (ADVICE r7):
    an in-batch exact keeper that enters the pool and is then dropped as
    near-dup-vs-corpus (or in-batch near-dup) leaves its exact-drop twins
    pointing at a non-survivor unless they are re-pointed to the surviving
    canonical."""
    from tools.dedup_corpus import append_keep_drop, write_dedup_state

    base = " ".join(f"tok{i}" for i in range(40))
    corpus = spark.createDataFrame(
        [(2, base + " ending")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)
    # 12 == 13 exactly (keeper 12); 12 is a near-dup of corpus doc 2.
    # 15 == 16 exactly (keeper 15); 15 is an in-batch near-dup of 14
    # (cluster rep: the smaller id).
    z = " ".join(f"z{i}" for i in range(40))
    batch = spark.createDataFrame([
        (12, base + " changed"),
        (13, base + " changed"),
        (14, z + " endone"),
        (15, z + " endtwo"),
        (16, z + " endtwo"),
    ], "doc_id long, text string")
    keep, drops = append_keep_drop(
        spark, batch, state, min_shared_bands=1, update_state=False
    )
    kept = sorted(r.doc_id for r in keep.collect())
    got = sorted((r.doc_id, r.kept_id, r.reason) for r in drops.collect())
    assert kept == [14]
    assert got == [
        (12, 2, "near-dup-vs-corpus"),
        (13, 2, "exact"),      # re-pointed through 12's near-vs-corpus drop
        (15, 14, "near-dup"),
        (16, 14, "exact"),     # re-pointed through 15's in-batch near drop
    ]
    # invariant: every kept_id references a surviving doc
    survivors = set(kept) | {2}
    assert all(k in survivors for _, k, _ in got)


def test_retried_append_is_idempotent(spark, tmp_path):
    """Re-running the SAME batch append (a retry after a failure) must not
    double-append survivors to the persisted state: the batch's state
    partition is overwritten, not appended (r6 advice)."""
    from tools.dedup_corpus import append_keep_drop, write_dedup_state

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)
    batch = spark.createDataFrame(
        [(10, "completely different content here today")],
        "doc_id long, text string",
    )
    for _ in range(2):  # the second run simulates a retry of the same batch
        keep, _ = append_keep_drop(spark, batch, state, min_shared_bands=1)
        assert [r.doc_id for r in keep.collect()] == [10]
    hashes = spark.read.parquet(str(tmp_path / "state" / "exact_hashes"))
    assert hashes.count() == hashes.select("h60").distinct().count() == 2
    # and the state still dedups a later duplicate of the batch doc
    batch2 = spark.createDataFrame(
        [(20, "completely different content here today")],
        "doc_id long, text string",
    )
    keep2, drops2 = append_keep_drop(spark, batch2, state, update_state=False)
    assert [r.doc_id for r in keep2.collect()] == []
    assert [(r.doc_id, r.kept_id, r.reason) for r in drops2.collect()] == [
        (20, 10, "exact-vs-corpus")
    ]


def test_stream_append_dedups_across_epochs(spark, tmp_path):
    """Streaming continuous-ingest: micro-batch 2 must dedup against
    batch 1's survivors folded into the state by the foreachBatch sink,
    and the streaming epoch tags every decision."""
    from tools.dedup_corpus import stream_append, write_dedup_state

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    state = str(tmp_path / "state")
    write_dedup_state(corpus, state)

    def put(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / "in" / name))

    put("b1", [(10, "completely fresh content about rivers and lakes"),
               (11, "alpha beta gamma delta epsilon zeta")])
    put("b2", [(20, "completely fresh content about rivers and lakes"),
               (21, "another unique document body here today")])

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in" / "*"))
    )
    q = stream_append(stream, state, str(tmp_path / "out"),
                      checkpoint_dir=str(tmp_path / "ck"),
                      min_shared_bands=1)
    q.awaitTermination(180)

    keep = spark.read.parquet(str(tmp_path / "out" / "keep_list"))
    drops = spark.read.parquet(str(tmp_path / "out" / "drop_list"))
    kept = {r["doc_id"] for r in keep.collect()}
    reasons = {r["doc_id"]: r["reason"] for r in drops.collect()}
    # batch order under maxFilesPerTrigger=1 is directory order (b1, b2):
    # 11 is exact-vs-initial-corpus; 20 duplicates batch 1's survivor 10
    # THROUGH THE STATE UPDATE; 21 is fresh
    assert kept == {10, 21}
    assert reasons[11] == "exact-vs-corpus"
    assert reasons[20] == "exact-vs-corpus"
    # epochs recorded per decision, and two distinct epochs ran
    assert keep.select("epoch").distinct().count() == 2


def test_batch_build_repoints_exact_through_near_dup(spark):
    """The batch build has the same kept_id invariant as the append path:
    an exact keeper later dropped as a near-dup must pull its exact-drop
    twins along to the surviving cluster canonical."""
    from tools.dedup_corpus import build_keep_drop

    base = " ".join(f"tok{i}" for i in range(40))
    # exact group {12, 13} -> keeper 12 (min id); near cluster {10, 12}
    # -> rep 10, so 12 is dropped and 13 must re-point to 10
    docs = spark.createDataFrame([
        (10, base + " ending"),
        (12, base + " changed"),
        (13, base + " changed"),
    ], "doc_id long, text string")
    keep, drops = build_keep_drop(docs, min_shared_bands=1)
    assert sorted(r.doc_id for r in keep.collect()) == [10]
    got = sorted((r.doc_id, r.kept_id, r.reason) for r in drops.collect())
    assert got == [(12, 10, "near-dup"), (13, 10, "exact")]


def test_batch_build_keep_best_quality(spark):
    """quality_df flips both canonical choices: the exact group keeps its
    highest-quality member, the near-dup cluster keeps its
    highest-quality member, and the keep/drop PARTITION is unchanged in
    size (same families, different canonicals)."""
    from tools.dedup_corpus import build_keep_drop

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame([
        (10, base + " ending"),
        (12, base + " changed"),
        (13, base + " changed"),
    ], "doc_id long, text string")
    quality = spark.createDataFrame(
        [(10, 1), (12, 1), (13, 5)], "doc_id long, quality int"
    )
    keep, drops = build_keep_drop(
        docs, min_shared_bands=1, quality_df=quality
    )
    # exact {12,13}: q(13)=5 wins; near {10,13}: q(13)=5 wins
    assert sorted(r.doc_id for r in keep.collect()) == [13]
    got = sorted((r.doc_id, r.kept_id, r.reason) for r in drops.collect())
    assert got == [(10, 13, "near-dup"), (12, 13, "exact")]
    # quality ties everywhere == the default min-id decision
    flat = spark.createDataFrame(
        [(10, 2), (12, 2), (13, 2)], "doc_id long, quality int"
    )
    keep2, drops2 = build_keep_drop(docs, min_shared_bands=1, quality_df=flat)
    assert sorted(r.doc_id for r in keep2.collect()) == [10]
    assert sorted((r.doc_id, r.kept_id, r.reason) for r in drops2.collect()) \
        == [(12, 10, "near-dup"), (13, 10, "exact")]


def test_keep_best_null_text_docs_survive_both_modes(spark):
    """ADVICE-r8: NULL-text docs hash to h60=NULL; the quality path's
    exact-grouping window must NOT collapse them into one fake duplicate
    family (SQL windows group NULL partition keys together, unlike the
    default path's join which never matches NULL).  Both modes must
    produce the SAME keep/drop partition: all NULL-text docs kept."""
    from tools.dedup_corpus import build_keep_drop

    base = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame([
        (1, base),
        (2, base),          # exact dup of 1
        (3, None),          # NULL text
        (4, None),          # NULL text — must NOT be deduped against 3
        (5, None),          # NULL text
    ], "doc_id long, text string")

    keep_d, drops_d = build_keep_drop(docs, min_shared_bands=1)
    keep_q, drops_q = build_keep_drop(
        docs, min_shared_bands=1,
        quality_df=spark.createDataFrame(
            [(1, 1), (2, 5), (3, 9), (4, 1), (5, 1)],
            "doc_id long, quality int"),
    )
    kept_default = sorted(r.doc_id for r in keep_d.collect())
    kept_quality = sorted(r.doc_id for r in keep_q.collect())
    # default: min-id keeps 1; quality: q(2)=5 keeps 2 — but ALL
    # NULL-text docs survive in both modes (same partition sizes).
    assert kept_default == [1, 3, 4, 5]
    assert kept_quality == [2, 3, 4, 5]
    assert sorted((r.doc_id, r.reason) for r in drops_d.collect()) == \
        [(2, "exact")]
    assert sorted((r.doc_id, r.reason) for r in drops_q.collect()) == \
        [(1, "exact")]
