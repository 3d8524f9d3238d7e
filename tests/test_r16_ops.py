"""Round-16 additions — the ANN index lifecycle completed.

- Tombstone deletions (r15 verdict "What's missing" 2 / "Next round" 3):
  delete_from_ann_index retires rows from a SERVED index; both query
  operators anti-join the tombstones before the kernel; the probe's
  dynamic partition pruning survives the anti-join (plan-pinned).
- rebuild_ann_index (r15 "What's missing" 3 / "Next round" 2): the
  clamp-rate-triggered rebuild/compaction as a real operator — pinned
  hash-identical to a fresh build over the surviving rows, appends
  history reset, tombstones folded in and cleared, layout re-compacted.
- should_rebuild: clamp-rate + deleted-fraction triggers read off the
  params dict the writes already metered.
- Appends history capped (r15 "What's wrong" 3): last APPENDS_KEEP
  verbatim + running totals; the clamp signal survives the fold.
- params.json single-writer lock (r15 ADVICE 3), session-keyed load
  cache (ADVICE 4), content-fingerprinted ensure key (ADVICE 2),
  files_per_cell as a pinned upper bound (r15 "What's wrong" 2).
- Streaming → index integration (r15 "Next round" 4): N micro-batches
  through append_stream_to_index equal the batch-built twin.
"""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.ann_index import (
    APPENDS_KEEP,
    ann_index_int8_topk,
    ann_index_ivf_rerank,
    append_ann_index,
    append_stream_to_index,
    build_ann_index,
    delete_from_ann_index,
    ensure_ann_index,
    load_ann_index,
    rebuild_ann_index,
    should_rebuild,
)

SF_DIR = "/root/testdata/sf0.001"


def _toy(spark, n=20, dim=2, start=0):
    return spark.createDataFrame(
        [(start + i, [float(start + i + d) for d in range(dim)])
         for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def _codes_table(spark, path):
    codes, _, _ = load_ann_index(spark, path, refresh=True)
    return sorted(
        (r["vec_id"], tuple(r["codes"]), r["cell"]) for r in codes.collect()
    )


# ---------------------------------------------------------------------------
# deletions
# ---------------------------------------------------------------------------

def test_delete_excludes_from_both_query_ops(spark, tmp_path):
    """Tombstoned rows stop serving immediately in the flat scan AND the
    composed retrieval; a tombstoned id may still QUERY (the panel is
    external input) — it just cannot be a candidate."""
    corpus = _toy(spark)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    assert delete_from_ann_index(spark, path, [3, 4, 5]) == {"tombstoned": 3}
    q = spark.createDataFrame(
        [(3, [3.0, 4.0])], "qid long, qvec array<double>"
    )
    flat = ann_index_int8_topk(spark, path, q, k=20).collect()
    assert len(flat) == 17  # 20 - 3 tombstoned (qid 3 is among them)
    assert not ({3, 4, 5} & {r["vec_id"] for r in flat})
    rer = ann_index_ivf_rerank(spark, path, corpus, q, m=10, k=20).collect()
    assert rer and not ({3, 4, 5} & {r["vec_id"] for r in rer})


def test_delete_is_idempotent_and_tolerates_unknown_ids(spark, tmp_path):
    """Double-deleting an id and deleting a never-indexed id are both
    FULL no-ops in accounting (r16 verdict "What's wrong" 2 tightened
    the second case): the batch semi-joins the indexed vec_ids and
    anti-joins the stored tombstones first, so a replayed/accumulated
    drop list OR a drop list spanning a corpus superset of the index
    (the --retire-from-index stream case) adds zero rows, zero bytes,
    and zero deleted-fraction signal; an all-duplicate or all-unknown
    batch records no batch at all."""
    corpus = _toy(spark, n=10)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    # 999999 was never indexed: it must not tombstone, not count, and
    # not push should_rebuild's deleted_frac toward a pointless rebuild
    assert delete_from_ann_index(spark, path, [2, 999999]) == {
        "tombstoned": 1}
    assert delete_from_ann_index(spark, path, [2]) == {"tombstoned": 0}
    assert delete_from_ann_index(spark, path, [888888]) == {"tombstoned": 0}
    q = spark.createDataFrame(
        [(777, [1.0, 2.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=20).collect()
    assert {r["vec_id"] for r in rows} == set(range(10)) - {2}
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert params["deletes"] == {"batches": 1, "rows": 1}
    assert should_rebuild(params)["deleted_frac"] == pytest.approx(0.1)


def test_empty_delete_is_a_full_noop(spark, tmp_path):
    """A zero-id delete (a dedup run with no drops) must not flip the
    index onto the anti-join plan: no tombstone dir, no batch recorded,
    and the query plan stays byte-identical to the never-deleted one."""
    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    q = spark.createDataFrame(
        [(9, [1.0, 2.0])], "qid long, qvec array<double>"
    )
    before = ann_index_int8_topk(spark, path, q, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert delete_from_ann_index(spark, path, []) == {"tombstoned": 0}
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert "deletes" not in params
    after = ann_index_int8_topk(spark, path, q, k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join LeftAnti" not in after and before.count("Scan") == \
        after.count("Scan")


def test_cross_process_mutations_visible_without_invalidate(spark,
                                                            tmp_path):
    """The load memo revalidates against a params.json stat per hit, so
    a mutation by ANOTHER process (whose _invalidate can't reach this
    one) surfaces at the next query call — simulated by mutating the
    index behind the cache's back."""
    import grower_spark.operators.ann_index as ai

    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    q = spark.createDataFrame(
        [(9, [1.0, 2.0])], "qid long, qvec array<double>"
    )
    assert ann_index_int8_topk(spark, path, q, k=10).count() == 6
    # mutate "from another process": run the delete, then restore this
    # process's cache to its pre-delete entry (the other process's view)
    stale = dict(ai._LOAD_CACHE)
    delete_from_ann_index(spark, path, [0, 1])
    ai._LOAD_CACHE.clear()
    ai._LOAD_CACHE.update(stale)
    rows = ann_index_int8_topk(spark, path, q, k=10).collect()
    assert {r["vec_id"] for r in rows} == {2, 3, 4, 5}


def test_stale_tombstones_from_previous_build_are_ignored(spark,
                                                          tmp_path):
    """The crash-window hazard the build-scoped tombstones remove: a
    kill between a completed fresh build (params.json renamed) and the
    tombstone-root GC leaves old tombstone files on disk — they must
    NOT exclude live rows of the new build that reuse retired ids."""
    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    delete_from_ann_index(spark, path, [3])
    # preserve the old build's tombstones, rebuild the index fresh over
    # a corpus that legitimately contains id 3, then simulate the crash
    # by restoring the old tombstone dir
    tomb = str(tmp_path / "saved_tombs")
    shutil.copytree(os.path.join(path, "tombstones"), tomb)
    build_ann_index(corpus, path, n_cells=4)
    shutil.copytree(tomb, os.path.join(path, "tombstones"))
    q = spark.createDataFrame(
        [(9, [3.0, 4.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=10).collect()
    assert 3 in {r["vec_id"] for r in rows}  # served, not ghost-excluded


def test_rebuild_train_cells_uses_stored_cell_count(spark, tmp_path):
    """rebuild(train_cells=True) re-trains the coarse quantizer with
    the STORED n_cells on the surviving corpus — the CLI mismatch a
    review caught (training with a default 16 against a 4-cell index
    made every such rebuild fail validation)."""
    corpus = _toy(spark, n=40, dim=4)
    path = str(tmp_path / "idx")
    p0 = build_ann_index(corpus, path, n_cells=4)
    delete_from_ann_index(spark, path, [0, 1])
    p1 = rebuild_ann_index(corpus, path, train_cells=True)
    assert p1["n_cells"] == 4 and p1["n_rows"] == 38
    assert len(p1["centroids"]) == 4
    assert p1["centroids"] != p0["centroids"]  # trained, not the grid
    q = spark.createDataFrame(
        [(900, [5.0, 6.0, 7.0, 8.0])], "qid long, qvec array<double>"
    )
    assert ann_index_ivf_rerank(
        spark, path, corpus, q, m=10, k=5, n_probe=2
    ).count() == 5


def test_delete_accepts_dataframe_ids(spark, tmp_path):
    """The production caller is a dedup pass handing over a DataFrame of
    losers — first column is taken as the id, whatever its name."""
    corpus = _toy(spark, n=12)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    losers = corpus.where(F.col("vec_id") % 4 == 1).select(
        F.col("vec_id").alias("loser_id")
    )
    res = delete_from_ann_index(spark, path, losers)
    assert res == {"tombstoned": 3}  # ids 1, 5, 9
    q = spark.createDataFrame(
        [(500, [2.0, 3.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=20).collect()
    assert {r["vec_id"] for r in rows} == set(range(12)) - {1, 5, 9}


def test_delete_keeps_partition_pruning(spark, tmp_path):
    """The scale pin carried to the tombstoned path: the anti-join is
    applied AFTER the probe join, so the codes scan still prunes to
    probed cells via dynamic partition pruning."""
    base = str(tmp_path)
    path = ensure_ann_index(spark, SF_DIR, base_dir=base)
    delete_from_ann_index(spark, path, [10, 11, 12])
    from grower_spark.io_tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    out = ann_index_ivf_rerank(spark, path, emb, q, m=20, k=10, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert rows and not ({10, 11, 12} & {r["vec_id"] for r in rows})


# ---------------------------------------------------------------------------
# rebuild / compaction
# ---------------------------------------------------------------------------

def test_rebuild_equals_fresh_build_over_union(spark, tmp_path):
    """The rebuild certificate (r15 'Next round' 2 Done criterion):
    base build + append + rebuild over the union produces a stored
    codes table AND query results hash-identical to a fresh
    build_ann_index over the same union — so every certificate of the
    build/query path transfers to rebuilt indexes."""
    base = _toy(spark, n=15)
    extra = spark.createDataFrame(
        [(100, [100.0, 5.0]), (101, [4.5, 3.5])],
        "vec_id long, embedding array<double>",
    )
    union = base.union(extra)

    grown = str(tmp_path / "grown")
    build_ann_index(base, grown, n_cells=4)
    append_ann_index(extra, grown)
    rb = rebuild_ann_index(union, grown)

    fresh = str(tmp_path / "fresh")
    fb = build_ann_index(union, fresh, n_cells=4)

    assert _codes_table(spark, grown) == _codes_table(spark, fresh)
    assert rb["n_rows"] == fb["n_rows"] == 17
    assert rb["rebuilds"] == 1 and "appends" not in rb
    q = spark.createDataFrame(
        [(500, [8.0, 9.0])], "qid long, qvec array<double>"
    )
    a = sorted(map(tuple, ann_index_int8_topk(spark, grown, q, k=10)
                   .collect()))
    b = sorted(map(tuple, ann_index_int8_topk(spark, fresh, q, k=10)
                   .collect()))
    assert a == b and len(a) == 10


def test_rebuild_compacts_tombstones_and_makes_ids_readdable(spark,
                                                             tmp_path):
    """Rebuild folds tombstones in (deleted rows are excluded from the
    fresh fit AND the codes), clears the tombstone dir, and the retired
    ids become re-addable — append after rebuild serves them again."""
    corpus = _toy(spark, n=10)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    delete_from_ann_index(spark, path, [7, 8])
    params = rebuild_ann_index(corpus, path)
    assert params["n_rows"] == 8
    assert "deletes" not in params
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    # the fresh fit excludes the deleted rows: identical to building
    # over the survivors directly
    fresh = str(tmp_path / "fresh")
    build_ann_index(corpus.where(~F.col("vec_id").isin(7, 8)), fresh,
                    n_cells=4)
    assert _codes_table(spark, path) == _codes_table(spark, fresh)
    # re-add one retired id — it serves again (tombstone is gone)
    append_ann_index(
        spark.createDataFrame([(7, [7.0, 8.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    q = spark.createDataFrame(
        [(500, [7.0, 8.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=20).collect()
    assert 7 in {r["vec_id"] for r in rows}


def test_rebuild_keeps_stored_centroids_unless_overridden(spark, tmp_path):
    """The coarse quantizer survives a rebuild by default (cell layout
    stays comparable across rebuilds); an explicit override installs a
    new one — both persisted in params AND the centroids parquet."""
    import duckdb

    from grower_spark.operators.similarity import ivf_centroids

    corpus = _toy(spark, n=10, dim=4)
    path = str(tmp_path / "idx")
    p0 = build_ann_index(corpus, path, n_cells=4)
    p1 = rebuild_ann_index(corpus, path)
    assert p1["centroids"] == p0["centroids"]
    override = ivf_centroids(4, 4)[::-1]  # any different valid set
    p2 = rebuild_ann_index(corpus, path, centroids=override)
    assert p2["centroids"] == override
    con = duckdb.connect()
    stored = con.execute(
        "SELECT cell, centroid FROM read_parquet('{}') ORDER BY cell"
        .format(os.path.join(path, "centroids", "*.parquet"))
    ).fetchall()
    assert [list(c) for _, c in stored] == override


def test_should_rebuild_triggers(spark, tmp_path):
    """Clamp-rate and deleted-fraction each trip the trigger alone;
    a quiet index stays quiet."""
    corpus = _toy(spark, n=10)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    _, _, params = load_ann_index(spark, path, refresh=True)
    quiet = should_rebuild(params)
    assert quiet["rebuild"] is False and quiet["reasons"] == []
    # out-of-range append: 2 of 2 values clamp -> clamp_rate 1.0
    append_ann_index(
        spark.createDataFrame([(100, [1000.0, -1000.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    _, _, params = load_ann_index(spark, path, refresh=True)
    drift = should_rebuild(params, clamp_rate_threshold=0.5)
    assert drift["rebuild"] and any("clamp_rate" in r
                                    for r in drift["reasons"])
    # deletions alone: 3/11 rows -> deleted_frac ~0.27
    delete_from_ann_index(spark, path, [0, 1, 2])
    _, _, params = load_ann_index(spark, path, refresh=True)
    dead = should_rebuild(params, clamp_rate_threshold=2.0,
                          deleted_frac_threshold=0.2)
    assert dead["rebuild"] and any("deleted_frac" in r
                                   for r in dead["reasons"])


# ---------------------------------------------------------------------------
# metadata hygiene: history cap, lock, fingerprint, layout bound
# ---------------------------------------------------------------------------

def test_appends_history_bounded_and_signal_preserved(spark, tmp_path):
    """r15 'What's wrong' 3: a many-append loop keeps params.json O(1)
    (last APPENDS_KEEP batches verbatim + running totals) while
    should_rebuild still sees every clamped value."""
    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    n_batches = APPENDS_KEEP + 5
    for i in range(n_batches):
        append_ann_index(
            spark.createDataFrame(
                # dim-1 value clamps (beyond the base fit); dim-2 stays
                # in range — exactly 1 clamped value per batch
                [(1000 + i, [1000.0, 3.0])],
                "vec_id long, embedding array<double>",
            ),
            path,
        )
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert len(params["appends"]) == APPENDS_KEEP
    assert params["appends_total"] == {
        "batches": 5, "rows": 5, "clamped_values": 5,
    }
    assert params["n_rows"] == 6 + n_batches
    sig = should_rebuild(params)
    # every batch clamped exactly 1 of its 2 values, none lost to the fold
    assert sig["clamp_rate"] == pytest.approx(n_batches / (n_batches * 2))


def test_params_lock_blocks_second_writer(spark, tmp_path):
    """The single-writer contract fails LOUDLY: with the lock file held,
    append and delete both refuse instead of losing a counter update."""
    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    lock = os.path.join(path, "params.json.lock")
    open(lock, "w").close()
    try:
        with pytest.raises(RuntimeError, match="single-writer"):
            append_ann_index(
                spark.createDataFrame(
                    [(50, [1.0, 2.0])],
                    "vec_id long, embedding array<double>"),
                path,
            )
        with pytest.raises(RuntimeError, match="single-writer"):
            delete_from_ann_index(spark, path, [1])
    finally:
        os.unlink(lock)
    # released lock: the same calls go through
    append_ann_index(
        spark.createDataFrame([(50, [1.0, 2.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert params["n_rows"] == 7


def test_ensure_key_tracks_source_content(spark, tmp_path):
    """r15 ADVICE 2: regenerating the sf_dir in place (same path, new
    bytes/mtime) changes the ensure key — a fresh build, never a stale
    index silently served."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy(os.path.join(SF_DIR, "embeddings.parquet"),
                str(sf / "embeddings.parquet"))
    base = str(tmp_path / "cache")
    p1 = ensure_ann_index(spark, str(sf), base_dir=base)
    assert p1 == ensure_ann_index(spark, str(sf), base_dir=base)
    st = os.stat(str(sf / "embeddings.parquet"))
    os.utime(str(sf / "embeddings.parquet"),
             ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    p2 = ensure_ann_index(spark, str(sf), base_dir=base)
    assert p2 != p1


def test_files_per_cell_is_an_upper_bound(spark, tmp_path):
    """r15 'What's wrong' 2 resolution: the documented contract is a
    BOUND, and the layout test asserts exactly that — every cell dir
    holds between 1 and files_per_cell parquet files, so the fan-out
    never exceeds n_cells × files_per_cell."""
    corpus = _toy(spark, n=400, dim=2).repartition(16)
    path = str(tmp_path / "idx")
    fpc = 3
    build_ann_index(corpus, path, n_cells=4, files_per_cell=fpc)
    from grower_spark.operators.ann_index import codes_dir

    cdir = codes_dir(path)
    total = 0
    cells = 0
    for d in sorted(os.listdir(cdir)):
        if not d.startswith("cell="):
            continue
        cells += 1
        n = len([f for f in os.listdir(os.path.join(cdir, d))
                 if f.endswith(".parquet")])
        assert 1 <= n <= fpc, (d, n)
        total += n
    assert cells >= 1 and total <= 4 * fpc


def test_load_cache_keyed_per_session(spark, tmp_path):
    """r15 ADVICE 4: a second session in the same application gets its
    own handles, not the first session's memoized DataFrames."""
    corpus = _toy(spark, n=6)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    codes1, _, _ = load_ann_index(spark, path)
    s2 = spark.newSession()
    codes2, _, _ = load_ann_index(s2, path)
    assert codes1 is not codes2
    assert codes2.sparkSession is s2
    assert codes2.count() == 6


# ---------------------------------------------------------------------------
# streaming → index integration
# ---------------------------------------------------------------------------

def test_stream_appends_match_batch_built_twin(spark, tmp_path):
    """r15 'Next round' 4 Done criterion: N micro-batches through
    append_stream_to_index (file source, one file per micro-batch)
    leave the index byte-identical to the same base build plus batch
    append_ann_index calls; clamp counts accumulate in params and reach
    the on_batch hook; queries over the grown index match the
    batch-built twin."""
    base_rows = _toy(spark, n=10)
    streamed = str(tmp_path / "streamed")
    batched = str(tmp_path / "batched")
    build_ann_index(base_rows, streamed, n_cells=4)
    build_ann_index(base_rows, batched, n_cells=4)

    src = tmp_path / "incoming"
    src.mkdir()
    batches = [
        [(100, [100.0, 5.0])],                  # clamps dim 1
        [(101, [4.5, 3.5]), (102, [2.5, 6.5])],
        [(103, [-50.0, 1.0])],                  # clamps dim 1 low
    ]
    for i, b in enumerate(batches):
        # flat single-file layout: one parquet FILE per micro-batch
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            b, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(str(stage))
        part = next(p for p in os.listdir(str(stage))
                    if p.endswith(".parquet"))
        shutil.move(str(stage / part), str(src / f"b{i}.parquet"))

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    seen = []
    q = append_stream_to_index(
        stream, streamed, checkpoint=str(tmp_path / "ckpt"),
        on_batch=lambda eid, res: seen.append(res),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    for b in batches:
        append_ann_index(
            spark.createDataFrame(
                b, "vec_id long, embedding array<double>"),
            batched,
        )
    assert _codes_table(spark, streamed) == _codes_table(spark, batched)
    _, _, ps = load_ann_index(spark, streamed, refresh=True)
    _, _, pb = load_ann_index(spark, batched, refresh=True)
    assert ps["n_rows"] == pb["n_rows"] == 14
    assert sum(r["clamped_values"] for r in seen) == sum(
        a["clamped_values"] for a in pb["appends"]
    ) > 0
    panel = spark.createDataFrame(
        [(900, [5.0, 5.0])], "qid long, qvec array<double>"
    )
    a = sorted(map(tuple,
                   ann_index_int8_topk(spark, streamed, panel, k=14)
                   .collect()))
    b = sorted(map(tuple,
                   ann_index_int8_topk(spark, batched, panel, k=14)
                   .collect()))
    assert a == b and len(a) == 14


# ---------------------------------------------------------------------------
# CLI lifecycle surface
# ---------------------------------------------------------------------------

def test_cli_ann_index_lifecycle(spark, tmp_path, capsys):
    """The operational wrapper: build → append → delete → status (trigger
    readable without a Spark session) → rebuild, end to end through
    `python -m grower_spark.cli ann-index ...`."""
    import json

    from grower_spark.cli import main

    corpus = tmp_path / "corpus"
    _toy(spark, n=12).write.parquet(str(corpus))
    batch = tmp_path / "batch"
    spark.createDataFrame(
        [(100, [1000.0, 3.0])], "vec_id long, embedding array<double>"
    ).write.parquet(str(batch))
    idx = str(tmp_path / "idx")

    assert main(["ann-index", "build", "--index", idx,
                 "--input", str(corpus), "--n-cells", "4"]) == 0
    built = json.loads(capsys.readouterr().out)
    assert built["n_rows"] == 12 and built["n_cells"] == 4

    assert main(["ann-index", "append", "--index", idx,
                 "--input", str(batch)]) == 0
    assert json.loads(capsys.readouterr().out) == {
        "rows": 1, "clamped_values": 1}

    assert main(["ann-index", "delete", "--index", idx,
                 "--ids", "2,3,4"]) == 0
    assert json.loads(capsys.readouterr().out) == {"tombstoned": 3}

    assert main(["ann-index", "status", "--index", idx,
                 "--clamp-rate-threshold", "0.4",
                 "--deleted-frac-threshold", "0.2"]) == 0
    status = json.loads(capsys.readouterr().out)
    assert status["n_rows"] == 13 and status["rebuild"] is True
    assert status["deletes"] == {"batches": 1, "rows": 3}

    full = tmp_path / "full"
    _toy(spark, n=12).union(
        spark.createDataFrame([(100, [1000.0, 3.0])],
                              "vec_id long, embedding array<double>")
    ).write.parquet(str(full))
    assert main(["ann-index", "rebuild", "--index", idx,
                 "--input", str(full)]) == 0
    rebuilt = json.loads(capsys.readouterr().out)
    assert rebuilt["n_rows"] == 10 and rebuilt["rebuilds"] == 1
    assert main(["ann-index", "status", "--index", idx]) == 0
    status = json.loads(capsys.readouterr().out)
    assert status["rebuild"] is False and status["deletes"]["rows"] == 0


def test_dedup_pass_retires_losers_from_index(spark, tmp_path):
    """The production handoff (tools/dedup_corpus.py --retire-from-index):
    a dedup pass's drop_list feeds delete_from_ann_index, so retired
    near-duplicates stop serving retrieval immediately — keepers still
    serve, losers are tombstoned until the next rebuild compacts them."""
    from tools.dedup_corpus import build_keep_drop

    docs = spark.createDataFrame(
        [(i, f"unique document number {i} with its own words")
         for i in range(8)]
        + [(100, "twin text that repeats verbatim in the corpus"),
           (101, "twin text that repeats verbatim in the corpus")],
        "doc_id long, text string",
    )
    # embeddings keyed by the SAME ids (the testdata contract:
    # documents.doc_id == embeddings.vec_id)
    emb = spark.createDataFrame(
        [(i, [float(i), float(i) + 1.0]) for i in range(8)]
        + [(100, [50.0, 51.0]), (101, [50.0, 51.0])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    build_ann_index(emb, path, n_cells=4)
    keep, drops = build_keep_drop(docs)
    assert delete_from_ann_index(
        spark, path, drops.select("doc_id")
    ) == {"tombstoned": 1}  # 101 loses to 100 (lowest id wins)
    q = spark.createDataFrame(
        [(999, [50.0, 51.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, path, q, k=10).collect()
    served = {r["vec_id"] for r in rows}
    assert 100 in served and 101 not in served


def test_corpus_build_ann_index_stage(spark, tmp_path):
    """--ann-index-out: the retrieval tier built in the SAME event as
    the corpus — the index covers exactly the KEPT documents'
    embeddings (dropped docs never enter the fit or the codes), and a
    query over it serves only survivors."""
    import json

    from tools.corpus_build import main as cb_main

    def doc(i):
        # stopword-rich, quality-passing, and 3-gram-disjoint across
        # docs (the test_corpus_build.py _distinct_doc recipe) so the
        # default dedup/quality stages keep all real docs
        w = [f"w{i}x{k}" for k in range(12)]
        return (f"the {w[0]} and {w[1]} of {w[2]} is {w[3]} it {w[4]} "
                f"that {w[5]} in {w[6]} you {w[7]} to {w[8]} a {w[9]} "
                f"{w[10]} {w[11]}")

    docs = spark.createDataFrame(
        [(i, doc(i), "en", "srcA") for i in range(8)]
        + [(100, "#### 1234 !!!!", "en", "srcA")],  # fails quality gate
        ["doc_id", "text", "lang", "source"],
    )
    p_docs = str(tmp_path / "docs")
    docs.write.parquet(p_docs)
    p_emb = str(tmp_path / "emb")
    spark.createDataFrame(
        [(i, [float(i), float(20 - i)]) for i in list(range(8)) + [100]],
        "vec_id long, embedding array<double>",
    ).write.parquet(p_emb)
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    rc = cb_main([p_docs, out,
                  "--ann-embeddings", p_emb, "--ann-index-out", idx,
                  "--ann-n-cells", "4"])
    assert rc == 0
    rep = json.load(open(os.path.join(out, "report.json")))
    kept = {r["doc_id"] for r in
            spark.read.parquet(os.path.join(out, "corpus"))
            .select("doc_id").collect()}
    assert 100 not in kept and kept == set(range(8))
    assert rep["ann_index"]["n_rows"] == len(kept)
    q = spark.createDataFrame(
        [(999, [50.0, 1.0])], "qid long, qvec array<double>"
    )
    rows = ann_index_int8_topk(spark, idx, q, k=20).collect()
    assert {r["vec_id"] for r in rows} == kept  # dropped doc never indexed


def test_oov_panel_actually_clamps(spark):
    """The ann_index_oov driver row's premise, pinned: the 1.25×-scaled
    panel pushes values past the stored per-dim min/max on real
    testdata, so the row genuinely exercises the stored-fit clamp path
    (if the data ever changed so nothing clamps, this fails before the
    row silently stops testing saturation)."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.diversity import quantize_fit

    emb = load_table(spark, SF_DIR, "embeddings")
    by_pos = quantize_fit(emb)
    panel = emb.where(F.col("vec_id") < 8).select(
        F.transform(
            "embedding", lambda x: x.cast("double") * F.lit(1.25)
        ).alias("qvec")
    )
    mx = F.array(*[F.lit(by_pos[p][1]).cast("long")
                   for p in sorted(by_pos)])
    mn = F.array(*[F.lit(by_pos[p][0]).cast("long")
                   for p in sorted(by_pos)])
    total = panel.withColumn("_mx", mx).withColumn("_mn", mn).select(
        F.expr(
            "aggregate(zip_with(transform(qvec, x -> "
            "CAST(floor(x * 1000 + 0.5) AS LONG)), "
            "sequence(1, size(qvec)), (x, i) -> "
            "CASE WHEN x > element_at(_mx, i) OR x < element_at(_mn, i) "
            "THEN 1L ELSE 0L END), 0L, (a, v) -> a + v)"
        ).alias("n")
    ).agg(F.sum("n").alias("total")).collect()[0]["total"]
    assert total and total > 0
