"""r17 operator pins — closing the r16 verdict's ordered items:

- compact_ann_index (verdict "Next round" 2): tombstone fold + layout
  re-compaction under the STORED fit, no float corpus — query results
  hash-equal the tombstoned index's, appends history kept, deletes
  reset, retired ids re-addable, files_per_cell bound restored.
- should_rebuild action selection (same item): deletes-only fires
  "compact", any clamp fires "rebuild".
- exactly-once epoch appends (verdict "Next round" 3): failure
  injection at every crash point of the protocol — mid-move, between
  the codes move and the params commit, and a full replay after
  success — each converges to the batch-built twin.
- streaming e2e failure injection: a foreachBatch failure AFTER the
  index append but BEFORE Spark's checkpoint commit replays the epoch
  on restart; the replay skips and the index equals the twin.
- append encodes under the CURRENT fit even with a stale memo (r16
  ADVICE 1: the load now happens INSIDE the mutation lock).
- versioned codes generations (r16 ADVICE 4): rebuild/compact flip
  params to a fresh generation, the previous one survives exactly one
  mutation (reader grace), codes_dir() resolves the current one.
- the index-metadata seam (verdict "Next round" 6): the whole
  lifecycle runs through an instrumented index_meta backend.
"""

import os
import shutil

import pyspark.sql.functions as F
import pytest

from grower_spark.operators.ann_index import (
    ann_index_int8_topk,
    ann_index_ivf_rerank,
    append_ann_index,
    append_stream_to_index,
    build_ann_index,
    codes_dir,
    compact_ann_index,
    delete_from_ann_index,
    load_ann_index,
    rebuild_ann_index,
    should_rebuild,
)
from grower_spark.operators.index_meta import (
    PosixIndexMeta,
    get_index_meta,
    set_index_meta,
)


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


def _topk(spark, path, k=10):
    q = spark.createDataFrame(
        [(900, [3.0, 4.0]), (901, [11.0, 12.0])],
        "qid long, qvec array<double>",
    )
    return sorted(map(tuple, ann_index_int8_topk(spark, path, q, k=k)
                      .collect()))


# ---------------------------------------------------------------------------
# compact_ann_index
# ---------------------------------------------------------------------------

def test_compact_equals_tombstoned_index_results(spark, tmp_path):
    """The compaction certificate (r16 'Next round' 2 Done criterion):
    query results over the compacted index hash-equal the tombstoned
    index's — the anti-join becomes physical absence, nothing else
    moves.  The codes of the SURVIVORS are byte-identical (no refit:
    compact must keep the stored fit — that is what distinguishes it
    from rebuild)."""
    corpus = _toy(spark, n=20)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    delete_from_ann_index(spark, path, [3, 7, 11])
    before_topk = _topk(spark, path)
    before_codes = [r for r in _codes_table(spark, path)
                    if r[0] not in (3, 7, 11)]

    params = compact_ann_index(spark, path)
    assert params["compactions"] == 1
    assert params["n_rows"] == 17
    assert "deletes" not in params
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    assert _topk(spark, path) == before_topk
    # survivors byte-identical, retired rows physically gone
    assert _codes_table(spark, path) == before_codes


def test_compact_keeps_append_history_and_clamped_codes(spark, tmp_path):
    """Compaction is NOT a rebuild: the stored fit survives, so the
    append history (the clamp-rate drift signal against that fit) must
    survive too, and previously-clamped append codes stay clamped —
    byte-identical to before."""
    base = _toy(spark, n=12)
    path = str(tmp_path / "idx")
    build_ann_index(base, path, n_cells=4)
    append_ann_index(
        spark.createDataFrame([(100, [500.0, 1.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )  # clamps dim 0 high
    delete_from_ann_index(spark, path, [2])
    _, _, before = load_ann_index(spark, path, refresh=True)
    clamped_before = [r for r in _codes_table(spark, path) if r[0] == 100]

    params = compact_ann_index(spark, path)
    assert params["appends"] == before["appends"]  # history kept
    assert params["appends"][0]["clamped_values"] > 0
    assert [r for r in _codes_table(spark, path) if r[0] == 100] \
        == clamped_before
    # retired id re-addable after the fold (fresh build_id orphaned it)
    append_ann_index(
        spark.createDataFrame([(2, [2.0, 3.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    rows = _topk(spark, path, k=20)
    assert 2 in {r[1] for r in rows}


def test_compact_restores_files_per_cell_bound(spark, tmp_path):
    """Append fragments accumulate files per cell; compaction restores
    the ≤files_per_cell-per-cell layout without a refit."""
    base = _toy(spark, n=40)
    path = str(tmp_path / "idx")
    build_ann_index(base, path, n_cells=4)
    for i in range(5):
        append_ann_index(_toy(spark, n=4, start=100 + 10 * i), path)

    def max_files():
        cdir = codes_dir(path)
        return max(
            len([f for f in os.listdir(os.path.join(cdir, d))
                 if f.endswith(".parquet")])
            for d in os.listdir(cdir) if d.startswith("cell=")
        )

    assert max_files() > 1  # fragmented by the appends
    compact_ann_index(spark, path)
    assert max_files() == 1


def test_compact_on_clean_or_empty_index(spark, tmp_path):
    """No tombstones: compact is a pure re-layout (results unchanged).
    Zero-row index: a documented no-op that returns params unchanged."""
    corpus = _toy(spark, n=10)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    before = _topk(spark, path)
    p = compact_ann_index(spark, path)
    assert p["n_rows"] == 10 and _topk(spark, path) == before

    empty = str(tmp_path / "empty")
    build_ann_index(
        spark.createDataFrame([], "vec_id long, embedding array<double>"),
        empty, n_cells=4,
    )
    p0 = compact_ann_index(spark, empty)
    assert p0["n_rows"] == 0 and "compactions" not in p0


def test_should_rebuild_action_selection(spark, tmp_path):
    """The trigger → repair mapping (r16 'Next round' 2): deletes-only
    fires the cheap float-free compact; any clamp drift fires the full
    rebuild (the fit itself is stale); nothing fired -> no action."""
    sig = should_rebuild({"dim": 2, "n_rows": 100})
    assert sig == {"rebuild": False, "action": None, "clamp_rate": 0.0,
                   "deleted_frac": 0.0, "reasons": []}
    deletes_only = {"dim": 2, "n_rows": 100,
                    "deletes": {"batches": 1, "rows": 30}}
    assert should_rebuild(deletes_only)["action"] == "compact"
    clamp_only = {"dim": 2, "n_rows": 100,
                  "appends": [{"rows": 50, "clamped_values": 40}]}
    assert should_rebuild(clamp_only)["action"] == "rebuild"
    both = dict(deletes_only, **clamp_only)
    assert should_rebuild(both)["action"] == "rebuild"
    assert should_rebuild(both)["rebuild"] is True


# ---------------------------------------------------------------------------
# exactly-once epoch appends
# ---------------------------------------------------------------------------

def _twin(spark, tmp_path, name, batches):
    path = str(tmp_path / name)
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    for b in batches:
        append_ann_index(
            spark.createDataFrame(
                b, "vec_id long, embedding array<double>"),
            path,
        )
    return path


_B0 = [(100, [100.0, 5.0])]
_B1 = [(101, [4.5, 3.5]), (102, [2.5, 6.5])]


def test_epoch_append_replay_skips(spark, tmp_path):
    """An epoch already recorded in params is skipped outright — zero
    rows, zero files, counters untouched."""
    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    b0 = spark.createDataFrame(_B0, "vec_id long, embedding array<double>")
    r = append_ann_index(b0, path, epoch=("ck", 0))
    assert r["rows"] == 1 and "skipped_epoch" not in r
    before = _codes_table(spark, path)
    assert append_ann_index(b0, path, epoch=("ck", 0)) == {
        "rows": 0, "clamped_values": 0, "skipped_epoch": True}
    # out-of-order (older) epoch ids skip too — Structured Streaming
    # epochs are monotonic per checkpoint
    assert append_ann_index(b0, path, epoch=("ck", -3))["skipped_epoch"]
    assert _codes_table(spark, path) == before
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert len(params["appends"]) == 1 and params["n_rows"] == 11


def test_epoch_key_map_is_bounded_lru(spark, tmp_path):
    """stream_epochs is capped at EPOCH_KEYS_KEEP distinct checkpoint
    keys, least-recently-appended evicted — the same bounded-metadata
    discipline as the appends history (one key per retired checkpoint
    would otherwise accumulate in params.json forever).  A live key
    keeps its exactly-once guard; re-appending under it refreshes its
    recency."""
    from grower_spark.operators.ann_index import EPOCH_KEYS_KEEP

    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    b = spark.createDataFrame(_B0, "vec_id long, embedding array<double>")
    append_ann_index(b, path, epoch=("first-ck", 0))
    for i in range(EPOCH_KEYS_KEEP):
        append_ann_index(
            spark.createDataFrame(
                [(200 + i, [1.0 * i, 2.0])],
                "vec_id long, embedding array<double>"),
            path, epoch=(f"other-ck-{i}", 0),
        )
    _, _, params = load_ann_index(spark, path, refresh=True)
    se = params["stream_epochs"]
    assert len(se) == EPOCH_KEYS_KEEP
    import hashlib

    first = hashlib.sha1(b"first-ck").hexdigest()[:12]
    assert first not in se  # oldest evicted
    # evicted key degrades to at-least-once: the replay appends again
    r = append_ann_index(b, path, epoch=("first-ck", 0))
    assert r["rows"] == 1 and "skipped_epoch" not in r


def test_epoch_append_crash_before_params_commit_converges(spark, tmp_path,
                                                           monkeypatch):
    """The r16 'Next round' 3 Done criterion: kill between the codes
    move and the params commit, replay the batch, and the index equals
    the batch-built twin — the scrub removes the first attempt's files
    before the replay re-lands them."""
    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    b0 = spark.createDataFrame(_B0, "vec_id long, embedding array<double>")
    append_ann_index(b0, path, epoch=("ck", 0))

    real = PosixIndexMeta.write_params
    boom = {"armed": True}

    def crashing_write(self, p, params):
        if boom["armed"] and "stream_epochs" in params \
                and params["stream_epochs"].get(
                    __import__("hashlib").sha1(b"ck").hexdigest()[:12]) == 1:
            boom["armed"] = False
            raise RuntimeError("injected crash before params commit")
        return real(self, p, params)

    monkeypatch.setattr(PosixIndexMeta, "write_params", crashing_write)
    b1 = spark.createDataFrame(_B1, "vec_id long, embedding array<double>")
    with pytest.raises(RuntimeError, match="injected crash"):
        append_ann_index(b1, path, epoch=("ck", 1))
    # crash point: codes moved, params NOT committed — the epoch-1
    # files are in the codes dir but unaccounted
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert params["stream_epochs"] == {
        __import__("hashlib").sha1(b"ck").hexdigest()[:12]: 0}
    # replay: scrub + re-move + commit → equals the batch twin
    r = append_ann_index(b1, path, epoch=("ck", 1))
    assert r["rows"] == 2 and "skipped_epoch" not in r
    twin = _twin(spark, tmp_path, "twin", [_B0, _B1])
    assert _codes_table(spark, path) == _codes_table(spark, twin)
    _, _, pa = load_ann_index(spark, path, refresh=True)
    _, _, pt = load_ann_index(spark, twin, refresh=True)
    assert pa["n_rows"] == pt["n_rows"] == 13


def test_epoch_append_scrubs_crashed_attempt_files(spark, tmp_path):
    """A mid-move crash leaves a partial set of epoch-prefixed files;
    the replay must remove them before re-landing (otherwise rows
    double-index)."""
    import hashlib

    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    ehash = hashlib.sha1(b"ck").hexdigest()[:12]
    cdir = codes_dir(path)
    # plant a duplicate of an existing codes file under epoch 0's prefix
    cell_d = next(d for d in sorted(os.listdir(cdir))
                  if d.startswith("cell="))
    src = next(f for f in os.listdir(os.path.join(cdir, cell_d))
               if f.endswith(".parquet"))
    stale = os.path.join(cdir, cell_d, f"ep-{ehash}-0-stale.parquet")
    shutil.copyfile(os.path.join(cdir, cell_d, src), stale)

    b0 = spark.createDataFrame(_B0, "vec_id long, embedding array<double>")
    append_ann_index(b0, path, epoch=("ck", 0))
    assert not os.path.exists(stale)
    twin = _twin(spark, tmp_path, "twin", [_B0])
    assert _codes_table(spark, path) == _codes_table(spark, twin)


def test_stream_failure_after_append_before_checkpoint_commit(spark,
                                                              tmp_path):
    """Streaming e2e failure injection: the foreachBatch sink fails
    AFTER append_ann_index committed the epoch but BEFORE Spark commits
    the checkpoint — the restarted stream REPLAYS that epoch_id, the
    epoch check skips it, and the final index equals the batch-built
    twin (no double-indexing).  This is the exact crash window the r16
    at-least-once note documented as unrepaired."""
    streamed = str(tmp_path / "streamed")
    build_ann_index(_toy(spark, n=10), streamed, n_cells=4)

    src = tmp_path / "incoming"
    src.mkdir()
    for i, b in enumerate([_B0, _B1]):
        stage = tmp_path / f"stage{i}"
        spark.createDataFrame(
            b, "vec_id long, embedding array<double>"
        ).coalesce(1).write.parquet(str(stage))
        part = next(p for p in os.listdir(str(stage))
                    if p.endswith(".parquet"))
        shutil.move(str(stage / part), str(src / f"b{i}.parquet"))

    def make_stream():
        return (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )

    seen = []

    def failing_hook(eid, res):
        seen.append((eid, res))
        if eid == 1:
            raise RuntimeError("injected post-append failure")

    ckpt = str(tmp_path / "ckpt")
    q = append_stream_to_index(make_stream(), streamed, checkpoint=ckpt,
                               on_batch=failing_hook)
    with pytest.raises(Exception):
        q.processAllAvailable()
    q.stop()
    # restart from the same checkpoint: epoch 1 replays and must skip
    seen2 = []
    q2 = append_stream_to_index(make_stream(), streamed, checkpoint=ckpt,
                                on_batch=lambda e, r: seen2.append((e, r)))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert any(r.get("skipped_epoch") for _, r in seen2), seen2

    twin = _twin(spark, tmp_path, "twin", [_B0, _B1])
    assert _codes_table(spark, streamed) == _codes_table(spark, twin)
    _, _, ps = load_ann_index(spark, streamed, refresh=True)
    assert ps["n_rows"] == 13


# ---------------------------------------------------------------------------
# append under the lock (r16 ADVICE 1)
# ---------------------------------------------------------------------------

def test_append_encodes_under_current_fit_despite_stale_memo(spark,
                                                             tmp_path):
    """r16 ADVICE 1 (medium): the fit/centroids load now happens INSIDE
    the mutation lock with freshness revalidation, so an append primed
    on a superseded index state encodes against the CURRENT fit, never
    the stale one.  Simulated as the cross-process race: prime the
    memo, swap the index content out-of-band, restore the stale memo
    entry, append — the appended codes must match the NEW fit."""
    import grower_spark.operators.ann_index as ai

    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)  # fit over 0..10
    load_ann_index(spark, path)  # prime the memo
    stale = dict(ai._LOAD_CACHE)
    # out-of-band "rebuild": same path, 10x the value range → new fit
    build_ann_index(
        spark.createDataFrame(
            [(i, [float(10 * i), float(10 * i + 1)]) for i in range(10)],
            "vec_id long, embedding array<double>"),
        path, n_cells=4,
    )
    ai._LOAD_CACHE.clear()
    ai._LOAD_CACHE.update(stale)  # the stale pre-rebuild snapshot

    append_ann_index(
        spark.createDataFrame([(50, [45.0, 46.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    codes, by_pos, params = load_ann_index(spark, path, refresh=True)
    got = next(r for r in codes.collect() if r["vec_id"] == 50)
    # under the NEW fit (0..91 per dim) 45.0 encodes mid-range; under
    # the stale fit (0..10) it would have clamped to 254
    mn, mx = by_pos[0]
    expect = (45_000 - mn) * 254 // (mx - mn)
    assert got["codes"][0] == expect < 254


# ---------------------------------------------------------------------------
# versioned codes generations (r16 ADVICE 4)
# ---------------------------------------------------------------------------

def test_generation_flip_keeps_one_reader_grace(spark, tmp_path):
    """Rebuild/compact write a NEW codes generation and flip params —
    the superseded generation survives exactly one more mutation so a
    cross-process reader mid-scan keeps intact files, then is GC'd."""
    corpus = _toy(spark, n=12)
    path = str(tmp_path / "idx")
    build_ann_index(corpus, path, n_cells=4)
    gen1 = codes_dir(path)
    assert os.path.basename(gen1).startswith("codes-")

    rebuild_ann_index(corpus, path)
    gen2 = codes_dir(path)
    assert gen2 != gen1
    assert os.path.isdir(gen1)  # one-generation grace
    assert os.path.isdir(gen2)

    compact_ann_index(spark, path)
    gen3 = codes_dir(path)
    assert gen3 != gen2
    assert not os.path.isdir(gen1)  # two mutations later: GC'd
    assert os.path.isdir(gen2) and os.path.isdir(gen3)
    # queries serve the current generation
    assert len(_topk(spark, path, k=5)) == 10


def test_legacy_unversioned_layout_still_serves(spark, tmp_path):
    """Indexes built before the r17 flip (codes/ at the top level, no
    codes_dir in params) must keep serving, appending, and compacting:
    the resolver falls back to the legacy name."""
    from grower_spark.operators.index_meta import get_index_meta

    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    # rewrite on disk into the legacy layout
    meta = get_index_meta()
    params = meta.read_params(path)
    os.rename(os.path.join(path, params["codes_dir"]),
              os.path.join(path, "codes"))
    del params["codes_dir"]
    meta.write_params(path, params)

    assert codes_dir(path) == os.path.join(path, "codes")
    before = _topk(spark, path)
    append_ann_index(
        spark.createDataFrame([(50, [5.0, 6.0])],
                              "vec_id long, embedding array<double>"),
        path,
    )
    assert len(_codes_table(spark, path)) == 11
    compact_ann_index(spark, path)  # migrates to a versioned generation
    assert os.path.basename(codes_dir(path)).startswith("codes-")
    assert {r[0] for r in _codes_table(spark, path)} == set(range(10)) | {50}
    assert _topk(spark, path) != [] and before is not None


# ---------------------------------------------------------------------------
# the metadata seam
# ---------------------------------------------------------------------------

class CountingMeta(PosixIndexMeta):
    def __init__(self):
        self.calls = {"read": 0, "write": 0, "lock": 0, "token": 0,
                      "publish": 0}

    def read_params(self, path):
        self.calls["read"] += 1
        return super().read_params(path)

    def write_params(self, path, params):
        self.calls["write"] += 1
        return super().write_params(path, params)

    def mutation_lock(self, path):
        self.calls["lock"] += 1
        return super().mutation_lock(path)

    def freshness_token(self, path):
        self.calls["token"] += 1
        return super().freshness_token(path)

    def publish_file(self, src, dest):
        self.calls["publish"] += 1
        return super().publish_file(src, dest)


def test_lifecycle_runs_through_the_metadata_seam(spark, tmp_path):
    """r16 verdict 'Next round' 6 Done criterion: the lifecycle tests
    run against the abstraction — every metadata touch of
    build → query → append → delete → compact → rebuild goes through
    the installed index_meta backend, so an object-store backend is a
    drop-in subclass (its contract table lives in index_meta's
    docstring)."""
    counting = CountingMeta()
    prev = set_index_meta(counting)
    try:
        path = str(tmp_path / "idx")
        build_ann_index(_toy(spark, n=10), path, n_cells=4)
        _topk(spark, path, k=3)
        append_ann_index(
            spark.createDataFrame([(50, [5.0, 6.0])],
                                  "vec_id long, embedding array<double>"),
            path,
        )
        delete_from_ann_index(spark, path, [1])
        compact_ann_index(spark, path)
        rebuild_ann_index(_toy(spark, n=10), path)
        counting.publish_file(
            os.path.join(path, "params.json"),
            str(tmp_path / "alias.json"),
        )
    finally:
        set_index_meta(prev)
    assert counting.calls["lock"] >= 4          # append/delete/compact/rebuild
    assert counting.calls["write"] >= 5         # every mutation commits
    assert counting.calls["read"] >= 4
    assert counting.calls["token"] >= 1         # memo revalidation
    assert counting.calls["publish"] == 1
    assert get_index_meta() is prev


class FakeObjectStoreMeta(PosixIndexMeta):
    """A NON-POSIX backend double: params live in an in-memory
    versioned KV (never on disk), commits are conditional-put CAS on a
    generation number, the writer lock is a lease dict, and the
    freshness token is the generation — i.e. exactly the object-store
    contract the index_meta docstring documents, with zero use of
    O_EXCL / rename / stat.  Running the full lifecycle through it
    proves the lifecycle code has no hidden POSIX-metadata dependency
    left (the parquet data tier still uses the filesystem, which is
    what Spark's committers abstract on a real object store)."""

    def __init__(self):
        self.kv = {}      # path -> (generation, params-json-str)
        self.leases = set()

    def read_params(self, path):
        import json as _json

        if path not in self.kv:
            raise FileNotFoundError(path)
        return _json.loads(self.kv[path][1])

    def write_params(self, path, params):
        import json as _json

        gen = self.kv.get(path, (0, None))[0]
        # conditional PUT: the single-writer lease makes the CAS
        # trivially succeed; a lost lease would surface here
        self.kv[path] = (gen + 1, _json.dumps(params))

    def mutation_lock(self, path):
        import contextlib

        @contextlib.contextmanager
        def _lease():
            if path in self.leases:
                raise RuntimeError(
                    f"ann index at {path}: lease held — single-writer")
            self.leases.add(path)
            try:
                yield
            finally:
                self.leases.discard(path)

        return _lease()

    def freshness_token(self, path):
        if path not in self.kv:
            raise FileNotFoundError(path)
        return ("gen", self.kv[path][0])

    def publish_file(self, src, dest):
        shutil.copyfile(src, dest)  # object PUT (data tier)


def test_lifecycle_on_a_non_posix_metadata_backend(spark, tmp_path):
    """The portability proof behind the seam: the ENTIRE lifecycle —
    build → query → epoch append → delete → compact → rebuild → query —
    runs against a backend with object-store semantics (in-memory CAS
    params, lease lock, generation freshness token) and never touches
    params.json / O_EXCL / rename / stat.  End state matches the
    POSIX-backend twin row-for-row."""
    fake = FakeObjectStoreMeta()
    prev = set_index_meta(fake)
    try:
        path = str(tmp_path / "idx")
        build_ann_index(_toy(spark, n=14), path, n_cells=4)
        assert not os.path.exists(os.path.join(path, "params.json"))
        append_ann_index(
            spark.createDataFrame([(100, [200.0, 1.0])],
                                  "vec_id long, embedding array<double>"),
            path, epoch=("s3-ck", 0),
        )
        assert append_ann_index(
            spark.createDataFrame([(100, [200.0, 1.0])],
                                  "vec_id long, embedding array<double>"),
            path, epoch=("s3-ck", 0),
        )["skipped_epoch"]
        delete_from_ann_index(spark, path, [2, 5])
        compact_ann_index(spark, path)
        rebuild_ann_index(_toy(spark, n=14), path)
        got = _topk(spark, path)
    finally:
        set_index_meta(prev)
    # POSIX twin of the same final state (rebuild over the full corpus)
    twin = str(tmp_path / "twin")
    build_ann_index(_toy(spark, n=14), twin, n_cells=4)
    assert got == _topk(spark, twin)


def test_delete_refuses_non_integral_ids(spark, tmp_path):
    """r16 ADVICE 2: a drop list with hash/string doc ids used to cast
    every id to NULL and silently retire NOTHING while exiting
    successfully — the worst failure mode for a dedup pass that
    believes it cleaned a served index.  Now it refuses loudly."""
    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    hashed = spark.createDataFrame(
        [("a1b2c3",), ("d4e5f6",)], "doc_id string")
    with pytest.raises(ValueError, match="not.*integral|cast to NULL"):
        delete_from_ann_index(spark, path, hashed)
    # numeric-typed and numeric-string ids still work
    assert delete_from_ann_index(
        spark, path,
        spark.createDataFrame([("3",), ("4",)], "doc_id string"),
    ) == {"tombstoned": 2}


def test_cli_ann_index_compact(spark, tmp_path, capsys):
    """The operational wrapper for the new repair: status's action field
    points at compact (deletes-only, clamp parked), `ann-index compact`
    runs it with no embeddings input, and a second status is clean."""
    import json

    from grower_spark.cli import main

    corpus = tmp_path / "corpus"
    _toy(spark, n=12).write.parquet(str(corpus))
    idx = str(tmp_path / "idx")
    assert main(["ann-index", "build", "--index", idx,
                 "--input", str(corpus), "--n-cells", "4"]) == 0
    capsys.readouterr()
    assert main(["ann-index", "delete", "--index", idx,
                 "--ids", "2,3,4"]) == 0
    capsys.readouterr()
    assert main(["ann-index", "status", "--index", idx,
                 "--deleted-frac-threshold", "0.2"]) == 0
    status = json.loads(capsys.readouterr().out)
    assert status["rebuild"] is True and status["action"] == "compact"

    assert main(["ann-index", "compact", "--index", idx]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == {"n_rows": 9, "compactions": 1}
    assert main(["ann-index", "status", "--index", idx]) == 0
    status = json.loads(capsys.readouterr().out)
    assert status["action"] is None and status["deletes"]["rows"] == 0
    rows = _topk(spark, idx, k=20)
    assert {r[1] for r in rows} == set(range(12)) - {2, 3, 4}


def test_delete_never_indexed_adds_zero_rebuild_signal(spark, tmp_path):
    """r16 verdict 'Next round' 4 Done criterion, stated directly:
    deleting a never-indexed id adds ZERO rebuild signal — deleted_frac
    stays 0.0 and should_rebuild stays quiet even for a huge unknown
    drop list (the dedup-pass-over-a-corpus-superset case)."""
    path = str(tmp_path / "idx")
    build_ann_index(_toy(spark, n=10), path, n_cells=4)
    unknown = spark.range(1_000, 2_000).select(
        F.col("id").alias("doc_id"))
    assert delete_from_ann_index(spark, path, unknown) == {"tombstoned": 0}
    _, _, params = load_ann_index(spark, path, refresh=True)
    assert "deletes" not in params
    sig = should_rebuild(params, deleted_frac_threshold=0.001)
    assert sig["action"] is None and sig["deleted_frac"] == 0.0
