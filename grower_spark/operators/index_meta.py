"""Index-metadata backend seam: every params/lock/freshness/publish
primitive the persisted ANN index relies on, behind ONE small interface
(r16 verdict "What's missing" 2 / "Next round" 6).

Why this exists: the index's *data* tier (codes/tombstones/centroids
parquet) is already engine- and store-portable — Spark writes it, DuckDB
reads it, an object store holds it.  The *metadata* tier was not: the
single-writer lock needed ``O_EXCL``, freshness needed ``os.stat``,
completion needed an atomic ``os.replace`` rename, and the trained-
quantizer oracle read through an ``os.symlink``.  On S3/GCS none of
those contracts exist, so "scale-correct plans" silently stopped being
"deployable at 100 TB".  This module names each primitive, ships the
POSIX implementation as the default, and documents exactly what an
object-store implementation must provide — so the lifecycle code never
touches ``os`` for metadata directly and a store-specific backend is a
drop-in subclass.

The four primitives and their object-store mapping:

=====================  ===============================  =======================================
primitive              POSIX implementation             object-store contract
=====================  ===============================  =======================================
``write_params``       tmp file + ``os.replace``        conditional PUT (If-Match on the prior
                       (rename IS the completion         ETag / If-None-Match for the first
                       marker)                           write); the PUT is the completion marker
``mutation_lock``      ``O_EXCL`` lock file             a lease: DynamoDB/etcd conditional
                                                         insert with TTL, or the store's own
                                                         conditional-create; crash recovery =
                                                         lease expiry instead of "remove the
                                                         lock file after checking"
``freshness_token``    ``os.stat`` (mtime_ns, size)     the params object's ETag / generation
                       of params.json                    number — returned by a HEAD request
``publish_file``       copy + ``os.replace`` to a       plain PUT of the object at the alias
                       stable alias path                 key (object PUTs are atomic per key)
=====================  ===============================  =======================================

What deliberately does NOT need a backend method: the parquet
codes/tombstones/centroids writes themselves (Spark's committers already
target object stores), and directory GC (best-effort, correctness never
depends on it — see ann_index's one-generation grace contract).

Tests run the full index lifecycle through this seam with an
instrumented backend (tests/test_r17_ops.py) so a new backend only has
to pass the same four contracts.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil


class PosixIndexMeta:
    """Default backend: a POSIX filesystem shared by driver and readers
    (local disk, NFS, Lustre).  Every method's semantics — not its
    mechanism — is the contract a subclass must keep."""

    def read_params(self, path: str) -> dict:
        """Read the committed params for the index at ``path``.
        Raises ``FileNotFoundError`` if no build ever completed."""
        with open(os.path.join(path, "params.json")) as f:
            return json.load(f)

    def try_read_params(self, path: str):
        """``read_params`` or None for absent/partial metadata — the
        build-once caches' probe (a truncated params.json from a crash
        mid-write must read as "not built", never raise)."""
        try:
            return self.read_params(path)
        except (FileNotFoundError, json.JSONDecodeError, OSError):
            return None

    def write_params(self, path: str, params: dict) -> None:
        """Atomically replace the committed params.  The visibility of
        the new params IS the completion marker every reader keys on: a
        crash mid-write must leave the previous params intact."""
        tmp = os.path.join(path, "params.json.tmp")
        with open(tmp, "w") as f:
            json.dump(params, f)
        os.replace(tmp, os.path.join(path, "params.json"))

    @contextlib.contextmanager
    def mutation_lock(self, path: str):
        """Single-WRITER guard for index mutations (append / delete /
        compact / rebuild): held for the WHOLE mutation, not just the
        params rewrite — two concurrent Spark jobs appending to the
        same parquet directory share its ``_temporary`` staging dir, so
        one job's commit can silently delete the other's in-flight task
        files; serializing the mutation is the only safe contract, and
        a second writer fails LOUDLY rather than corrupting codes or
        losing a counter update.  (The initial ``build_ann_index`` takes
        no lock: it is the initializing event on a fresh path.)
        POSIX: O_EXCL lock file; a crash can orphan it; the error says
        which file to remove after checking no writer is live.  An
        object-store backend replaces this with a TTL lease so crash
        recovery is automatic."""
        lock = os.path.join(path, "params.json.lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"ann index at {path}: params.json.lock exists — another "
                "writer is updating the index metadata (the index is "
                "single-writer by contract), or a previous writer "
                "crashed; verify no writer is live, then remove "
                f"{lock}"
            ) from None
        try:
            yield
        finally:
            os.close(fd)
            os.unlink(lock)

    def freshness_token(self, path: str) -> tuple:
        """An opaque token that changes whenever ``write_params``
        commits — the cross-process cache-revalidation probe (one
        metadata HEAD per query call, no data I/O).  POSIX: the
        params.json stat; object store: its ETag."""
        st = os.stat(os.path.join(path, "params.json"))
        return (st.st_mtime_ns, st.st_size)

    def publish_file(self, src: str, dest: str) -> None:
        """Atomically publish a copy of ``src`` at the stable alias
        path ``dest`` — the pointer-artifact primitive that replaced
        the r16 trained-oracle symlink (r16 ADVICE 3: a symlink is
        POSIX-only and its target can dangle; a published copy is
        self-contained and an object PUT is atomic per key)."""
        tmp = f"{dest}.tmp-{os.getpid()}"
        shutil.copyfile(src, tmp)
        os.replace(tmp, dest)


# Module-level backend handle: ann_index routes every metadata touch
# through this.  Swap with set_index_meta for a different store (or an
# instrumented test double).
_META: PosixIndexMeta = PosixIndexMeta()


def get_index_meta() -> PosixIndexMeta:
    return _META


def set_index_meta(meta: PosixIndexMeta) -> PosixIndexMeta:
    """Install a backend; returns the previous one (tests restore it)."""
    global _META
    prev = _META
    _META = meta
    return prev
