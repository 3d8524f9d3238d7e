"""Log rotation + backup retention (reference S2/S4: pkg/fileio).

These are OS-level driver-side helpers, deliberately NOT Spark operators
(SURVEY.md §2.1 S2): rotation renames the live log out from under the
writer and signals it to reopen; the renamed file then lands in the
directory a Spark file-stream watches.

Naming mirrors the reference: ``<original>-<unix_ts>.growerlog``
(pkg/fileio/io.go:19-21); retention keeps the newest ``max_backups`` and
drops files older than ``max_age`` (pkg/fileio/io.go:23-73).
"""

from __future__ import annotations

import gzip
import os
import re
import shutil
import subprocess
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

BACKUP_SUFFIX = ".growerlog"
GZ_SUFFIX = BACKUP_SUFFIX + ".gz"


def stamp_name(original: str, now: Optional[float] = None) -> str:
    ts = int(now if now is not None else time.time())
    return f"{original}-{ts}{BACKUP_SUFFIX}"


def _backup_ts(original_base: str, name: str) -> Optional[int]:
    pat = re.escape(original_base) + r"-(\d+)" + re.escape(BACKUP_SUFFIX) + r"(\.gz)?"
    m = re.fullmatch(pat, name)
    return int(m.group(1)) if m else None


def compress_backup(path: str) -> str:
    """Gzip a rotated backup in place (write .gz, fsync-free rename, unlink
    the original) — the reference's "compressing logs" TODO (README.md:30).
    Spark's text source reads .gz transparently, so the rotation directory
    stream keeps working on compressed backups."""
    gz_path = path + ".gz"
    tmp = gz_path + ".tmp"
    with open(path, "rb") as src, gzip.open(tmp, "wb") as dst:
        shutil.copyfileobj(src, dst)
    os.rename(tmp, gz_path)  # readers never see a partial .gz
    os.remove(path)
    return gz_path


def nginx_reopen() -> None:
    """Tell nginx to reopen its logs (reference pkg/fileio/file.go:24-29)."""
    subprocess.run(["nginx", "-s", "reopen"], check=True)


@dataclass
class Rotator:
    """Rename the live log aside and signal the writer to reopen.

    ``reopen`` is injectable (default: no-op; pass ``nginx_reopen`` for the
    reference behavior) so tests and non-nginx writers work.
    """

    path: str
    reopen: Callable[[], None] = field(default=lambda: None)
    clock: Callable[[], float] = time.time
    compress: bool = False

    def rotate(self) -> Optional[str]:
        """Returns the backup path (gzipped when ``compress``), or None when
        the live log is absent/empty (the reference skips empty rotations,
        pkg/fileio/rotate.go:36-44)."""
        if not os.path.exists(self.path) or os.path.getsize(self.path) == 0:
            return None
        backup = stamp_name(self.path, self.clock())
        os.rename(self.path, backup)
        self.reopen()  # writer reopens immediately; compression happens after
        if self.compress:
            backup = compress_backup(backup)
        return backup


def clear_backup_files(
    original: str,
    directory: str,
    max_backups: int = 5,
    max_age_seconds: Optional[float] = None,
    now: Optional[float] = None,
) -> list[str]:
    """Delete old ``*.growerlog`` backups; returns the deleted paths.

    Keeps the newest ``max_backups``; additionally drops anything older
    than ``max_age_seconds`` (reference pkg/fileio/io.go:23-73, newest-first
    sort at io.go:81-93).
    """
    now = now if now is not None else time.time()
    base = os.path.basename(original)
    backups: list[tuple[int, str]] = []
    for name in os.listdir(directory):
        ts = _backup_ts(base, name)
        if ts is not None:
            backups.append((ts, os.path.join(directory, name)))
    backups.sort(reverse=True)  # newest first
    doomed = [p for _, p in backups[max_backups:]]
    if max_age_seconds is not None:
        cutoff = now - max_age_seconds
        doomed += [p for ts, p in backups[:max_backups] if ts < cutoff]
    for p in doomed:
        os.remove(p)
    return doomed
