"""Small-file compaction — the unglamorous operator every long-running
ingestion pipeline needs.

Streaming sinks, per-trigger micro-batches, and over-parallel writers
leave behind thousands of kilobyte parquet files; at 100 TB the
scheduler overhead (one task + one footer fetch per file), the
NameNode/object-store listing cost, and the lost row-group compression
dominate actual read work.  Compaction rewrites a directory to files of
a target on-disk size, measured from the table's OWN bytes-per-row (the
parquet footers already know), not a guessed row count.

Plan: one footer-only pass computes total bytes and rows (no data
read), the file count is ``ceil(total_bytes / target_bytes)``, and the
rewrite is a single ``repartition(n)`` round-robin shuffle — the one
shuffle this job exists to pay; row order is NOT preserved (parquet
directories have no order contract; use write_zordered when the layout
must carry locality).
"""

from __future__ import annotations

import os


def parquet_footprint(path: str) -> tuple[int, int, int]:
    """(n_files, total_bytes, total_rows) from the parquet footers —
    metadata only, zero data read."""
    import pyarrow.parquet as pq

    n_files = total_bytes = total_rows = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(root, f)
            n_files += 1
            total_bytes += os.path.getsize(fp)
            total_rows += pq.read_metadata(fp).num_rows
    return n_files, total_bytes, total_rows


def compact_parquet(spark, input_path: str, output_path: str,
                    target_mb: int = 256) -> dict:
    """Rewrite ``input_path`` to ``output_path`` at ~``target_mb`` files.

    Returns the audit: files/bytes/rows before and after.  The file
    count is derived from measured bytes (compression-aware), floored at
    1; tiny tables become one file.
    """
    if target_mb <= 0:
        raise ValueError(f"target_mb must be positive, got {target_mb}")
    n_in, bytes_in, rows_in = parquet_footprint(input_path)
    target_bytes = target_mb * 1024 * 1024
    n_out = max(1, -(-bytes_in // target_bytes))  # ceil
    df = spark.read.parquet(input_path)
    df.repartition(n_out).write.mode("overwrite").parquet(output_path)
    n_files, bytes_out, rows_out = parquet_footprint(output_path)
    if rows_out != rows_in:
        raise RuntimeError(
            f"compaction row mismatch: {rows_in} in, {rows_out} out"
        )
    return {
        "files_in": n_in, "bytes_in": bytes_in, "rows": rows_in,
        "files_out": n_files, "bytes_out": bytes_out,
        "target_mb": target_mb,
    }
