"""File sources (reference S1/S3: internal/services/filelog/impl.go).

The reference scans a rotated log file line-by-line on a 60s ticker; the
Spark-native equivalent is the file streaming source: new files appearing in
a directory become micro-batch input, with admission control
(``maxFilesPerTrigger``) standing in for the reference's one-file-per-tick
and ``cleanSource`` standing in for its backup handling (S2/S4).

Divergence (documented): the reference caps lines at 64KB
(bufio.Scanner, impl.go:220-223); Spark's text source has no such cap.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def batch_lines(spark: SparkSession, path: str) -> DataFrame:
    """One-shot scan of a log file/directory -> DataFrame[value: string]."""
    return spark.read.text(path)


def stream_lines(
    spark: SparkSession,
    directory: str,
    max_files_per_trigger: Optional[int] = 1,
    clean_source: Optional[str] = None,
    archive_dir: Optional[str] = None,
) -> DataFrame:
    """Streaming scan of a log directory -> streaming DataFrame[value].

    - ``max_files_per_trigger=1`` ≈ the reference's one rotated file per
      scrape tick (S3).
    - ``clean_source='archive'`` + ``archive_dir`` ≈ backup retention (S4):
      consumed files move aside instead of being re-read; ``'delete'``
      removes them (reference's max-age cleanup end state).
    """
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
        if clean_source == "archive" and archive_dir:
            reader = reader.option("sourceArchiveDir", archive_dir)
    return reader.load(directory)
