"""Deterministic cross-engine hashing primitives.

``md5_60`` produces a 60-bit non-negative bigint from the md5 hex prefix —
computable identically in Spark (``conv(substring(md5(x),1,15),16,10)``),
DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``), and Python
(``hashlib.md5``), which is what makes dedup/LSH operators oracle-checkable.

``xxhash_60`` is the scale-path variant (Spark's JVM xxhash64, masked to
60 bits): ~10x cheaper than md5, but Spark-only — use it in production
pipelines, keep md5 for cross-engine verification.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
import pyspark.sql.functions as F


def md5_60(col: Column) -> Column:
    """60-bit bigint from md5(utf8(col)); non-negative, engine-portable."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def md5_60_py(value: str) -> int:
    """Python twin of md5_60 (for plan-time constants like LSH planes)."""
    return int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)


def md5_60_duck(expr: str) -> str:
    """DuckDB SQL twin of md5_60 for oracle generation."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def xxhash_60(col: Column, seed_col: Column | None = None) -> Column:
    """60-bit bigint from xxhash64 — the fast JVM-side path for 100TB runs."""
    h = F.xxhash64(col) if seed_col is None else F.xxhash64(seed_col, col)
    return F.pmod(h, F.lit(1 << 60)).cast("long")
