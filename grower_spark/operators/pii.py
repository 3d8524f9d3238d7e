"""PII detection and redaction for training-data pipelines.

Corpus construction scrubs personally-identifying strings (emails, IP
addresses, phone/SSN-shaped numbers) before training.  The operators here
are pure per-row JVM regex expressions — ``regexp_count`` for signals,
one ``regexp_replace`` pass per pattern class for redaction — so the
whole stage runs at scan speed with zero shuffles and zero Python, and
pushes down/composes with the rest of the corpus pipeline (quality →
PII → dedup → pack).

Pattern notes:

- The patterns are the classic high-precision regex classes (the
  C4/Dolma-style scrub); a production deployment extends the dict —
  every added pattern stays a per-row expression.
- Deliberately RE2-compatible (no lookarounds, no backrefs): the same
  strings run under Java regex (Spark), RE2 (DuckDB oracle), and Python
  ``re``, which is what makes the driver row oracle-checkable.
- Redaction applies patterns in dict order; each class gets its own
  replacement token (``[EMAIL]``, ``[IPV4]``, ...) so downstream token
  statistics can still count redactions per class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

# Ordered: email first (its local part may contain digits/dots that other
# classes could nibble), then the dotted/dashed numeric shapes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+?\d{1,3}-\d{3}-\d{4}\b",
}


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``n_<class>`` match counts per pattern class and ``n_pii``
    (their sum).  Per-row, JVM-side."""
    out = df
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "text_redacted"
) -> DataFrame:
    """Adds ``out_col``: the text with every PII match replaced by its
    class token (``[EMAIL]`` etc.), patterns applied in dict order."""
    c = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return df.withColumn(out_col, c)
