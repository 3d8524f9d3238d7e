"""Document chunking: split documents into fixed token windows with
optional overlap — the step between corpus filtering and sequence packing
in a training pipeline (long docs must become context-window-sized pieces
before a packer can bin them; overlap preserves cross-boundary context).

Pure per-row JVM array expressions (split → sequence → slice → join):
one explode, zero shuffles, linear scaling — the chunk fan-out happens
map-side exactly where the text already lives, so 100 TB chunks at scan
speed.  Pairs with ``operators.packing``: chunk ids are
``"<doc_id>:<chunk_idx>"`` strings, which ``pack_documents`` accepts
directly (ids keep their type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per (doc, window): ``(id_col, chunk_idx, chunk_id,
    chunk_text, n_chunk_tokens)``.

    Window i covers tokens ``[i*stride, i*stride + chunk_tokens)`` with
    ``stride = chunk_tokens - overlap_tokens``; the last window is the
    remainder (shorter, never empty).  Every token lands in at least one
    chunk; consecutive chunks share exactly ``overlap_tokens`` tokens
    except possibly the last.  Documents with at most ``chunk_tokens``
    tokens come out as one chunk equal to the document.  NULL text
    produces no chunks (explode of NULL).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # windows needed to cover n tokens: 1 + ceil((n - chunk) / stride) for
    # n > chunk, else 1 — exact integer ceil-div ((x + s - 1) div s; values
    # are small ints so the cast is exact)
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.lit(1) + ((extra + F.lit(stride - 1)) / F.lit(stride)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("toks"),
        ),
    )
    # size(NULL) is -1 (not NULL), so the window count must not be derived
    # from a NULL text silently — NULL text means no chunks, explicitly
    chunks = F.when(F.col(text_col).isNotNull(), chunks)
    ex = df.select(F.col(id_col), F.explode(chunks).alias("c"))
    return ex.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.concat_ws(
            ":", F.col(id_col).cast("string"), F.col("c.chunk_idx").cast("string")
        ).alias("chunk_id"),
        F.array_join(F.col("c.toks"), " ").alias("chunk_text"),
        F.size(F.col("c.toks")).cast("long").alias("n_chunk_tokens"),
    )
