"""Document chunking for training-data preparation: split each document
into overlapping token windows (chunk_size tokens, advancing by stride).

This is the standard pre-tokenization pass before packing sequences for
LLM training. Entirely map-side: tokenize with split/filter, generate
window starts with sequence(), explode, slice the token array — no
shuffle anywhere, so it scales linearly with corpus bytes at 100 TB
(the reference's closest analogue is NORMALIZE with COUNTER,
rtl/include/eclhelper.hpp:907, which it generalizes with a windowed
payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 50,
    stride: int = 40,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, window): chunk_index, token count, and the
    re-joined chunk text. Windows start at 0, stride, 2*stride, ... while
    the start is inside the document; the last window may be short.
    Empty documents produce no chunks. stride <= chunk_size gives
    overlapping windows (overlap = chunk_size - stride)."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    base = docs.select(
        F.col(id_col), ws.alias("ws"), F.size(ws).alias("n")
    ).where(F.col("n") > 0)
    start = F.explode(
        F.sequence(F.lit(0), F.col("n") - 1, F.lit(stride))
    ).alias("start")
    chunks = base.select(id_col, "ws", "n", start)
    chunk = F.slice(F.col("ws"), F.col("start") + 1, F.lit(chunk_size))
    return chunks.select(
        id_col,
        (F.col("start") / stride).cast("long").alias("chunk_index"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
