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
    # Non-empty guard as a RAW-TEXT regex (any non-whitespace char): a
    # `where(size(ws) > 0)` is predicate-pushed below the tokenizing
    # projection with the alias re-inlined, re-tokenizing every row at
    # the scan just to test emptiness.
    base = (
        docs.where(F.col(text_col).rlike(r"\S"))
        .select(F.col(id_col), ws.alias("ws"))  # tokenize once, not per use
        .select(id_col, "ws", F.size("ws").alias("n"))
    )
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


def pack_sequences(
    chunks: DataFrame,
    budget: int,
    *,
    len_col: str = "n_chunk_tokens",
    order_by: tuple[str, ...] = ("doc_id", "chunk_index"),
    partition_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget bins
    (the step after chunk_documents when preparing packed training
    batches). Offset-bucketing policy: conceptually concatenate the
    chunks in ``order_by`` order and put each chunk in the bin its START
    offset falls in — bin id = floor((cumsum − len) / budget) over one
    window scan. Deterministic and SQL-expressible (unlike best-fit bin
    packing, which is inherently sequential and data-dependent); bins
    average exactly ``budget`` tokens and deviate by less than one chunk
    length, so re-chunk anything longer than the budget first.

    With ``partition_col`` the packing is per-partition (e.g. per
    language or per shard), turning the global window into a keyed one.
    WITHOUT it, the running sum goes through the two-phase prefix-combine
    (range partition on the order keys, per-partition cumsum, driver
    prefix of one value per partition) — a naive ``Window.orderBy`` with
    no partitionBy plans an Exchange SinglePartition that funnels every
    chunk row through ONE task, the guaranteed-OOM shape at 100 TB
    (guide §2.4; same design as operators/numbering)."""
    from pyspark.sql import Window

    if partition_col is None:
        from hpcc_platform_spark.operators.transform import iterate_running

        cumd = iterate_running(
            chunks,
            order_by=list(order_by),
            __cum__=F.sum(F.col(len_col)),
        )
        return cumd.withColumn(
            "bin_id",
            F.floor(
                (F.col("__cum__") - F.col(len_col)) / F.lit(budget)
            ).cast("long"),
        ).drop("__cum__")
    w = Window.partitionBy(partition_col).orderBy(*order_by)
    cum = F.sum(F.col(len_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return chunks.withColumn(
        "bin_id",
        F.floor((cum - F.col(len_col)) / F.lit(budget)).cast("long"),
    )
