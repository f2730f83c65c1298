"""Dedup family (SURVEY.md §2.5).

Reference: DEDUP adjacent/ALL/hash variants (TAKdedup :890, TAKhashdedup
:906; thorlcr/activities/rollup/throllupslave.cpp keepLeft/keepBest;
hash-table dedup in thhashdistribslave.cpp). ECL's adjacent DEDUP assumes a
sorted stream; distributed, the sorted-adjacency and hash forms coincide on
semantics, so everything lowers to either ``dropDuplicates`` (order-free)
or a row_number window (order-dependent keep-first/keep-best).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_all(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """DEDUP(ds[, keys], ALL) — order-independent dedup.

    Whole-row when ``keys`` is None (≡ DISTINCT). Note: with keys, which
    survivor row is kept is arbitrary — same as the reference's unordered
    hash dedup. Use ``dedup_keyed`` when the survivor matters.
    """
    return df.dropDuplicates(list(keys)) if keys else df.dropDuplicates()


def hash_dedup(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """DEDUP(DISTRIBUTE(ds, HASH(keys)), keys, LOCAL) ≡ hash dedup
    (TAKhashdedup :906). Spark's dropDuplicates IS distribute-then-dedup."""
    return df.dropDuplicates(list(keys))


def dedup_keyed(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    keep: int = 1,
) -> DataFrame:
    """DEDUP(SORT(ds, ...), keys[, KEEP n]) — deterministic keep-first-n.

    ECL's sorted DEDUP keeps the first row (or KEEP n rows) of each key run
    in sort order (throllupslave.cpp:36-96 keepLeft). One shuffle on the key;
    no global sort needed — the order only matters within key groups.

    KEEP 1 with plain ascending order keys lowers to ``min_by`` over the
    order tuple — a hash aggregate with map-side partial combine, so one
    candidate row per key per map task crosses the exchange instead of
    every input row feeding a window sort (guide §2.3 aggregate before you
    shuffle). Struct ordering compares fields left-to-right with NULLs
    first — the same ASC NULLS FIRST the window orderBy used, so the
    survivor is identical. KEEP n>1 or explicit desc() orderings keep the
    row_number window lowering.
    """
    if keep == 1 and all(isinstance(c, str) for c in order_by):
        ordc = F.struct(*[F.col(c) for c in order_by])
        row = F.struct(*[F.col(c) for c in df.columns])
        best = df.groupBy(*[F.col(k) for k in keys]).agg(
            F.min_by(row, ordc).alias("__best__")
        )
        return best.select("__best__.*")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*cols)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .where(F.col("__rn__") <= keep)
        .drop("__rn__")
    )


def dedup_best(
    df: DataFrame,
    keys: Sequence[str],
    best_by: Sequence[Column],
) -> DataFrame:
    """DEDUP(ds, keys, BEST(order)) — keep the best row per key
    (keepBest/compareBest, throllupslave.cpp:285-303).

    ``best_by`` is the ordering whose FIRST row wins (pass desc() columns
    for max-wins). Same window lowering as dedup_keyed.
    """
    return dedup_keyed(df, keys, list(best_by), keep=1)
