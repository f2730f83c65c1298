"""Sorts / top-k / merge (SURVEY.md §2.6).

Reference: Thor's distributed merge sort — sample, compute range split
points on the master, partition-exchange, per-node sort, merge
(thorlcr/msort/tsortm.cpp:66,227-357; tsorts.cpp). Spark's ``orderBy`` is
the same design (reservoir-sampled RangePartitioner + per-partition sort),
so global SORT is a single call. TOPN's per-partition-heap + merge
(thorlcr/activities/topn/) is Spark's TakeOrderedAndProject.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(spec: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in spec]


def global_sort(df: DataFrame, *order_by: str | Column) -> DataFrame:
    """SORT(ds, keys) (TAKsort :889) — global total order.

    Spark's sort is range-partitioned and stable w.r.t. ties only if the
    key is total; ECL's default sort is stable (JFunstable flag opts out,
    eclhelper.hpp:1745) — callers needing stability must include a
    tiebreaker column, which is also what makes results deterministic.
    """
    return df.orderBy(*_cols(order_by))


def local_sort(df: DataFrame, *order_by: str | Column) -> DataFrame:
    """SORT(ds, keys, LOCAL) — per-partition sort, no exchange."""
    return df.sortWithinPartitions(*_cols(order_by))


def subsort(
    df: DataFrame,
    prefix: Sequence[str | Column],
    rest: Sequence[str | Column],
) -> DataFrame:
    """SUBSORT (TAKsubsort :1029) — refine an existing sort by extra keys.

    The reference re-sorts within runs of the already-sorted prefix without
    a global exchange. Spark equivalent: repartition by the prefix, then
    sort within partitions by (prefix, rest) — one hash shuffle, no range
    exchange.
    """
    return df.repartition(*_cols(prefix)).sortWithinPartitions(
        *_cols(prefix), *_cols(rest)
    )


def topn(df: DataFrame, n: int, *order_by: str | Column) -> DataFrame:
    """TOPN(ds, n, keys) (TAKtopn :936, IHThorTopNExtra eclhelper.hpp:1690).

    orderBy().limit() plans as TakeOrderedAndProject: per-partition top-n
    heaps merged on the driver — no global sort, same algorithm as the
    reference's.
    """
    return df.orderBy(*_cols(order_by)).limit(n)


def merge_sorted(dfs: Sequence[DataFrame], *order_by: str | Column, dedup: bool = False) -> DataFrame:
    """MERGE(d1, d2, ..., SORTED(keys)) (TAKmerge :937, n-way :1003).

    The reference k-way-merges already-sorted streams preserving order. In
    Spark order is a property of the final plan, not the stream; union +
    orderBy yields the identical multiset/order. With dedup=True matches
    MERGE,DEDUP.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    out = out.orderBy(*_cols(order_by))
    return out.dropDuplicates() if dedup else out
