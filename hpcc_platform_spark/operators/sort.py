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


def assert_sorted(df: DataFrame, *order_by: str | Column) -> DataFrame:
    """SORTED(ds, keys) assertion (TAKsorted :1000): pass rows through
    unchanged, failing the job if any partition's rows are not
    non-decreasing on the keys.

    Distributed check, zero extra shuffle: a window ordered by the
    EXISTING partition layout isn't expressible, so instead each row is
    compared with its predecessor inside an Arrow batch scan
    (mapInArrow) — the same pairwise check the reference's terasort
    verification uses. Note: validates the per-partition (LOCAL SORTED)
    property; global order additionally needs boundary checks as in
    queries/q_sort.terasort_verify."""
    # String column names only: Column -> name extraction via _jc.toString()
    # is classic-JVM-only (breaks under Spark Connect) and loses NULL
    # ordering info. Keys must name real columns of df.
    names = []
    for c in order_by:
        if not isinstance(c, str):
            raise TypeError(
                "assert_sorted takes column NAMES (str); got a Column "
                "expression — alias it onto the frame first"
            )
        names.append(c)
    missing = [n for n in names if n not in df.columns]
    if missing:
        raise ValueError(f"assert_sorted: unknown columns {missing}")
    schema = df.schema

    # mapInArrow, not mapInPandas: Arrow keeps NULL (validity mask) and
    # float NaN (a value) distinct — the pandas conversion collapses both
    # to NaN, which (a) makes Spark's asc order "NULLS FIRST ... values ...
    # NaN LAST" unverifiable and (b) corrupts passthrough NaNs to NULL on
    # the yield. Raw batches also mean true zero-copy passthrough.
    def sort_key(row):
        # Per key: (0 NULL | 1 value | 2 NaN, comparable value) — matches
        # Spark's asc ordering with NULL first and NaN last.
        return tuple(
            (0, 0) if v is None
            else (2, 0) if isinstance(v, float) and v != v
            else (1, v)
            for v in row
        )

    def check(batches):
        prev = None  # last key tuple of the previous batch
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cols = [
                batch.column(batch.schema.get_field_index(n)).to_pylist()
                for n in names
            ]
            keys = [
                sort_key(tuple(c[i] for c in cols))
                for i in range(batch.num_rows)
            ]
            for a, b in zip([prev] + keys, keys):
                if a is not None and a > b:
                    raise AssertionError(
                        f"SORTED assertion failed: {a!r} > {b!r} on {names}"
                    )
            prev = keys[-1]
            yield batch

    return df.mapInArrow(check, schema=schema)
