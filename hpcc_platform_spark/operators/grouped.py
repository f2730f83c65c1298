"""GROUPED-dataset convention (SURVEY.md §1.1, §4.3 item 2).

ECL's GROUP (TAKgroup :901 / TAKdegroup :900; type_groupedtable
rtlconst.hpp:50) attaches group boundaries to a sorted stream; downstream
operators (SORT, DEDUP, TOPN, ROLLUP, ITERATE, aggregate, FILTER) then
apply *within each group* until DEGROUP.

Spark has no boundary-carrying stream, and doesn't need one: grouping is a
planning convention — the keys ride along, and each operator lowers to the
windowed/grouped form partitioned by those keys. This wrapper IS that
convention: construct with ``group(df, keys)``, chain per-group ops,
``ungroup()`` to exit. Every lowering shuffles at most once on the group
keys, and consecutive ops reuse the same hash partitioning (Catalyst's
EnsureRequirements) — the analogue of the reference executing a pipeline of
grouped activities on one distributed stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(spec: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in spec]


class GroupedFrame:
    """A DataFrame + carried grouping keys. Immutable; ops return new
    GroupedFrames (or a plain DataFrame where ECL degroups implicitly)."""

    def __init__(self, df: DataFrame, keys: Sequence[str]):
        self.df = df
        self.keys = list(keys)

    # -- remaining grouped --------------------------------------------------
    def filter_rows(self, cond: Column) -> "GroupedFrame":
        """Row-level FILTER on a grouped dataset — grouping survives."""
        return GroupedFrame(self.df.where(cond), self.keys)

    def filter_groups(self, cond: Column, mode: str = "any") -> "GroupedFrame":
        """Group-level FILTER (TAKfiltergroup :1014): keep whole groups
        where any/all rows satisfy ``cond``."""
        from hpcc_platform_spark.operators.transform import filter_group

        return GroupedFrame(filter_group(self.df, self.keys, cond, mode), self.keys)

    def sort(self, *order_by: str | Column) -> "GroupedFrame":
        """SORT on GROUPed data = sort within each group. Lowered lazily:
        the order is recorded by the ops that consume it (dedup/topn/
        iterate take explicit order), and physically it's
        sortWithinPartitions after a keys-shuffle."""
        parted = self.df.repartition(*_cols(self.keys))
        return GroupedFrame(
            parted.sortWithinPartitions(*_cols(self.keys), *_cols(order_by)),
            self.keys,
        )

    def dedup(self, order_by: Sequence[str | Column], keep: int = 1) -> "GroupedFrame":
        """DEDUP on GROUPed data: keep first ``keep`` rows per group in
        ``order_by`` order (throllupslave.cpp keepLeft)."""
        from hpcc_platform_spark.operators.dedup import dedup_keyed

        return GroupedFrame(
            dedup_keyed(self.df, self.keys, order_by, keep), self.keys
        )

    def topn(self, n: int, order_by: Sequence[str | Column]) -> "GroupedFrame":
        """TOPN on GROUPed data (TAKtopn on grouped input): n best rows per
        group — WindowGroupLimit kicks in (no full sort per group)."""
        from hpcc_platform_spark.operators.transform import choosesets

        return GroupedFrame(choosesets(self.df, self.keys, n, order_by), self.keys)

    def iterate(
        self, order_by: Sequence[str | Column], **running: Column
    ) -> "GroupedFrame":
        """ITERATE on GROUPed data: running aggregates restart per group."""
        from hpcc_platform_spark.operators.transform import iterate_running

        return GroupedFrame(
            iterate_running(self.df, order_by, self.keys, **running), self.keys
        )

    def project(self, *cols: str | Column, **named: Column) -> "GroupedFrame":
        """PROJECT on GROUPed data — must retain the group keys."""
        out = self.df.select(*_cols(self.keys), *_cols(cols), *[c.alias(n) for n, c in named.items()])
        return GroupedFrame(out, self.keys)

    # -- implicit degroup ---------------------------------------------------
    def rollup(self, *aggs: Column) -> DataFrame:
        """ROLLUP/aggregate on GROUPed data: one output row per group —
        degroups (matches ECL: TABLE/ROLLUP of grouped data ungroups)."""
        return self.df.groupBy(*_cols(self.keys)).agg(*aggs)

    def counts(self) -> DataFrame:
        """Per-group COUNT — the grouped aggregate fast path."""
        return self.df.groupBy(*_cols(self.keys)).agg(F.count(F.lit(1)).alias("n"))

    def ungroup(self) -> DataFrame:
        """DEGROUP (TAKdegroup :900): drop the convention, keep the rows."""
        return self.df

    def with_group_id(self, name: str = "__group_id__") -> "GroupedFrame":
        """Materialize a stable group id (hash of keys) — useful when a
        downstream op needs a single grouping column."""
        return GroupedFrame(
            self.df.withColumn(name, F.xxhash64(*_cols(self.keys))), self.keys
        )

    def group_ordinal(self, order_by: Sequence[str | Column], name: str = "ordinal") -> "GroupedFrame":
        """Per-group 1-based row numbering (ECL COUNTER within GROUP)."""
        w = Window.partitionBy(*_cols(self.keys)).orderBy(*_cols(order_by))
        return GroupedFrame(self.df.withColumn(name, F.row_number().over(w)), self.keys)


def group(df: DataFrame, keys: Sequence[str]) -> GroupedFrame:
    """GROUP(ds, keys) (TAKgroup :901) — enter the grouped convention."""
    return GroupedFrame(df, keys)


def degroup(gf: GroupedFrame) -> DataFrame:
    """GROUP(ds) / DEGROUP — exit."""
    return gf.ungroup()
