"""INDEX build/read (SURVEY.md §2.1): the reference's B+tree indexes
(system/jhtree/) re-expressed as sorted, partitioned parquet with min/max
statistics.

Why this is the right mapping: an HPCC INDEX is (a) globally sorted on the
keyed fields, (b) range-partitioned into parts, (c) consulted via KEYED
range filters with bloom filters (jhtree.hpp:44-58, bloom.hpp:33-146).
Parquet gives (a) within files via sort, (b) via repartitionByRange, and
(c) via row-group min/max + optional bloom filters + partition pruning —
Catalyst pushes KEYED-style predicates into the scan automatically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession


def build_index(
    df: DataFrame,
    path: str,
    keyed: Sequence[str],
    n_parts: int | None = None,
    bloom_cols: Sequence[str] | None = None,
) -> None:
    """INDEX build (TAKindexwrite :923; keybuild.cpp): global sort by the
    keyed fields → range-partitioned sorted parquet parts.

    Parquet writes min/max stats per row group for free; ``bloom_cols``
    additionally enables parquet bloom filters (the analogue of the
    reference's index blooms) for high-cardinality point lookups.
    """
    parted = (
        df.repartitionByRange(n_parts, *keyed) if n_parts else df.repartitionByRange(*keyed)
    )
    writer = parted.sortWithinPartitions(*keyed).write.mode("overwrite")
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(path)


def read_index(
    spark: SparkSession,
    path: str,
    keyed_filter: Column | None = None,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """INDEX read (TAKindexread :963 + fused filter/project variants
    :964-968): scan with KEYED ranges pushed into the parquet reader.

    The returned plan shows PushedFilters — the Spark form of the
    reference's segment monitors (rtl/eclrtl/rtlkey.hpp) — and prunes row
    groups via the stats written at build time.
    """
    df = spark.read.parquet(path)
    if keyed_filter is not None:
        df = df.where(keyed_filter)
    if columns:
        df = df.select(*columns)
    return df
