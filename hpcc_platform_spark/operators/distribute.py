"""Explicit distribution / partitioning (SURVEY.md §2.8).

Reference: DISTRIBUTE(ds, HASH(...)) (TAKhashdistribute :905,
thorlcr/activities/hashdistrib/thhashdistribslave.cpp — 4.7k LoC of
sender/receiver threads that Spark's shuffle replaces wholesale),
DISTRIBUTE,MERGE (:1032), KEYED DISTRIBUTE (:940).

In Spark, distribution is usually implicit (Catalyst inserts exchanges);
these combinators exist for the ECL-level *explicit* cases: pre-partitioning
to co-locate a later join/agg chain, range partitioning for sorted output,
and skew salting (the reference's SKEW() hints on SORT/JOIN).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(spec: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in spec]


def distribute_hash(df: DataFrame, keys: Sequence[str | Column], n: int | None = None) -> DataFrame:
    """DISTRIBUTE(ds, HASH32(keys)) — hash repartition.

    Reusing this partitioning across several joins/aggs on the same keys is
    the point: Catalyst's EnsureRequirements recognizes the existing hash
    partitioning and skips re-shuffling — the Spark form of the reference's
    'distribute once, do N local ops' idiom.
    """
    cols = _cols(keys)
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def distribute_range(df: DataFrame, keys: Sequence[str | Column], n: int | None = None) -> DataFrame:
    """KEYED DISTRIBUTE / range partition (TAKkeyeddistribute :940) —
    partition by sampled range split points (Spark RangePartitioner ≡ the
    reference's sampled split-point computation, tsortm.cpp:227-357)."""
    cols = _cols(keys)
    return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)


def distribute_merge(df: DataFrame, keys: Sequence[str | Column], n: int | None = None) -> DataFrame:
    """DISTRIBUTE(ds, key, MERGE) (TAKhashdistributemerge :1032) —
    repartition keeping each partition sorted on the keys."""
    cols = _cols(keys)
    out = df.repartition(n, *cols) if n else df.repartition(*cols)
    return out.sortWithinPartitions(*cols)


def salt_skew(
    df: DataFrame,
    key: str,
    n_salts: int,
    salt_col: str = "__salt__",
) -> DataFrame:
    """Skew mitigation: explode one hot key into ``n_salts`` sub-keys.

    The reference exposes SKEW() tolerances on SORT/DISTRIBUTE and handles
    hot keys by spilling; at Spark scale prefer AQE's skew-join splitting,
    and use salting when a groupBy (not join) skews: groupBy(key, salt) →
    partial → groupBy(key) → final. The salt is deterministic (hash of a
    tiebreaker) so results are reproducible.
    """
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def partition_meta(df: DataFrame, *key_cols: str) -> DataFrame:
    """PARTITION metadata (TAKpartition :953, meta activity :1001): one row
    per physical partition — id, row count, and per-key min/max — the
    reference's partition-boundary metadata surfaced as a DataFrame.

    One narrow aggregation (spark_partition_id groupBy); used for skew
    diagnostics and to audit a DISTRIBUTE/range layout without touching
    row data twice."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for k in key_cols:
        aggs += [F.min(k).alias(f"min_{k}"), F.max(k).alias(f"max_{k}")]
    return (
        df.withColumn("__pid__", F.spark_partition_id())
        .groupBy(F.col("__pid__").alias("partition_id"))
        .agg(*aggs)
    )
