"""Skew mitigation: salting for joins and aggregations.

The reference exposes SKEW() options on SORT/JOIN/DISTRIBUTE (e.g.
thorlcr/msort sample-based partitioning tolerates declared skew); Spark's
AQE skew-join splitting covers the join case at runtime. These helpers are
the *static* fallback for the cases AQE can't rewrite: a hot key in a
shuffle aggregation, or a join where one side's hot keys are known.

Salting trades one shuffle's skew for a fan-out factor: the hot side gets a
random salt in [0, n); the other side is replicated n ways. Aggregations
do partial-by-(key, salt) then final-by-key — two balanced shuffles instead
of one straggler.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_n: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side with
    rand(seed)*salt_n, explode ``small`` × salt_n, join on keys+salt.
    Result rows are identical to the unsalted join; the shuffle spreads
    each hot key over ``salt_n`` reducers."""
    sk = skewed.withColumn(
        "__salt__", F.floor(F.rand(seed) * salt_n).cast("int")
    )
    sm = small.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<int>")),
    )
    out = sk.join(sm, [*on, "__salt__"], how)
    return out.drop("__salt__")


def salted_agg_sum(
    df: DataFrame,
    keys: Sequence[str],
    sums: dict[str, str],
    salt_n: int = 16,
    seed: int = 42,
) -> DataFrame:
    """groupBy(keys).sum(...) with a hot-key-safe two-phase plan:
    partial sum by (keys, salt), final sum by keys. ``sums`` maps
    input column → output alias. (Spark's hash aggregate already does
    map-side partials; explicit salting additionally balances the
    *reduce* side when one key dominates a partition's output.)"""
    salted = df.withColumn("__salt__", F.floor(F.rand(seed) * salt_n).cast("int"))
    partial = salted.groupBy(*keys, "__salt__").agg(
        *[F.sum(c).alias(f"__p_{a}") for c, a in sums.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"__p_{a}").alias(a) for a in sums.values()]
    )
