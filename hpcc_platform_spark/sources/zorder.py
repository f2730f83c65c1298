"""Z-order (Morton-curve) clustering for multi-column scan pruning.

The reference's INDEX gives prefix-ordered pruning only: a B+tree sorted
on (a, b) seeks well on `a` but scans everything for a bare `b` filter
(jhtree segment monitors, system/jhtree/). Engines at Spark scale close
that gap by clustering files on a space-filling curve so parquet
row-group min/max stats stay tight on EVERY participating column — this
module is that superset capability (the Delta/Iceberg OPTIMIZE ZORDER
analogue), built from plain column arithmetic:

1. scale each column to a ``bits``-wide integer rank within its
   [min, max] range (the 1-row min/max frame is a broadcast),
2. interleave the bits JVM-side (shiftleft/bitwise-or chain — no UDF),
3. repartitionByRange + sortWithinPartitions on the z-value and write.

A filter on ANY z-ordered column then prunes row groups by footer
stats, not just a filter on the leading sort key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _scaled_rank(col: str, mn: Column, mx: Column, bits: int) -> Column:
    """Column scaled to an integer in [0, 2^bits): linear position of the
    value inside the observed [min, max] range (numeric columns;
    timestamps work via their epoch cast upstream)."""
    top = (1 << bits) - 1
    span = (mx - mn).cast("double")
    frac = F.when(span > 0, (F.col(col).cast("double") - mn.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(
        F.lit(top).cast("long"), F.floor(frac * top).cast("long")
    )


def zorder_value(ranks: Sequence[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each rank column into one Morton
    value (rank 0 owns the least-significant lane)."""
    n = len(ranks)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    n_parts: int | None = None,
) -> None:
    """Write ``df`` clustered on the Morton curve over ``cols``: filters
    on any of the columns prune row groups via footer min/max. The
    per-column min/max come from one tiny aggregate broadcast back; the
    z column is dropped before the write."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    stats = df.agg(*aggs)
    with_z = df.crossJoin(broadcast(stats))
    ranks = [
        _scaled_rank(c, F.col(f"__mn_{c}"), F.col(f"__mx_{c}"), bits) for c in cols
    ]
    with_z = with_z.withColumn("__z__", zorder_value(ranks, bits)).drop(
        *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )
    parted = (
        with_z.repartitionByRange(n_parts, "__z__")
        if n_parts
        else with_z.repartitionByRange("__z__")
    )
    parted.sortWithinPartitions("__z__").drop("__z__").write.mode(
        "overwrite"
    ).parquet(path)
