"""As-of (point-in-time) join — the time-series matcher Spark lacks
natively (SURVEY.md §2.3 custom-operator slot; the reference approximates
it with sorted KEYED JOIN + ATMOST(1) stepping, thorstep.cpp, and DuckDB /
Pandas ship it as ASOF JOIN / merge_asof).

Spark-first design — NOT a join node: tag both sides, union them, and run
one partitioned window (``last(right_payload, ignorenulls)`` over rows up
to the current one) ordered by (time, side). Each left row then carries
the most recent right payload at-or-before its timestamp. Cost: ONE
shuffle on the key — no range-condition BNLJ, no per-key explosion, and
skewed keys are just big window partitions (AQE-splittable input). This
is the distributed merge-scan the classic algorithm describes, expressed
declaratively so Catalyst/Tungsten run it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RV = "__asof_rv__"
_SIDE = "__asof_side__"
_T = "__asof_t__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_time`` <= ``left_time`` (direction='backward', the default) or
    the smallest ``right_time`` >= ``left_time`` ('forward'), matching on
    the equi-key(s) ``on``. Unmatched left rows keep NULLs (left-outer
    semantics, like pandas.merge_asof / DuckDB ASOF LEFT JOIN).

    ``tolerance``: optional max separation as a Column interval/number —
    matches farther than it are nulled out (merge_asof's tolerance).
    Right payload columns come back suffixed when they collide with left
    names. Ties on the same timestamp prefer the right row (it is
    "already known" at that instant), matching DuckDB's >= semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload_cols
    }

    # NULL never equals NULL (join/ASOF semantics): a NULL-key left row
    # must not match a NULL-key right row, but the window partitioning
    # below would group them together. Route NULL-key left rows around
    # the merge-scan (they come back with NULL payload) and drop NULL-key
    # right rows entirely.
    keys_ok = F.lit(True)
    for k in keys:
        keys_ok = keys_ok & F.col(k).isNotNull()
    null_left = left.where(~keys_ok)
    left = left.where(keys_ok)
    right = right.where(keys_ok)

    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias(_T),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_RV),
        F.lit(0).alias(_SIDE),
    )
    l_tagged = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_lv__"),
        *[F.col(k) for k in keys],
        F.col(left_time).alias(_T),
        F.lit(None).cast(r_tagged.schema[_RV].dataType).alias(_RV),
        F.lit(1).alias(_SIDE),
    )
    unioned = r_tagged.select(
        F.lit(None).cast(l_tagged.schema["__asof_lv__"].dataType).alias("__asof_lv__"),
        "*",
    ).unionByName(l_tagged)

    # side 0 (right) sorts before side 1 (left) at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row.
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_T).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col(_T).desc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    matched = unioned.withColumn(_RV, F.last(_RV, ignorenulls=True).over(w)).where(
        F.col(_SIDE) == 1
    )

    rv = F.col(_RV)
    if tolerance is not None:
        # Separation measured on the matched right row's own time column —
        # callers must include right_time in the right payload to use
        # tolerance; enforce that instead of silently mis-measuring.
        if right_time not in payload_cols:
            raise ValueError(
                "tolerance requires the right_time column to be part of the "
                "right payload (it carries the matched row's timestamp)"
            )
        sep = (
            F.col(_T) - rv[right_time]
            if direction == "backward"
            else rv[right_time] - F.col(_T)
        )
        rv = F.when(sep <= tolerance, rv)

    lv = F.col("__asof_lv__")
    out = matched.select(
        *[lv[c].alias(c) for c in left.columns],
        *[rv[c].alias(out_names[c]) for c in payload_cols],
    )
    return out.unionByName(
        null_left.select(
            *[F.col(c) for c in left.columns],
            *[
                F.lit(None).cast(right.schema[c].dataType).alias(out_names[c])
                for c in payload_cols
            ],
        )
    )
