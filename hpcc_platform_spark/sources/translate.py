"""Record-layout translation: actual → expected/projected with strictness.

Reference: the reader format-mapping triple (actual / expected / projected,
``common/thorhelper/thorread.hpp:33-64``) governed by
``RecordTranslationMode`` (``rtl/eclrtl/rtldynfield.hpp:106-115``):

- ``None``  — never translate; the on-disk layout must match the declared
  one exactly or the read fails.
- ``Payload`` — translate: drop extra fields, NULL-fill missing ones, and
  widen compatible types (the dynamic translator of rtldynfield.cpp).
- ``PayloadRemoveOnly`` — extra on-disk fields may be dropped, but every
  declared field must exist on disk (no NULL-filling).

Spark-first: the "translator" is a projection of casts — Catalyst folds it
into the scan (column pruning still reaches parquet; widening casts are
codegen). Multi-generation files read with mergeSchema, so one logical
dataset can span layout generations exactly like the reference's
per-part translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WIDEN_RANK = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
}
_FLOAT_RANK = {T.FloatType: 1, T.DoubleType: 2}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    """Safe (lossless) widenings only — the reference's translator refuses
    narrowing the same way."""
    if src == dst:
        return True
    s, d = type(src), type(dst)
    if s in _WIDEN_RANK:
        if d in _WIDEN_RANK:
            return _WIDEN_RANK[s] <= _WIDEN_RANK[d]
        if isinstance(dst, T.DecimalType):
            # long needs 19 integer digits to be lossless
            need = {1: 3, 2: 5, 3: 10, 4: 19}[_WIDEN_RANK[s]]
            return dst.precision - dst.scale >= need
        return d is T.DoubleType and _WIDEN_RANK[s] <= 3  # int32 fits double
    if s in _FLOAT_RANK and d in _FLOAT_RANK:
        return _FLOAT_RANK[s] <= _FLOAT_RANK[d]
    if isinstance(src, T.DecimalType) and isinstance(dst, T.DecimalType):
        return (
            dst.scale >= src.scale
            and dst.precision - dst.scale >= src.precision - src.scale
        )
    if s is T.DateType and d is T.TimestampType:
        return True
    return False


def read_translated(
    spark: SparkSession,
    paths: str | list[str],
    expected_ddl: str,
    mode: str = "payload",
) -> DataFrame:
    """Read parquet under a declared (expected) layout with the given
    RecordTranslationMode: 'none' | 'payload' | 'remove_only'."""
    if isinstance(paths, str):
        paths = [paths]
    actual_df = spark.read.option("mergeSchema", "true").parquet(*paths)
    actual = {f.name: f.dataType for f in actual_df.schema.fields}
    expected = T.StructType.fromDDL(expected_ddl)

    if mode == "none":
        if actual_df.schema != expected:
            raise ValueError(
                "RecordTranslationMode.None: layout mismatch — disk "
                f"{actual_df.schema.simpleString()} vs declared "
                f"{expected.simpleString()}"
            )
        return actual_df

    cols = []
    for f in expected.fields:
        if f.name in actual:
            src = actual[f.name]
            if not _can_widen(src, f.dataType):
                raise ValueError(
                    f"cannot translate field {f.name!r}: "
                    f"{src.simpleString()} -> {f.dataType.simpleString()} "
                    "is not a lossless widening"
                )
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif mode == "remove_only":
            raise ValueError(
                f"RecordTranslationMode.PayloadRemoveOnly: field {f.name!r} "
                "missing from disk layout"
            )
        else:  # payload: NULL-fill added fields
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return actual_df.select(*cols)
