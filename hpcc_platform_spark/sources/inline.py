"""Inline tables (TAKinlinetable :1034) — DATASET([...]) literal rows.

``createDataFrame`` over local rows builds a *Python-RDD-backed* plan:
every action re-runs the Python scan, paying a per-partition Python
worker handshake (~0.2 s each here), and the rows parallelize over
``defaultParallelism`` partitions — a literal 8-row table costs cores×
handshakes per action, and a pair-join over two such tables multiplies
that into cores² tasks (measured 17.5 s for 28 output rows, guide §4).
``inline_dataset`` therefore lowers literal rows to a pure-JVM plan —
``range(1 partition) → inline(array(struct...))`` with every field cast
to the declared type — and only falls back to ``createDataFrame`` for
shapes literals can't express (nested structs/maps, non-literal values).
"""

from __future__ import annotations

import datetime
import decimal
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCALAR = (
    bool,
    int,
    float,
    str,
    bytes,
    bytearray,
    decimal.Decimal,
    datetime.date,
    datetime.datetime,
)


class _Unliteral(Exception):
    """A value literal expressions can't express — fall back."""


def _lit(v, dt: T.DataType) -> Column:
    if v is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, T.ArrayType):
        if not isinstance(v, (list, tuple)):
            raise _Unliteral(repr(v))
        if not v:
            return F.expr("array()").cast(dt)
        return F.array(*[_lit(x, dt.elementType) for x in v]).cast(dt)
    if isinstance(dt, (T.StructType, T.MapType)):
        raise _Unliteral(dt.simpleString())
    if not isinstance(v, _SCALAR):
        raise _Unliteral(repr(v))
    return F.lit(v).cast(dt)


def parse_schema(spark: SparkSession, schema: T.StructType | str) -> T.StructType:
    """DDL string → StructType (empty createDataFrame runs no job)."""
    if isinstance(schema, T.StructType):
        return schema
    return spark.createDataFrame([], schema=schema).schema


def inline_dataset(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema: T.StructType | str,
) -> DataFrame:
    """DATASET([{...}, ...], rec) with an explicit schema (never inferred —
    ECL records are always fully typed, SURVEY §1.3), lowered to a JVM
    literal plan whenever the values are expressible as literals."""
    rows = list(rows)
    st = parse_schema(spark, schema)
    if rows:
        try:
            structs = [
                F.struct(
                    *[
                        _lit(row[i], f.dataType).alias(f.name)
                        for i, f in enumerate(st.fields)
                    ]
                )
                for row in rows
            ]
            return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
        except _Unliteral:
            pass
    return spark.createDataFrame(rows, schema=st)
