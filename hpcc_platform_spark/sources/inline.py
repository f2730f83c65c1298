"""Inline tables (TAKinlinetable :1034) — DATASET([...]) literal rows."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def inline_dataset(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema: T.StructType | str,
) -> DataFrame:
    """DATASET([{...}, ...], rec) → createDataFrame with an explicit schema
    (never inferred — ECL records are always fully typed, SURVEY §1.3)."""
    return spark.createDataFrame(list(rows), schema=schema)
