"""Workunit results (SURVEY.md §1.1): named result slots read/written by
queries (no_setresult/no_getresult, ecl/hql/hqlexpr.hpp:459-460;
TAKworkunitwrite :902 / TAKworkunitread :927).

Spark model: a driver-side registry of DataFrames/scalars; DataFrames are
also published as temp views so SQL can read them (OUTPUT(...,NAMED('x'))
then DATASET(WORKUNIT('x'))-style access).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


class WorkunitResults:
    """Named result slots for one logical workunit."""

    def __init__(self, spark: SparkSession, prefix: str = "wu"):
        self._spark = spark
        self._prefix = prefix
        self._slots: dict[str, Any] = {}

    def write(self, name: str, value: DataFrame | Any) -> None:
        """OUTPUT(..., NAMED(name)) — store a DataFrame or scalar result.

        Slot names are free-form (the reference's default is 'Result 1',
        space included); the SQL-visible view name sanitizes to
        identifier characters."""
        self._slots[name] = value
        if isinstance(value, DataFrame):
            import re

            safe = re.sub(r"[^A-Za-z0-9_]", "_", name)
            value.createOrReplaceTempView(f"{self._prefix}_{safe}")

    def read(self, name: str) -> Any:
        """DATASET(WORKUNIT(name)) / result fetch."""
        return self._slots[name]

    def names(self) -> list[str]:
        return sorted(self._slots)
