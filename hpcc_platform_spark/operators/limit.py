"""LIMIT semantics (SURVEY.md §2.6): fail / skip / substitute when a row
count exceeds a bound.

Reference: TAKlimit :931 (fail), TAKskiplimit :975 (dataset becomes empty),
TAKcreaterowlimit :1009 (substitute a single ONFAIL row);
thorlcr/activities/limit/, Roxie ccdserver.cpp:20511,20604.

The count guard is distributed: ``limit(n+1).count()`` scans only until n+1
rows are found (Spark's incremental take), not the whole input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


class LimitExceeded(RuntimeError):
    """ECL LIMIT exceeded — analogue of the reference's workunit abort."""


def _exceeds(df: DataFrame, n: int) -> bool:
    return len(df.limit(n + 1).take(n + 1)) > n


def limit_fail(df: DataFrame, n: int) -> DataFrame:
    """LIMIT(ds, n) — error if ds has more than n rows (TAKlimit :931)."""
    if _exceeds(df, n):
        raise LimitExceeded(f"LIMIT({n}) exceeded")
    return df


def limit_skip(df: DataFrame, n: int) -> DataFrame:
    """LIMIT(ds, n, SKIP) — empty dataset if over the bound (TAKskiplimit)."""
    if _exceeds(df, n):
        return df.limit(0)
    return df


def limit_onfail(df: DataFrame, n: int, fail_row: Row) -> DataFrame:
    """LIMIT(ds, n, ONFAIL(transform)) — substitute a marker row
    (TAKcreaterowlimit :1009)."""
    if _exceeds(df, n):
        return df.sparkSession.createDataFrame([fail_row], schema=df.schema)
    return df
