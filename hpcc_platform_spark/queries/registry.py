"""Registry plumbing for operator-coverage queries.

Contract (driver): each query is ``fn(spark, sf_dir) -> DataFrame``; the
oracle is an ANSI-SQL string DuckDB runs against the same parquet tables
(pre-registered views). Column names must match exactly — the driver's
compare sorts columns by name before value-hashing.

Determinism rules applied throughout the query set:
- Every floating-point *aggregate* is rounded (ROUND(x, 4)) on BOTH sides;
  double summation order differs between engines (and between cluster runs),
  so unrounded sums hash-mismatch in the last ulp.
- Pass-through double columns are NOT rounded (bit-identical from parquet).
- Any LIMIT/top-n query fully tie-breaks its ORDER BY so the selected *set*
  is deterministic (the hash is order-insensitive, but the set must be).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    category: str
    # False → pytest-only: excluded from the driver's queries() contract.
    # Used for queries whose output is engine-specific by design (e.g.
    # Spark xxhash64 signatures DuckDB cannot reproduce) and which have an
    # oracle-checked portable sibling covering the same operator.
    driver_visible: bool = True


REGISTRY: dict[str, QueryDef] = {}


def query(
    name: str,
    oracle: str | None = None,
    category: str = "misc",
    driver_visible: bool = True,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            driver_visible=driver_visible,
        )
        return fn

    return deco


def tables(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    """Load the named TESTDATA parquet tables from ``sf_dir``."""
    from hpcc_platform_spark.session import read_table

    return [read_table(spark, sf_dir, n) for n in names]
