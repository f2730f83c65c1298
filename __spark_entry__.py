"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
every implemented operator from SURVEY.md §2 (one named DataFrame program
each); ``oracle_sql()`` gives the DuckDB-equivalent SQL per query. The real
registry lives in ``hpcc_platform_spark/queries/`` — this module adapts it
to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hpcc_platform_spark.queries import REGISTRY, ordered_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped grouped aggregate) on sf0.001."""
    return REGISTRY["groupagg_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries the driver has never hash-verified come first
    (family-interleaved within each phase): the 50-query verification
    window checks new ground each round, making driver coverage
    cumulative across rounds.

    Each callable first releases the numbering caches the PREVIOUS query
    persisted (two-phase row numbering pins frames for plan reuse;
    operators/numbering.py) so a long driver run over many queries holds
    at most one query's caches at a time.
    """

    def _released(fn: Callable) -> Callable:
        def run(spark: SparkSession, sf_dir: str, _fn: Callable = fn) -> DataFrame:
            from hpcc_platform_spark.operators.numbering import (
                release_numbering_caches,
            )

            release_numbering_caches()
            return _fn(spark, sf_dir)

        return run

    return {name: _released(qd.fn) for name, qd in ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omitted → rows-only check)."""
    return {
        name: qd.oracle
        for name, qd in ordered_registry().items()
        if qd.oracle is not None
    }
