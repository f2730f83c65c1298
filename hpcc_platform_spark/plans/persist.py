"""PERSIST + dataset-level CSE (SURVEY.md §2.12, §4.3).

PERSIST in the reference (workflow engine, common/workunit/workflow.cpp;
WFModePersist workunit.hpp:585-603) materializes a named result keyed by a
hash of its expression + inputs, recomputing only when either changes. The
Spark analogue: parquet files keyed by the DataFrame's optimized logical
plan string + input file fingerprints.

Dataset CSE: the reference shares common subtrees structurally (commoned-up
expression DAG); Spark recomputes shared lineage per action, so auto_persist
marks a shared subplan for reuse explicitly.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession


def _plan_fingerprint(df: DataFrame) -> str:
    """Stable content key for a DataFrame: optimized logical plan text +
    input file listing (paths, sizes, mtimes). Expression ids (#123) are
    normalized out: they are allocation order, not semantics, and differ
    every time the same query text is re-built (e.g. two run_ecl calls) —
    without this, re-parsed identical plans never hit the cache."""
    import re as _re

    plan = _re.sub(
        r"#\d+", "#", df._jdf.queryExecution().optimizedPlan().toString()
    )
    files = sorted(df.inputFiles())
    meta_parts = [plan]
    for f in files:
        local = f.removeprefix("file:")
        try:
            st = os.stat(local)
            meta_parts.append(f"{f}|{st.st_size}|{int(st.st_mtime)}")
        except OSError:
            meta_parts.append(f)
    return hashlib.sha256("\n".join(meta_parts).encode()).hexdigest()[:24]


class PersistCache:
    """PERSIST('name'): content-addressed parquet materialization.

    >>> cache = PersistCache(spark, "/tmp/persist")
    >>> big = cache.persist(expensive_df, "daily_rollup")

    Re-running the same plan over unchanged inputs reads the parquet back
    (instant); any change to plan or inputs produces a new key and a fresh
    materialization — exactly the reference's recompute-iff-changed rule.
    """

    def __init__(self, spark: SparkSession, root: str):
        self._spark = spark
        self._root = root
        os.makedirs(root, exist_ok=True)

    def persist(self, df: DataFrame, name: str) -> DataFrame:
        key = _plan_fingerprint(df)
        path = os.path.join(self._root, f"{name}__{key}")
        marker = os.path.join(path, "_SUCCESS")
        if not os.path.exists(marker):
            df.write.mode("overwrite").parquet(path)
        return self._spark.read.parquet(path)


def auto_persist(df: DataFrame, min_reuses: int = 2) -> DataFrame:
    """Dataset-level CSE: mark a subplan that feeds ≥2 downstream branches
    for storage-level reuse (Spark recomputes shared lineage otherwise —
    the one structural optimization the reference gets for free that
    Catalyst doesn't, SURVEY §4.1 'CSE').

    MEMORY_AND_DISK so a 100 TB intermediate spills instead of OOMing.
    """
    from pyspark import StorageLevel

    if min_reuses >= 2:
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df
