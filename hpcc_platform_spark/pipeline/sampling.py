"""Deterministic content-addressed sampling and dataset splits.

Training pipelines need samples and train/val/test splits that are (a)
reproducible across runs and engines, (b) stable under repartitioning,
and (c) consistent for the same key everywhere it appears — properties
``rand()``-based sampling lacks (the reference's ENTH/SAMPLE operators,
eclhelper.hpp:899/:913, are deterministic for the same reasons; this
module is their content-addressed generalization: keyed by VALUE, not
position, so adding rows never reshuffles existing assignments).

Mechanism: bucket = md5(salt ‖ key) mod n_buckets — map-only, JVM-side,
and exactly replicable in any engine with md5 (the DuckDB oracle runs
the same formula). Use a salt per experiment so independent samples
decorrelate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: str | Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the md5 of salt‖key.

    Uses the top 8 hex digits (32 bits) of the md5 — unbiased for any
    n_buckets that divides 2^32 and within 2^-32 otherwise."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def hash_sample(
    df: DataFrame,
    key: str | Column,
    pct: int,
    salt: str = "",
) -> DataFrame:
    """Keep ~pct% of rows, chosen by content hash of ``key`` — same key
    always in or always out, across runs, engines, and partitionings."""
    if not 0 <= pct <= 100:
        raise ValueError("pct must be 0..100")
    return df.where(hash_bucket(key, 100, salt) < pct)


def hash_split(
    df: DataFrame,
    key: str | Column,
    splits: dict[str, int],
    salt: str = "",
    name: str = "split",
) -> DataFrame:
    """Attach a deterministic split label ('train'/'val'/'test'/...)
    chosen by content hash. ``splits`` maps label → percentage and must
    sum to 100; labels are assigned to contiguous bucket ranges in dict
    order, so the same (splits, salt) always yields the same partition
    of keys."""
    if sum(splits.values()) != 100:
        raise ValueError(f"split percentages must sum to 100: {splits}")
    bucket = hash_bucket(key, 100, salt)
    expr = None
    lo = 0
    for label, pct in splits.items():
        cond = (bucket >= lo) & (bucket < lo + pct)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        lo += pct
    return df.withColumn(name, expr)
