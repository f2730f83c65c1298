"""Multi-input set operations (SURVEY.md §2.7).

Reference: append/funnel (TAKfunnel :903, thorlcr/activities/funnel/),
NONEMPTY (TAKnonempty :1008), REGROUP (TAKregroup :982). INTERSECT/EXCEPT
are absent as primitives in the reference (expressed via semi/anti joins) —
Spark's ``intersect``/``except`` are a free superset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def funnel(*dfs: DataFrame) -> DataFrame:
    """ds1 + ds2 + ... (TAKfunnel :903) — UNION ALL concatenation.

    The reference distinguishes ordered ('+') vs interleaved ('&') pull
    order (Roxie ccdserver.cpp:13959,14117); Spark row order is not a stream
    property, so both map to unionByName. Inputs must share a schema.
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def nonempty(*dfs: DataFrame) -> DataFrame:
    """NONEMPTY(d1, d2, ...) (TAKnonempty :1008) — first input with rows.

    Driver-side head(1) probes in order; each probe is a cheap limit-1 job
    (Spark stops at the first non-empty partition). Returns the last input
    if all are empty.
    """
    for d in dfs[:-1]:
        if d.limit(1).count() > 0:
            return d
    return dfs[-1]


def regroup(keys: Sequence[str], *dfs: DataFrame) -> DataFrame:
    """REGROUP (TAKregroup :982) — interleave groups from multiple grouped
    inputs into one grouped dataset.

    Under the grouped-dataset convention (SURVEY §1.1: grouping = carried
    keys, not stream boundaries), regroup is union — downstream per-group
    ops see the union of each key's rows across inputs. ``keys`` documents
    the carried grouping.
    """
    return funnel(*dfs)
