"""Plan-shape audit: the repo's scale discipline as a reusable check.

Every operator here is judged by its physical plan (SCALE.md): filters
pushed to the scan, small sides broadcast, no accidental cartesians,
shuffles only on intended keys, wide codegen spans. ``plan_report``
extracts those facts from an executed-plan string so tests (and users
tuning a query) can assert them without regex archaeology; ``assert_plan``
is the one-liner used by plan tests.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    n_exchanges: int          # shuffle Exchange nodes (excl. broadcast)
    n_broadcasts: int         # BroadcastExchange nodes
    n_scans: int              # file source scans
    scans_with_pushdown: int  # scans carrying a non-empty PushedFilters
    joins: list[str]          # join node types in plan order
    has_cartesian: bool
    n_codegen_spans: int      # codegen regions (0 until an AQE plan is final)
    aqe: bool                 # AdaptiveSparkPlan present
    text: str                 # raw plan text (for ad-hoc greps)


def plan_report(df: DataFrame) -> PlanReport:
    # The formatted explain, NOT executedPlan().toString(): the default
    # tree truncates each node's simpleString, which routinely cuts off
    # PushedFilters on wide scans and fakes a missing-pushdown failure.
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    text = qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # Tree nodes are numbered "(N) NodeName" exactly once each; details
    # sections repeat the names, so count only numbered tree entries.
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+[A-Za-z ]*)", text)
    nodes = [n.strip() for n in nodes]
    joins = [
        n.split()[0]
        for n in nodes
        if n.split()[0]
        in {
            "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
            "BroadcastNestedLoopJoin", "CartesianProduct",
        }
    ]
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    return PlanReport(
        n_exchanges=sum(1 for n in nodes if n.split()[0] == "Exchange"),
        n_broadcasts=sum(1 for n in nodes if n.split()[0] == "BroadcastExchange"),
        n_scans=len(re.findall(r"\(\d+\) Scan (?:parquet|orc)", text)),
        scans_with_pushdown=sum(1 for p in pushed if p.strip()),
        joins=joins,
        has_cartesian="CartesianProduct" in joins,
        n_codegen_spans=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        aqe="AdaptiveSparkPlan" in text,
        text=text,
    )


def assert_plan(
    df: DataFrame,
    *,
    max_exchanges: int | None = None,
    require_broadcast: bool = False,
    require_pushdown: bool = False,
    forbid_cartesian: bool = True,
    forbid_join_types: tuple[str, ...] = (),
) -> PlanReport:
    """Assert the common scale contracts in one call; returns the report
    so callers can make further specific checks."""
    r = plan_report(df)
    if forbid_cartesian and r.has_cartesian:
        raise AssertionError(f"CartesianProduct in plan:\n{r.text}")
    for j in forbid_join_types:
        if j in r.joins:
            raise AssertionError(f"{j} in plan joins {r.joins}:\n{r.text}")
    if require_broadcast and r.n_broadcasts == 0:
        raise AssertionError(f"no BroadcastExchange in plan:\n{r.text}")
    if require_pushdown and r.scans_with_pushdown == 0:
        raise AssertionError(f"no scan carries PushedFilters:\n{r.text}")
    if max_exchanges is not None and r.n_exchanges > max_exchanges:
        raise AssertionError(
            f"{r.n_exchanges} exchanges (max {max_exchanges}):\n{r.text}"
        )
    return r
