"""Dataset iteration / control flow (SURVEY.md §2.11).

Reference: LOOP (TAKloopcount/looprow/loopdataset :987-989,
thorlcr/activities/loop/), GRAPH loops (:995-996), APPLY (:904),
CATCH (:1022-1024). These are driver-side control flow in the Spark model:
Python re-applies DataFrame transforms; lineage grows per iteration, so we
checkpoint (localCheckpoint) every ``checkpoint_every`` iterations — the
Spark analogue of the reference materializing loop bodies between subgraph
executions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def loop_count(
    df: DataFrame,
    n: int,
    body: Callable[[DataFrame, int], DataFrame],
    checkpoint_every: int = 10,
) -> DataFrame:
    """LOOP(ds, n, body) (TAKloopcount :987) — apply body n times.

    ``body(ds, counter)`` gets the 1-based iteration counter (ECL COUNTER).
    Checkpointing truncates lineage so plan size stays O(checkpoint_every),
    not O(n) — without it Catalyst plan analysis dominates at high n.
    """
    out = df
    for i in range(1, n + 1):
        out = body(out, i)
        if checkpoint_every and i % checkpoint_every == 0 and i < n:
            out = out.localCheckpoint(eager=False)
    return out


def loop_until(
    df: DataFrame,
    body: Callable[[DataFrame, int], DataFrame],
    done: Callable[[DataFrame, int], bool],
    max_iters: int = 100,
    checkpoint_every: int = 5,
) -> DataFrame:
    """LOOP(ds, condition, body) (TAKloopdataset :989) — iterate until
    ``done(ds, counter)`` (an action — e.g. a count check) returns True.

    Because the loop condition forces an action per iteration, each
    iteration is materialized; eager localCheckpoint avoids recomputing the
    full lineage for both the probe and the next body.
    """
    out = df
    for i in range(1, max_iters + 1):
        if done(out, i):
            break
        out = body(out, i)
        if checkpoint_every and i % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out


def graph_loop(
    df: DataFrame,
    n: int,
    body: Callable[[list[DataFrame], int], DataFrame],
    checkpoint_every: int = 10,
) -> DataFrame:
    """GRAPH(ds, n, body) (TAKgraphloop :995) — iteration where the body
    sees ALL previous results (ROWSET), not just the last one."""
    results = [df]
    for i in range(1, n + 1):
        nxt = body(results, i)
        if checkpoint_every and i % checkpoint_every == 0 and i < n:
            nxt = nxt.localCheckpoint(eager=False)
        results.append(nxt)
    return results[-1]


def apply_action(df: DataFrame, fn: Callable, per_partition: bool = True) -> None:
    """APPLY(ds, action) (TAKapply :904) — side effect per row/partition.

    Per-partition is the scale-sane default (one connection/file handle per
    partition, not per row)."""
    if per_partition:
        df.foreachPartition(fn)
    else:
        df.foreach(fn)
