"""Workflow item modes beyond PERSIST/STORED/WHEN (SURVEY §2.12).

Reference: workflow item modes ``WFModeNormal..WFModeCritical`` and types
``WFTypeSuccess/Failure/Recovery/Wait`` (common/workunit/workunit.hpp:575-603),
executed by the state machine in common/workunit/workflow.cpp:

- ``ONCE``        — evaluate once per process, every use shares the result.
- ``RECOVERY(n)`` — on failure, retry the item up to n times before failing
  the workunit (workflow.cpp attemptRetry).
- ``CHECKPOINT``  — materialize here so downstream failure recovery restarts
  from this point instead of the sources.
- ``INDEPENDENT`` — evaluate exactly once even when referenced from several
  branches (shared-subplan semantics; see also plans.persist.auto_persist
  for the automatic dataset-CSE form).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

_ONCE_CACHE: dict[str, object] = {}


def once(key: str, builder: Callable[[], object]) -> object:
    """ONCE workflow mode (WFModeOnce, workunit.hpp:585-603): ``builder``
    runs at most once per driver process; later calls share the result.
    ECL evaluates ONCE items at query start — here evaluation is lazy but
    still unique."""
    if key not in _ONCE_CACHE:
        _ONCE_CACHE[key] = builder()
    return _ONCE_CACHE[key]


def recovery(
    action: Callable[[], object],
    attempts: int = 3,
    backoff_s: float = 0.0,
) -> object:
    """RECOVERY(action, n) (WFTypeRecovery workunit.hpp:575-583;
    workflow.cpp attemptRetry): rerun a failed workflow item up to
    ``attempts`` times; the last failure propagates (aborting the
    workunit, as the reference does when retries exhaust)."""
    last: BaseException | None = None
    for i in range(attempts):
        try:
            return action()
        except Exception as e:  # noqa: BLE001 — the reference retries any failure
            last = e
            if backoff_s and i + 1 < attempts:
                time.sleep(backoff_s * (2**i))
    raise last  # type: ignore[misc]


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """CHECKPOINT workflow mode: cut lineage here (eager localCheckpoint)
    so a downstream failure replays from the checkpoint, not the sources —
    the reference's recovery-restart-point semantics. For cross-driver
    durability use plans.persist.PersistCache (PERSIST) instead."""
    return df.localCheckpoint(eager=eager)


def independent(df: DataFrame) -> DataFrame:
    """INDEPENDENT workflow mode: force single evaluation of a shared
    subplan (Spark persist; unpersists on memory pressure, recompute is
    correct just slower). The automatic form is plans.persist.auto_persist."""
    return df.persist()
