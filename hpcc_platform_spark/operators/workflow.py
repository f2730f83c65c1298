"""Workflow triggers (SURVEY.md §2.11): WHEN/SUCCESS/FAILURE around dataset
actions; SEQUENTIAL/PARALLEL ordering is the driver's own control flow.

Reference: TAKwhen_dataset :1027, TAKifaction :955,
thorlcr/activities/when/ (230 LoC); workflow engine
common/workunit/workflow.cpp.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def when_action(
    df: DataFrame,
    success: Callable[[], None] | None = None,
    failure: Callable[[Exception], None] | None = None,
) -> DataFrame:
    """WHEN(ds, action): materialize ``df`` (eager localCheckpoint — the
    side-effect trigger point) and fire the SUCCESS/FAILURE callback. The
    returned DataFrame reuses the checkpointed result, so downstream
    consumers never recompute the triggering branch."""
    try:
        out = df.localCheckpoint(eager=True)
    except Exception as e:
        if failure is not None:
            failure(e)
        raise
    if success is not None:
        success()
    return out
