"""Planner-layer features Catalyst doesn't provide (SURVEY.md §4.3):
PERSIST content-hash materialization, dataset-level CSE auto-persist, and
the WHEN/NOTIFY/WAIT/CRON workflow event scheduler."""

from hpcc_platform_spark.plans.persist import PersistCache, auto_persist
from hpcc_platform_spark.plans.scheduler import Event, EventScheduler, cron_matches
from hpcc_platform_spark.plans.workflow_modes import checkpoint, independent, once, recovery

__all__ = ["Event", "EventScheduler", "PersistCache", "auto_persist", "checkpoint", "cron_matches", "independent", "once", "recovery"]
