"""Planner-layer features Catalyst doesn't provide (SURVEY.md §4.3):
PERSIST content-hash materialization, dataset-level CSE auto-persist, and
the WHEN/NOTIFY/WAIT/CRON workflow event scheduler."""

from hpcc_platform_spark.plans.persist import PersistCache, auto_persist
from hpcc_platform_spark.plans.scheduler import Event, EventScheduler, cron_matches
from hpcc_platform_spark.plans.workflow_modes import checkpoint, independent, once, recovery
from hpcc_platform_spark.plans.kvstore import KVStore
from hpcc_platform_spark.plans.workunit import Workunit

__all__ = ["Event", "EventScheduler", "KVStore", "PersistCache", "Workunit", "auto_persist", "checkpoint", "cron_matches", "independent", "once", "recovery"]
