"""Planner-layer features Catalyst doesn't provide (SURVEY.md §4.3):
PERSIST content-hash materialization and dataset-level CSE auto-persist."""

from hpcc_platform_spark.plans.persist import PersistCache, auto_persist

__all__ = ["PersistCache", "auto_persist"]
