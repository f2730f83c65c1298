"""Published queries (SURVEY.md §3.3): the Roxie pattern — compile once,
serve parameterized requests against cached data.

Reference: roxie/ccd/ccdquery.cpp (activity factories built once per
query), devdoc/roxie.md:16-37; STORED parameters are workflow inputs
(common/workunit/workunit.hpp WFModeStored context).

Spark-first form: a PublishedQuery holds (a) input DataFrames persisted in
memory — the analogue of Roxie's always-loaded index/data files — and (b) a
builder function from parameters to a DataFrame plan. Each call re-plans
against the cached inputs (planning is milliseconds; the data never
re-reads). This is the low-latency serving shape: at scale the cached
inputs are bucketed/sorted tables, so per-request joins are
partition-pruned probes, not scans.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


class PublishedQuery:
    """Compile-once / call-many parameterized query over cached inputs."""

    def __init__(
        self,
        inputs: Mapping[str, DataFrame],
        builder: Callable[..., DataFrame],
        cache: bool = True,
    ) -> None:
        self._inputs = {
            name: (df.persist(StorageLevel.MEMORY_AND_DISK) if cache else df)
            for name, df in inputs.items()
        }
        self._builder = builder

    def __call__(self, **params) -> DataFrame:
        """Serve one request: build the plan from STORED-style parameters
        against the cached inputs."""
        return self._builder(self._inputs, **params)

    def unpublish(self) -> None:
        for df in self._inputs.values():
            df.unpersist()
