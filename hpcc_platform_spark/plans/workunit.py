"""Workunit facade: the reference's unit-of-work, composed from this
repo's parts.

Reference: a workunit (common/workunit/workunit.hpp) owns a wuid
(``W20171014-123456``), the compiled query, named result slots, attached
messages, and workflow state (PERSIST et al). ESP/eclwatch read all of it
after the run. This facade gives the same lifecycle over Spark: make a
workunit, run ECL text (or register DataFrame results directly), read
results and messages afterwards — so a reference user's
"submit job, check workunit" loop maps one-to-one.
"""

from __future__ import annotations

import itertools
import time

from pyspark.sql import DataFrame, SparkSession

from hpcc_platform_spark.functions.system import WorkunitLog
from hpcc_platform_spark.sources.results import WorkunitResults

_seq = itertools.count(1)


def _make_wuid(now: float | None = None) -> str:
    """Reference wuid shape: W<yyyymmdd>-<seq> (workunit.hpp)."""
    day = time.strftime("%Y%m%d", time.gmtime(now if now is not None else time.time()))
    return f"W{day}-{next(_seq):06d}"


class Workunit:
    """One logical job: ECL (or DataFrame) programs + results + messages
    + optional PERSIST cache, addressable by wuid."""

    def __init__(
        self,
        spark: SparkSession,
        persist_dir: str | None = None,
        name: str = "",
    ):
        self.spark = spark
        self.wuid = _make_wuid()
        self.name = name or self.wuid
        self.results = WorkunitResults(spark, prefix=self.wuid.replace("-", "_"))
        self.log = WorkunitLog()
        self.persist_cache = None
        if persist_dir is not None:
            from hpcc_platform_spark.plans.persist import PersistCache

            self.persist_cache = PersistCache(spark, persist_dir)
        self.state = "created"

    def run_ecl(
        self,
        text: str,
        catalog: dict[str, DataFrame],
        result_name: str = "Result 1",
    ) -> DataFrame:
        """Compile-and-run ECL text against the catalog; the OUTPUT lands
        in a named result slot (the reference's default 'Result 1'
        naming), PERSIST annotations hit this workunit's cache, and
        failures are recorded as workunit errors before re-raising —
        eclwatch-style postmortem."""
        from hpcc_platform_spark.eclfront import run_ecl

        self.state = "running"
        try:
            out = run_ecl(text, catalog, persist_cache=self.persist_cache)
        except Exception as e:
            self.state = "failed"
            self.log.error(str(e))
            raise
        self.results.write(result_name, out)
        self.state = "completed"
        self.log.information(f"{result_name} written")
        return out

    def result(self, name: str = "Result 1"):
        return self.results.read(name)

    def messages(self) -> list[tuple[str, int, str]]:
        return list(self.log.messages)
