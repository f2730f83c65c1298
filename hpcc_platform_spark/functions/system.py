"""Std.System.{Job, Thorlib, Log, Debug} analogue: job/cluster
introspection and workunit-scoped logging.

Reference: ecllibrary/std/system/Job.ecl:28-78 (wuid/name/user/target/
platform/os/nodes), Thorlib.ecl:30-80 (node/nodes/cluster/group/getenv),
Log.ecl:17-121 (dbglog, addWorkunitInformation/Warning/Error,
generateGloballyUniqueId, getElapsedMs). The reference resolves these
against the workunit + Dali; here they resolve against the SparkSession —
same program-visible contract (a job id, a cluster size, a per-row worker
id, an in-workunit message log).
"""

from __future__ import annotations

import logging
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

_LOG = logging.getLogger("hpcc_platform_spark.workunit")


def wuid(spark: SparkSession) -> str:
    """Job.wuid() (Job.ecl:34 WORKUNIT) — the unit-of-work id; Spark's
    application id plays the same role (stable for the session, names the
    run in the history server)."""
    return spark.sparkContext.applicationId


def job_name(spark: SparkSession) -> str:
    """Job.name() (Job.ecl:46)."""
    return spark.sparkContext.appName


def job_user(spark: SparkSession) -> str:
    """Job.user() (Job.ecl:52)."""
    return spark.sparkContext.sparkUser()


def target(spark: SparkSession) -> str:
    """Job.target() / Thorlib.cluster() (Job.ecl:58) — the cluster the
    job runs on; Spark's master URL."""
    return spark.sparkContext.master


def platform() -> str:
    """Job.platform() (Job.ecl:64) — 'thor'/'roxie'/'hthor' there;
    'spark' here."""
    return "spark"


def nodes(spark: SparkSession) -> int:
    """Job.nodes() / Thorlib.nodes() (Job.ecl:28 CLUSTERSIZE) — the
    degree of parallelism work is spread across."""
    return spark.sparkContext.defaultParallelism


def node() -> Column:
    """Thorlib.node() (Thorlib.ecl:30) — which worker is processing THIS
    row; a per-row column, exactly as ECL evaluates it inside a
    TRANSFORM. Maps to the partition id (the Spark analogue of a Thor
    slave number)."""
    return F.spark_partition_id()


def getenv(name: str, default: str = "") -> str:
    """Thorlib.getenv (Thorlib.ecl:80)."""
    return os.environ.get(name, default)


def generate_globally_unique_id() -> str:
    """Log.generateGloballyUniqueId (Log.ecl:82)."""
    return uuid.uuid4().hex


def get_elapsed_ms(spark: SparkSession) -> int:
    """Log.getElapsedMs (Log.ecl:90) — ms since the job started."""
    return int(time.time() * 1000) - spark.sparkContext.startTime


@dataclass
class WorkunitLog:
    """addWorkunitInformation/Warning/Error (Log.ecl:28-50): messages
    attached to the unit of work, queryable afterwards — the reference
    surfaces them in the workunit; here they accumulate per-instance
    (driver-side; executors log locally via dbglog)."""

    messages: list[tuple[str, int, str]] = field(default_factory=list)

    def information(self, text: str, code: int = 0) -> None:
        self.messages.append(("information", code, text))
        _LOG.info("[%d] %s", code, text)

    def warning(self, text: str, code: int = 0) -> None:
        self.messages.append(("warning", code, text))
        _LOG.warning("[%d] %s", code, text)

    def error(self, text: str, code: int = 0) -> None:
        self.messages.append(("error", code, text))
        _LOG.error("[%d] %s", code, text)


def dbglog(text: str) -> None:
    """Log.dbglog (Log.ecl:17) — fire-and-forget debug line."""
    _LOG.debug("%s", text)
