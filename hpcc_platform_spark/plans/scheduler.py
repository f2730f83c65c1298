"""Workflow event scheduler: WHEN / NOTIFY / EVENT / WAIT / CRON.

Re-expresses the reference's workflow event engine — the control plane that
fires scheduled workflow items when named events arrive:

- ``common/workunit/workflow.cpp`` (WFTypeWait :128, event state machine,
  itemsWaiting loop :1837-1866) — items sit in a wait state until a
  matching event unblocks them; each item has a remaining-fire count.
- ``ecl/schedulectrl/scheduleread.hpp:45-62`` — the schedule is iterated by
  (event name, event text) with wildcard matching.
- ``testing/regress/ecl/schedule1.ecl`` — the canonical chain: a CRON tick
  NOTIFYs an event whose handler NOTIFYs a result event consumed by a third
  handler, with payload fields read back via EVENTEXTRA.

Spark-first framing: like the reference's, this engine is *driver-side
control flow* — the data plane stays declarative (handlers build/execute
DataFrames); the scheduler only decides WHEN plans run. Determinism rules:
handlers fire in registration order, events process FIFO (a NOTIFY issued
inside a handler queues after the current event completes, exactly the
reference's push-then-drain loop), and CRON uses an injected clock so runs
are replayable — no wall-clock reads in the engine.
"""

from __future__ import annotations

import fnmatch
import xml.etree.ElementTree as ET
from collections import deque
from collections.abc import Callable
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Event:
    """A named event with optional XML payload (reference EVENT(name, text));
    ``extra('tag')`` is ECL's EVENTEXTRA('tag')."""

    name: str
    text: str | None = None

    def extra(self, tag: str) -> str | None:
        if not self.text:
            return None
        try:
            root = ET.fromstring(self.text)
        except ET.ParseError:
            return None
        el = root.find(tag)
        return el.text if el is not None else None


@dataclass
class _Subscription:
    seq: int
    event_name: str
    text_filter: str
    action: Callable[[Event], None]
    remaining: int | None  # None = unlimited (ECL default when no COUNT)
    label: str


def cron_matches(spec: str, when: datetime) -> bool:
    """5-field cron match (minute hour day-of-month month day-of-week),
    supporting ``*``, lists, ranges and ``/step`` — the subset the
    reference's CRON event text uses (schedule1.ecl '* * * * *')."""
    fields = spec.split()
    if len(fields) != 5:
        raise ValueError(f"cron spec needs 5 fields: {spec!r}")
    values = [when.minute, when.hour, when.day, when.month, when.isoweekday() % 7]
    bounds = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]
    for f, v, (lo, hi) in zip(fields, values, bounds):
        if not _cron_field_matches(f, v, lo, hi):
            return False
    return True


def _cron_field_matches(f: str, v: int, lo: int, hi: int) -> bool:
    for part in f.split(","):
        rng, _, step_s = part.partition("/")
        step = int(step_s) if step_s else 1
        if rng in ("*", ""):
            start, end = lo, hi
        elif "-" in rng:
            a, b = rng.split("-")
            start, end = int(a), int(b)
        else:
            start = end = int(rng)
            if not step_s:
                if v == start:
                    return True
                continue
            end = hi
        if start <= v <= end and (v - start) % step == 0:
            return True
    return False


class EventScheduler:
    """Deterministic WHEN/NOTIFY/WAIT/CRON engine with an auditable log.

    The firing log is exposed as a DataFrame (``log_df``) so scheduler
    behavior is oracle-checkable like any data operator: one row per
    handler firing, with the global firing sequence, the event consumed,
    and the handler's scalar result.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._subs: list[_Subscription] = []
        self._queue: deque[Event] = deque()
        self._draining = False
        self._fire_seq = 0
        self._log: list[tuple] = []  # (seq, event, label, extra, result)

    # -- registration -----------------------------------------------------
    def when(
        self,
        event_name: str,
        action: Callable[[Event], object],
        count: int | None = None,
        text_filter: str = "*",
        label: str | None = None,
    ) -> None:
        """``action : WHEN(event_name[, COUNT(n)])`` — run ``action`` on each
        matching event, at most ``count`` times (reference remaining-count
        per workflow item). ``text_filter`` wildcard-matches the event text
        (scheduleread.hpp iterator filter)."""
        self._subs.append(
            _Subscription(
                seq=len(self._subs),
                event_name=event_name,
                text_filter=text_filter,
                action=action,
                remaining=count,
                label=label or f"sub{len(self._subs)}",
            )
        )

    def wait(
        self,
        event_name: str,
        continuation: Callable[[Event], object],
        label: str | None = None,
    ) -> None:
        """WAIT(event): block this workflow branch until the event arrives,
        then run exactly once — a count-1 subscription in the reference's
        state machine (WFStateWait → unblocked, workflow.cpp:1862)."""
        self.when(event_name, continuation, count=1, label=label or "wait")

    def cron(
        self,
        spec: str,
        action: Callable[[Event], object],
        count: int | None = None,
        label: str | None = None,
    ) -> None:
        """``action : WHEN(CRON(spec)[, COUNT(n)])`` — the reference models
        CRON as events named 'CRON' whose text is the schedule; ticks are
        delivered via :meth:`tick`."""
        self.when("CRON", action, count=count, text_filter=spec, label=label or "cron")

    # -- event delivery ---------------------------------------------------
    def notify(self, name: str, text: str | None = None) -> None:
        """NOTIFY(EVENT(name, text)): enqueue, then drain FIFO. A notify
        issued from inside a handler queues behind the in-flight event —
        the reference's push-then-process loop, so firing order is total
        and deterministic."""
        self._queue.append(Event(name, text))
        if self._draining:
            return
        self._draining = True
        try:
            while self._queue:
                self._dispatch(self._queue.popleft())
        finally:
            self._draining = False

    def tick(self, when: datetime) -> None:
        """Deliver one CRON tick for the injected timestamp: every cron
        subscription whose spec matches fires (as event CRON with the
        timestamp as text)."""
        for sub in list(self._subs):
            if sub.event_name != "CRON" or sub.remaining == 0:
                continue
            if cron_matches(sub.text_filter, when):
                self._fire(sub, Event("CRON", when.isoformat()))

    def _dispatch(self, ev: Event) -> None:
        for sub in list(self._subs):
            if sub.event_name != ev.name or sub.remaining == 0:
                continue
            if not fnmatch.fnmatchcase(ev.text or "", sub.text_filter):
                continue
            self._fire(sub, ev)

    def _fire(self, sub: _Subscription, ev: Event) -> None:
        if sub.remaining is not None:
            sub.remaining -= 1
        self._fire_seq += 1
        seq = self._fire_seq
        result = sub.action(ev)
        self._log.append(
            (seq, ev.name, sub.label, ev.text, None if result is None else str(result))
        )

    # -- audit surface ----------------------------------------------------
    def log_df(self) -> DataFrame:
        """The firing log as a DataFrame: the oracle-checkable record of
        which handler fired in which global order with what result."""
        return self.spark.createDataFrame(
            self._log,
            "fire_seq int, event string, handler string, event_text string, result string",
        )
