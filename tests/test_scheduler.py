"""EventScheduler (WHEN/NOTIFY/WAIT/CRON) unit coverage: dispatch order,
count limits, wildcard text filters, EVENTEXTRA, FIFO chaining, cron
matching edges."""

from __future__ import annotations

from datetime import datetime

import pytest

from hpcc_platform_spark.plans import Event, EventScheduler, cron_matches


def test_event_extra_parses_xml_payload():
    ev = Event("e", "<Event><name>Gavin</name><action>check</action></Event>")
    assert ev.extra("name") == "Gavin"
    assert ev.extra("action") == "check"
    assert ev.extra("missing") is None
    assert Event("e", None).extra("name") is None
    assert Event("e", "not-xml").extra("name") is None


def test_notify_chain_is_fifo_and_ordered(spark):
    sched = EventScheduler(spark)
    fired = []

    def on_a(ev):
        fired.append("a")
        sched.notify("b")  # queued behind the in-flight event
        fired.append("a-post-notify")

    sched.when("a", on_a, label="ha")
    sched.when("b", lambda ev: fired.append("b"), label="hb")
    sched.notify("a")
    # b must fire AFTER on_a completes (push-then-drain, not reentrant)
    assert fired == ["a", "a-post-notify", "b"]


def test_count_limit_and_unlimited(spark):
    sched = EventScheduler(spark)
    hits = {"capped": 0, "open": 0}
    sched.when("e", lambda ev: hits.__setitem__("capped", hits["capped"] + 1), count=2)
    sched.when("e", lambda ev: hits.__setitem__("open", hits["open"] + 1))
    for _ in range(5):
        sched.notify("e")
    assert hits == {"capped": 2, "open": 5}


def test_text_filter_wildcards(spark):
    sched = EventScheduler(spark)
    got = []
    sched.when("e", lambda ev: got.append(ev.text), text_filter="*region*")
    sched.notify("e", "<Event><table>region</table></Event>")
    sched.notify("e", "<Event><table>nation</table></Event>")
    assert got == ["<Event><table>region</table></Event>"]


def test_wait_fires_exactly_once(spark):
    sched = EventScheduler(spark)
    got = []
    sched.wait("done", lambda ev: got.append(ev.name))
    sched.notify("done")
    sched.notify("done")
    assert got == ["done"]


def test_registration_order_within_event(spark):
    sched = EventScheduler(spark)
    order = []
    sched.when("e", lambda ev: order.append(1))
    sched.when("e", lambda ev: order.append(2))
    sched.notify("e")
    assert order == [1, 2]


def test_cron_tick_fires_matching_specs_only(spark):
    sched = EventScheduler(spark)
    got = []
    sched.cron("* * * * *", lambda ev: got.append("always"))
    sched.cron("30 10 * * *", lambda ev: got.append("at-1030"))
    sched.cron("0 0 1 1 *", lambda ev: got.append("new-year"))
    sched.tick(datetime(2026, 1, 15, 10, 30))
    assert got == ["always", "at-1030"]


def test_log_df_schema_and_order(spark):
    sched = EventScheduler(spark)
    sched.when("e", lambda ev: 42, label="h")
    sched.notify("e", "payload")
    rows = sched.log_df().collect()
    assert [tuple(r) for r in rows] == [(1, "e", "h", "payload", "42")]


@pytest.mark.parametrize(
    ("spec", "when", "expect"),
    [
        ("* * * * *", datetime(2026, 1, 1, 0, 0), True),
        ("5 * * * *", datetime(2026, 1, 1, 0, 5), True),
        ("5 * * * *", datetime(2026, 1, 1, 0, 6), False),
        ("*/15 * * * *", datetime(2026, 1, 1, 0, 45), True),
        ("*/15 * * * *", datetime(2026, 1, 1, 0, 50), False),
        ("0-10 * * * *", datetime(2026, 1, 1, 0, 7), True),
        ("0-10/5 * * * *", datetime(2026, 1, 1, 0, 7), False),
        ("0-10/5 * * * *", datetime(2026, 1, 1, 0, 10), True),
        ("1,17,43 * * * *", datetime(2026, 1, 1, 0, 17), True),
        ("* * * * 0", datetime(2026, 1, 4, 0, 0), True),  # a Sunday
        ("* * * * 1", datetime(2026, 1, 4, 0, 0), False),
        ("0 12 29 2 *", datetime(2024, 2, 29, 12, 0), True),
    ],
)
def test_cron_matches(spec, when, expect):
    assert cron_matches(spec, when) is expect


def test_cron_rejects_bad_spec():
    with pytest.raises(ValueError):
        cron_matches("* * *", datetime(2026, 1, 1))


def test_once_builds_once(spark):
    from hpcc_platform_spark.plans import once

    calls = []

    def build():
        calls.append(1)
        return spark.range(5)

    a = once("test_once_key", build)
    b = once("test_once_key", build)
    assert a is b and len(calls) == 1


def test_recovery_retries_then_succeeds_and_raises():
    from hpcc_platform_spark.plans import recovery

    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert recovery(flaky, attempts=3) == "ok"
    with pytest.raises(RuntimeError, match="always"):
        recovery(lambda: (_ for _ in ()).throw(RuntimeError("always")), attempts=2)


def test_checkpoint_cuts_lineage(spark):
    from pyspark.sql import functions as F

    from hpcc_platform_spark.plans import checkpoint

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    cp = checkpoint(df)
    plan = cp._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan  # sources gone
    assert cp.count() == 100
