"""Std.System.{Job, Thorlib, Log} and Std.System.Store analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpcc_platform_spark.functions import system as sysmod
from hpcc_platform_spark.plans.kvstore import KVStore


def test_job_introspection(spark):
    assert sysmod.wuid(spark)  # non-empty stable id
    assert sysmod.wuid(spark) == sysmod.wuid(spark)
    assert sysmod.nodes(spark) >= 1
    assert sysmod.platform() == "spark"
    assert sysmod.job_name(spark)
    assert isinstance(sysmod.get_elapsed_ms(spark), int)
    assert sysmod.get_elapsed_ms(spark) > 0
    a, b = (
        sysmod.generate_globally_unique_id(),
        sysmod.generate_globally_unique_id(),
    )
    assert a != b and len(a) == 32


def test_node_is_per_row_partition_id(spark):
    df = spark.range(0, 100, 1, 4).withColumn("n", sysmod.node())
    rows = df.collect()
    assert {r.n for r in rows} == {0, 1, 2, 3}
    # rows in the same partition share a node id (groupBy is consistent)
    per = df.groupBy("n").count().collect()
    assert sum(r["count"] for r in per) == 100


def test_getenv_default():
    assert sysmod.getenv("__hpcc_spark_definitely_unset__", "fallback") == "fallback"


def test_workunit_log_accumulates():
    log = sysmod.WorkunitLog()
    log.information("started", 1)
    log.warning("skewed key", 7)
    log.error("bad row", 42)
    assert [m[0] for m in log.messages] == ["information", "warning", "error"]
    assert log.messages[2] == ("error", 42, "bad row")
    sysmod.dbglog("fire and forget")  # must not raise


def test_kvstore_roundtrip(tmp_path):
    kv = KVStore(str(tmp_path / "stores"))
    assert kv.create_store("cursors") is True
    assert kv.create_store("cursors") is False  # already exists
    assert kv.list_stores() == ["cursors"]
    kv.set_value("cursors", "daily_ingest", "2026-08-13")
    kv.set_value("cursors", "batch", "41")
    assert kv.get_value("cursors", "daily_ingest") == "2026-08-13"
    assert kv.get_value("cursors", "missing", "dflt") == "dflt"
    assert kv.get_all_keys("cursors") == ["batch", "daily_ingest"]
    assert kv.delete_key("cursors", "batch") is True
    assert kv.delete_key("cursors", "batch") is False
    assert kv.get_all_keys("cursors") == ["daily_ingest"]


def test_kvstore_counter_and_validation(tmp_path):
    kv = KVStore(str(tmp_path / "stores"))
    assert kv.fetch_and_increment("seq", "run_no", start=100) == 100
    assert kv.fetch_and_increment("seq", "run_no") == 101
    assert kv.get_value("seq", "run_no") == "102"
    with pytest.raises(ValueError, match="bad store name"):
        kv.get_value("../escape", "k")


def test_kvstore_survives_reopen(tmp_path):
    base = str(tmp_path / "stores")
    KVStore(base).set_value("flags", "enabled", "true")
    assert KVStore(base).get_value("flags", "enabled") == "true"


def test_kvstore_drives_incremental_pipeline(spark, sf_dir, tmp_path):
    """The reference store's canonical use: a high-water-mark cursor
    gating incremental reads across workunits."""
    kv = KVStore(str(tmp_path / "stores"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hwm = int(kv.get_value("cursors", "orders_hwm", "0"))
    batch1 = orders.where(F.col("o_orderkey") > hwm)
    top = batch1.agg(F.max("o_orderkey")).collect()[0][0]
    kv.set_value("cursors", "orders_hwm", str(top))
    # second "workunit": nothing new
    hwm2 = int(kv.get_value("cursors", "orders_hwm"))
    assert hwm2 == top
    assert orders.where(F.col("o_orderkey") > hwm2).count() == 0


def test_workunit_lifecycle_daily_job(spark, sf_dir, tmp_path):
    """The reference user's daily loop, end to end: submit ECL, PERSIST a
    segment, check the workunit's results and messages, advance a cursor
    for the next run."""
    from pyspark.sql import functions as F

    from hpcc_platform_spark.plans import KVStore, Workunit

    kv = KVStore(str(tmp_path / "stores"))
    cat = {
        "orders": spark.read.parquet(f"{sf_dir}/orders.parquet"),
    }

    wu = Workunit(spark, persist_dir=str(tmp_path / "persist"), name="daily")
    assert wu.wuid.startswith("W2") and "-" in wu.wuid
    hwm = kv.get_value("cursors", "daily_hwm", "0")
    ecl = f"""
    seg := TABLE(orders(o_totalprice > 150000, o_orderkey > {hwm}),
        {{ o_orderpriority, n := COUNT(GROUP) }}, o_orderpriority)
        : PERSIST('daily_seg');
    OUTPUT(SORT(seg, o_orderpriority));
    """
    out = wu.run_ecl(ecl, cat)
    assert wu.state == "completed"
    assert wu.result().collect() == out.collect()
    assert ("information", 0, "Result 1 written") in wu.messages()
    import os

    assert len(os.listdir(tmp_path / "persist")) == 1  # PERSIST hit disk
    top = cat["orders"].agg(F.max("o_orderkey")).collect()[0][0]
    kv.set_value("cursors", "daily_hwm", str(top))

    # failed submission is recorded, then raises
    wu2 = Workunit(spark)
    assert wu2.wuid != wu.wuid  # distinct sequence
    import pytest

    from hpcc_platform_spark.eclfront import EclSyntaxError

    with pytest.raises(EclSyntaxError):
        wu2.run_ecl("OUTPUT(nonsense);", cat)
    assert wu2.state == "failed"
    assert wu2.messages() and wu2.messages()[0][0] == "error"
