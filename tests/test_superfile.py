"""SuperFileCatalog: ordered membership, positional insert, remove, swap,
transactional commit/rollback, read-across-append."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpcc_platform_spark.sources import SuperFileCatalog, write_parquet


@pytest.fixture
def catalog(tmp_path):
    return SuperFileCatalog(str(tmp_path / "catalog"))


def test_create_add_ordering_and_positional_insert(catalog):
    catalog.create("s", ["a"])
    catalog.add_sub_file("s", "d")
    catalog.add_sub_file("s", "b", other="a")
    catalog.add_sub_file("s", "c", before=True, other="d")
    catalog.add_sub_file("s", "z", before=True)
    assert catalog.sub_files("s") == ["z", "a", "b", "c", "d"]
    with pytest.raises(ValueError):
        catalog.add_sub_file("s", "a")  # duplicate


def test_remove_one_and_all(catalog):
    catalog.create("s", ["a", "b", "c"])
    catalog.remove_sub_file("s", "b")
    assert catalog.sub_files("s") == ["a", "c"]
    catalog.remove_sub_file("s")
    assert catalog.sub_files("s") == []


def test_swap_exchanges_memberships(catalog):
    catalog.create("cur", ["gen1"])
    catalog.create("next", ["gen2a", "gen2b"])
    catalog.swap("cur", "next")
    assert catalog.sub_files("cur") == ["gen2a", "gen2b"]
    assert catalog.sub_files("next") == ["gen1"]


def test_missing_superfile_raises(catalog):
    with pytest.raises(KeyError):
        catalog.sub_files("nope")


def test_transaction_commits_atomically(catalog):
    catalog.create("s", ["a"])
    with catalog.transaction() as txn:
        txn.add_sub_file("s", "b")
        txn.add_sub_file("s", "c")
        # Staged but not yet published: a fresh catalog on the same root
        # still sees the old membership.
        other = SuperFileCatalog(catalog.root)
        assert other.sub_files("s") == ["a"]
    assert SuperFileCatalog(catalog.root).sub_files("s") == ["a", "b", "c"]


def test_transaction_rollback_on_exception(catalog):
    catalog.create("s", ["a"])
    with pytest.raises(RuntimeError, match="boom"):
        with catalog.transaction() as txn:
            txn.add_sub_file("s", "b")
            raise RuntimeError("boom")
    assert catalog.sub_files("s") == ["a"]


def test_read_across_append(spark, catalog, tmp_path):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    lo, hi = str(tmp_path / "lo"), str(tmp_path / "hi")
    write_parquet(df.where("id < 50"), lo)
    write_parquet(df.where("id >= 50"), hi)
    catalog.create("nums", [lo])
    assert catalog.read(spark, "nums").count() == 50
    catalog.add_sub_file("nums", hi)
    out = catalog.read(spark, "nums")
    assert out.count() == 100
    assert out.agg(F.sum("v")).head()[0] == 100 * 99
    catalog.remove_sub_file("nums")
    with pytest.raises(ValueError, match="empty"):
        catalog.read(spark, "nums")
