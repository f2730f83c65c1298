"""Dedup coverage queries (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import dedup_all, dedup_best, dedup_keyed, hash_dedup
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "dedup_all",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    category="dedup",
)
def dedup_all_q(spark, sf_dir):
    """DEDUP(ds, ALL) whole-row (TAKdedup :890, compareAll variant, Roxie
    CRoxieServerDedupAllActivity) ≡ DISTINCT."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return dedup_all(li.select("l_returnflag", "l_linestatus"))


@query(
    "hash_dedup",
    oracle="SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    category="dedup",
)
def hash_dedup_q(spark, sf_dir):
    """Hash dedup (TAKhashdedup :906): distribute-by-key + per-node hash
    table ≡ Spark dropDuplicates (shuffle on key, AQE-coalesced)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return hash_dedup(orders.select("o_custkey", "o_orderstatus"), ["o_custkey", "o_orderstatus"])


@query(
    "dedup_keep_first",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_orderdate FROM ranked WHERE rn = 1
    """,
    category="dedup",
)
def dedup_keep_first(spark, sf_dir):
    """DEDUP(SORT(ds, key, date), key) keep-left (throllupslave.cpp:36-96):
    first order per customer, deterministic survivor."""
    (orders,) = tables(spark, sf_dir, "orders")
    return dedup_keyed(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
    )


@query(
    "dedup_best",
    oracle="""
    WITH ranked AS (
      SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
             row_number() OVER (
               PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rn
      FROM supplier
    )
    SELECT s_nationkey, s_suppkey, s_name, s_acctbal FROM ranked WHERE rn = 1
    """,
    category="dedup",
)
def dedup_best_q(spark, sf_dir):
    """DEDUP BEST (keepBest/compareBest, throllupslave.cpp:285-303): richest
    supplier per nation."""
    (supp,) = tables(spark, sf_dir, "supplier")
    return dedup_best(
        supp.select("s_nationkey", "s_suppkey", "s_name", "s_acctbal"),
        ["s_nationkey"],
        [F.col("s_acctbal").desc(), F.col("s_suppkey")],
    )
