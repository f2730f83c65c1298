"""Set-operation coverage queries (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import funnel, nonempty
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "funnel_union",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 350000
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'P'
    """,
    category="setops",
)
def funnel_union(spark, sf_dir):
    """'+' append (TAKfunnel :903) — UNION ALL; overlapping inputs keep
    duplicates, as the reference's concatenation does."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    return funnel(
        base.where(F.col("o_totalprice") > 350000),
        base.where(F.col("o_orderstatus") == "P"),
    )


@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    category="setops",
)
def intersect_keys(spark, sf_dir):
    """INTERSECT — absent as a reference primitive (expressed as semi-join
    there, SURVEY §2.7); free superset in Spark."""
    (orders,) = tables(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@query(
    "except_keys",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    category="setops",
)
def except_keys(spark, sf_dir):
    """EXCEPT — customers minus those with open orders (anti-join idiom in
    the reference)."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    open_keys = orders.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.select("c_custkey").subtract(open_keys)


@query(
    "nonempty_first",
    oracle="SELECT r_regionkey, r_name FROM region WHERE r_regionkey >= 0",
    category="setops",
)
def nonempty_first(spark, sf_dir):
    """NONEMPTY(d1, d2) (TAKnonempty :1008): first input with rows — the
    empty branch is probed with a limit-1 job and skipped."""
    (region,) = tables(spark, sf_dir, "region")
    base = region.select("r_regionkey", "r_name")
    empty = base.where(F.col("r_regionkey") < 0)
    return nonempty(empty, base.where(F.col("r_regionkey") >= 0))
