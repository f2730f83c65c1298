"""Analytic extras: pivot, exact percentiles/median, window navigation,
sorted-merge dedup, subsort — rounding out SURVEY §2.4/§2.6/§2.14."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hpcc_platform_spark.operators import merge_sorted
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'O'), 4) AS O,
           ROUND(SUM(l_quantity) FILTER (WHERE l_linestatus = 'F'), 4) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    category="analytic",
)
def pivot_status(spark, sf_dir):
    """PIVOT — ECL expresses this as per-category TABLEs unioned; Spark's
    pivot is the direct superset (explicit value list keeps it one pass,
    no value-discovery job)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return out


@query(
    "percentiles_exact",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 4) AS q25,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.75), 4) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
    category="analytic",
)
def percentiles_exact(spark, sf_dir):
    """Exact interpolated percentiles (QUANTILE family, TAKquantile :1082):
    Spark ``percentile`` ≡ DuckDB ``quantile_cont`` (linear interpolation).
    The approximate 100 TB path (percentile_approx/t-digest) is exercised
    Spark-side in tests — sketches don't cross-match engines."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("q75"),
    )


@query(
    "window_navigation",
    oracle="""
    SELECT s_nationkey, s_suppkey,
           ROUND(first_value(s_acctbal) OVER w, 4) AS richest_bal,
           ROUND(last_value(s_acctbal) OVER (
             PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS poorest_bal,
           ROUND(lead(s_acctbal) OVER w, 4) AS next_bal,
           CAST(ntile(3) OVER w AS INT) AS bal_tercile
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
    category="analytic",
)
def window_navigation(spark, sf_dir):
    """Window navigation (first/last/lead/ntile) — the remaining §2.14
    idiom family (DEDUP BEST ≈ first_value; ITERATE lookahead ≈ lead)."""
    (supp,) = tables(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), "s_suppkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return supp.select(
        "s_nationkey",
        "s_suppkey",
        F.round(F.first("s_acctbal").over(w), 4).alias("richest_bal"),
        F.round(F.last("s_acctbal").over(w_full), 4).alias("poorest_bal"),
        F.round(F.lead("s_acctbal").over(w), 4).alias("next_bal"),
        F.ntile(3).over(w).cast("int").alias("bal_tercile"),
    )


@query(
    "merge_dedup",
    oracle="""
    SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 250000
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'P'
    )
    """,
    category="analytic",
)
def merge_dedup(spark, sf_dir):
    """MERGE(..., DEDUP) (TAKmerge :937 with dedup flag): k-way merge of
    sorted inputs dropping duplicates across overlapping inputs."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    hi = base.where(F.col("o_totalprice") > 250000).orderBy("o_orderkey")
    pend = base.where(F.col("o_orderstatus") == "P").orderBy("o_orderkey")
    return merge_sorted([hi, pend], "o_orderkey", dedup=True)


@query(
    "grouped_topn_arrays",
    oracle="""
    SELECT o_orderpriority,
           list_aggr(list_sort(list(o_orderkey) FILTER (WHERE rn <= 5)), 'string_agg', ',') AS top_keys
    FROM (
      SELECT o_orderpriority, CAST(o_orderkey AS VARCHAR) AS o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) GROUP BY o_orderpriority
    """,
    category="analytic",
)
def grouped_topn_arrays(spark, sf_dir):
    """Grouped top-n folded into a set column — DEDUP BEST + DENORMALIZE
    composed (per-group ranking then collect), serialized sorted for
    deterministic comparison."""
    (orders,) = tables(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))), ","
            ).alias("top_keys")
        )
    )
