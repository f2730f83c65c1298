"""GROUPED-dataset convention coverage (SURVEY §1.1/§4.3): chained
per-group operator pipelines — the ECL GROUP → ops → DEGROUP idiom."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators.grouped import group
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "grouped_pipeline",
    oracle="""
    WITH kept AS (
      SELECT * FROM lineitem
      WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    ), ranked AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_quantity DESC, l_linenumber, l_extendedprice) AS rn
      FROM kept
    )
    SELECT l_orderkey, l_linenumber, l_quantity FROM ranked WHERE rn <= 2
    """,
    category="grouped",
)
def grouped_pipeline(spark, sf_dir):
    """GROUP(lineitem, orderkey) → FILTER(group has a returned line) →
    TOPN(2 per group by quantity) → DEGROUP: chained grouped ops, each
    lowering to the same keys-partitioned shuffle (reused exchange)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    out = (
        group(li, ["l_orderkey"])
        .filter_groups(F.col("l_returnflag") == "R", mode="any")
        .topn(2, [F.col("l_quantity").desc(), "l_linenumber", "l_extendedprice"])
        .ungroup()
    )
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "grouped_iterate_ordinal",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS ordinal,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_total
    FROM orders
    """,
    category="grouped",
)
def grouped_iterate_ordinal(spark, sf_dir):
    """GROUP(orders, custkey) → COUNTER + ITERATE running total → DEGROUP —
    per-group numbering and recurrence restart at group boundaries."""
    (orders,) = tables(spark, sf_dir, "orders")
    out = (
        group(orders, ["o_custkey"])
        .group_ordinal(["o_orderdate", "o_orderkey"], "ordinal")
        .iterate(["o_orderdate", "o_orderkey"], run_total=F.sum("o_totalprice"))
        .ungroup()
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("ordinal").cast("int").alias("ordinal"),
        F.round("run_total", 4).alias("run_total"),
    )


@query(
    "grouped_rollup_degroup",
    oracle="""
    WITH kept AS (
      SELECT * FROM events
      WHERE user_id IN (SELECT user_id FROM events WHERE event_type = 'purchase')
    )
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS total_value
    FROM kept GROUP BY user_id
    """,
    category="grouped",
)
def grouped_rollup_degroup(spark, sf_dir):
    """GROUP(events, user) → FILTER(groups of purchasers) → ROLLUP(aggregate
    per group, implicit degroup)."""
    (events,) = tables(spark, sf_dir, "events")
    return (
        group(events, ["user_id"])
        .filter_groups(F.col("event_type") == "purchase", mode="any")
        .rollup(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
