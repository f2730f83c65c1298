"""Transform/projection coverage queries (SURVEY.md §2.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import (
    choosen,
    choosesets,
    combine,
    enth,
    filter_group,
    iterate_running,
    normalize_counter,
    project,
    project_counter,
    rollup_adjacent,
    selectnth,
)
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "project_transform",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_uc,
           p_retailprice * 0.8 AS discounted,
           CAST(p_size * 2 AS INT) AS double_size
    FROM part WHERE p_size >= 25
    """,
    category="transform",
)
def project_transform(spark, sf_dir):
    """PROJECT w/ TRANSFORM (TAKproject :893) fused with FILTER
    (TAKfilterproject :1021) — Catalyst fuses both into the parquet scan."""
    (part,) = tables(spark, sf_dir, "part")
    return project(
        part.where(F.col("p_size") >= 25),
        "p_partkey",
        brand_uc=F.upper("p_brand"),
        discounted=F.col("p_retailprice") * 0.8,
        double_size=(F.col("p_size") * 2).cast("int"),
    )


@query(
    "project_counter",
    oracle="""
    SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey) AS INT) AS counter
    FROM orders WHERE o_orderstatus = 'F'
    """,
    category="transform",
)
def project_counter_q(spark, sf_dir):
    """PROJECT with COUNTER (TAKcountproject :917) — global row numbering."""
    (orders,) = tables(spark, sf_dir, "orders")
    return project_counter(
        orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
        ["o_orderkey"],
    )


@query(
    "filter_group_any",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
    WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
    """,
    category="transform",
)
def filter_group_any(spark, sf_dir):
    """Grouped FILTER (TAKfiltergroup :1014): keep whole groups (orders)
    where ANY line was returned."""
    (li,) = tables(spark, sf_dir, "lineitem")
    grouped = li.select("l_orderkey", "l_linenumber", "l_returnflag")
    return filter_group(grouped, ["l_orderkey"], F.col("l_returnflag") == "R", mode="any")


@query(
    "normalize_counter",
    oracle="""
    SELECT n_nationkey, n_name, CAST(g.generate_series AS INT) AS counter
    FROM nation CROSS JOIN generate_series(1, 3) g
    """,
    category="transform",
)
def normalize_counter_q(spark, sf_dir):
    """NORMALIZE(ds, 3, TRANSFORM w/ COUNTER) (TAKnormalize :907) — counter
    form, emits 3 rows per input row."""
    (nation,) = tables(spark, sf_dir, "nation")
    return normalize_counter(nation.select("n_nationkey", "n_name"), 3)


@query(
    "iterate_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           CAST(row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
    FROM orders
    """,
    category="transform",
)
def iterate_running_q(spark, sf_dir):
    """ITERATE (TAKiterate :895), linear case: running total per customer —
    the previous-row recurrence lowers to a window frame."""
    (orders,) = tables(spark, sf_dir, "orders")
    out = iterate_running(
        orders,
        order_by=["o_orderdate", "o_orderkey"],
        partition_by=["o_custkey"],
        running_spend=F.sum("o_totalprice"),
        seq=F.count(F.lit(1)),
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.round("running_spend", 4).alias("running_spend"),
        F.col("seq").cast("int").alias("seq"),
    )


@query(
    "rollup_group",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY user_id, event_type
    """,
    category="transform",
)
def rollup_group(spark, sf_dir):
    """ROLLUP (TAKrollup :894), associative merge: adjacent-merge on sorted
    input ≡ hash aggregate (no sort needed — see operators.transform)."""
    (events,) = tables(spark, sf_dir, "events")
    return rollup_adjacent(
        events,
        ["user_id", "event_type"],
        [F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")],
    )


@query(
    "choosen_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
    category="transform",
)
def choosen_topn(spark, sf_dir):
    """CHOOSEN(SORT(...)) → TOPN (TAKfirstn :898 / TAKtopn :936) — plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return choosen(
        orders.select("o_orderkey", "o_totalprice"),
        25,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )


@query(
    "choosesets",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM ranked WHERE rn <= 3
    """,
    category="transform",
)
def choosesets_q(spark, sf_dir):
    """CHOOSESETS(ds, priority => 3) (TAKchoosesets :918) — n best rows per
    category via one windowed shuffle."""
    (orders,) = tables(spark, sf_dir, "orders")
    return choosesets(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        3,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
    )


@query(
    "enth_sample",
    oracle="""
    WITH numbered AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, l_quantity FROM numbered WHERE rn % 10 = 1
    """,
    category="transform",
)
def enth_sample(spark, sf_dir):
    """ENTH/deterministic SAMPLE (TAKenth :913) — every 10th record in key
    order (ECL's ENTH is deterministic, unlike Bernoulli sampling)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return enth(
        li.select("l_orderkey", "l_linenumber", "l_quantity"),
        10,
        ["l_orderkey", "l_linenumber"],
    )


@query(
    "selectnth",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey OFFSET 41 LIMIT 1
    """,
    category="transform",
)
def selectnth_q(spark, sf_dir):
    """ds[42] (TAKselectn :912) — the 42nd row in o_orderkey order."""
    (orders,) = tables(spark, sf_dir, "orders")
    return selectnth(orders.select("o_orderkey", "o_totalprice"), 42, ["o_orderkey"])


@query(
    "combine_zip",
    oracle="""
    WITH l AS (
      SELECT r_regionkey, r_name, row_number() OVER (ORDER BY r_regionkey) AS pos
      FROM region
    ), r AS (
      SELECT n_nationkey, n_name, row_number() OVER (ORDER BY n_nationkey) AS pos
      FROM nation WHERE n_nationkey < 5
    )
    SELECT l.r_regionkey, l.r_name, r.n_nationkey, r.n_name
    FROM l JOIN r ON l.pos = r.pos
    """,
    category="transform",
)
def combine_zip(spark, sf_dir):
    """COMBINE (TAKcombine :981) — positional zip of two datasets through a
    transform; position made explicit via row_number (SURVEY §2.7)."""
    region, nation = tables(spark, sf_dir, "region", "nation")
    return combine(
        region.select("r_regionkey", "r_name"),
        nation.where(F.col("n_nationkey") < 5).select("n_nationkey", "n_name"),
        ["r_regionkey"],
        ["n_nationkey"],
    )
