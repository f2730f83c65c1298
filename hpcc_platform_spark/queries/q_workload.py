"""Composite workload queries — full multi-operator pipelines of the shape
reference users run end-to-end (TPC-H-like star joins + aggregation +
top-k, and event-funnel analytics). Each composes the §2 operator surface:
scan pushdown → broadcast/shuffle joins → partial/final aggregation →
TakeOrderedAndProject.

These are the bench-grade "would a reference user's real query run, and
run fast" proof — the regression corpus analogue of
testing/regress/ecl/'s larger query files.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from hpcc_platform_spark.queries.registry import query, tables


@query(
    "workload_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    category="workload",
)
def workload_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment filter → 3-table join → revenue agg → top
    10. Filters sit in the scans (pushdown); the join order lets AQE
    broadcast the filtered customer side; top-k is a per-partition heap."""
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders.where(F.col("o_orderdate") < cutoff),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(li.where(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "workload_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    category="workload",
)
def workload_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table star join with a local-supplier condition
    (supplier and customer share a nation). region/nation broadcast
    explicitly (tiny dims); the fact-side joins shuffle on their keys once
    each — the canonical 100 TB star-join plan."""
    region, nation, cust, orders, li, supp = tables(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return (
        broadcast(region.where(F.col("r_name") == "ASIA"))
        .join(broadcast(nation), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@query(
    "workload_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    category="workload",
)
def workload_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    returnflag filter pushed to the lineitem scan, nation broadcast."""
    cust, orders, li, nation = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li.where(F.col("l_returnflag") == "R"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "workload_event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) FILTER (WHERE event_type = 'view') AS views,
             COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN views > 0 THEN 1 ELSE 0 END) AS BIGINT) AS with_view,
           CAST(SUM(CASE WHEN views > 0 AND clicks > 0 THEN 1 ELSE 0 END) AS BIGINT) AS view_click,
           CAST(SUM(CASE WHEN views > 0 AND clicks > 0 AND purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS full_funnel
    FROM per_user
    """,
    category="workload",
)
def workload_event_funnel(spark, sf_dir):
    """Event-funnel analytics over the events table: per-user conditional
    counts (one shuffle on user_id) folded to funnel-stage totals — the
    conversion-funnel query every event pipeline runs."""
    (events,) = tables(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1)).alias("views"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("views") > 0).cast("long")).alias("with_view"),
        F.sum(((F.col("views") > 0) & (F.col("clicks") > 0)).cast("long")).alias("view_click"),
        F.sum(
            ((F.col("views") > 0) & (F.col("clicks") > 0) & (F.col("purchases") > 0)).cast("long")
        ).alias("full_funnel"),
    )


@query(
    "workload_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           ROUND(s.qty, 4) AS total_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (SELECT l_orderkey, SUM(l_quantity) AS qty FROM lineitem GROUP BY l_orderkey) s
      ON s.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 25
    """,
    category="workload",
)
def workload_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: large-quantity orders via a grouped HAVING
    subquery used as a semi-join filter, then customer enrichment and
    top-k — the aggregate-then-semi-join composition (one lineitem
    shuffle reused for both the filter and the quantity payload)."""
    cust, orders, li = tables(spark, sf_dir, "customer", "orders", "lineitem")
    qty = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    big = qty.where(F.col("qty") > 150).select("l_orderkey")
    return (
        orders.join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(qty, qty["l_orderkey"] == F.col("o_orderkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_totalprice",
            F.round("qty", 4).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "workload_nation_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           ROUND(SUM(CASE WHEN n.n_name = 'GERMANY'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END) /
                 SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY year(o.o_orderdate)
    """,
    category="workload",
)
def workload_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape (market share): one supplier nation's revenue share
    per order year — conditional aggregation ratio over a 4-table join.
    Plan: broadcast nation, shuffle joins on the fact keys, single
    partial/final agg on year; the CASE lives inside the sum so both
    numerator and denominator come from ONE pass."""
    li, orders, supp, nation = tables(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "GERMANY", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "workload_nation_pair_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY supp_nation, cust_nation, ship_year
    """,
    category="workload",
)
def workload_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between a nation pair): the
    two-sided dimension filter — supplier nation and customer nation in
    either orientation. Plan: nation/supplier/customer broadcast into the
    fact joins (small dims), ONE shuffle join lineitem->orders, partial
    agg before the final group. The OR-pair predicate stays on the joined
    dims, not the fact scan, so each broadcast prunes its side first."""
    li, su, na, orders, cust = tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "orders", "customer"
    )
    sn = na.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = na.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = su.join(broadcast(sn), su.s_nationkey == sn.s_nk).select(
        "s_suppkey", "supp_nation"
    )
    custn = cust.join(broadcast(cn), cust.c_nationkey == cn.c_nk).select(
        "c_custkey", "cust_nation"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(custn), orders.o_custkey == custn.c_custkey)
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("volume")
        )
    )


@query(
    "workload_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_custkey, ROUND(c.c_acctbal, 4) AS acctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    """,
    category="workload",
)
def workload_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (global promise check): customers above the global
    positive-balance average with no URGENT orders (the priority filter
    keeps the anti-join selective enough to return rows at every test SF —
    plain "no orders" is empty in this synthetic data, which would make
    the oracle check vacuous). Plan: the scalar average is a one-row
    aggregate CROSS-broadcast into the scan (never a driver collect),
    then a left-anti join — the NOT EXISTS idiom as hash anti-join.
    Verified gap between every acctbal and the average is >= 0.07 at all
    SFs, so the float comparison is stable cross-engine."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .select("c_custkey", F.round("c_acctbal", 4).alias("acctbal"))
    )


@query(
    "workload_product_type_profit",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(year(l.l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE p.p_type LIKE '%AND%'  -- STANDARD: ~1/6 of parts
    GROUP BY nation, ship_year
    """,
    category="workload",
)
def workload_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year, minus the
    partsupp cost leg the synthetic schema lacks): part filtered on a
    LIKE pattern BEFORE its broadcast into the fact join — the
    filter-then-broadcast order is the plan property that matters at
    scale (a 100 TB lineitem joins against only the matching parts)."""
    li, part, su, na = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    brass = part.where(F.col("p_type").like("%AND%")).select("p_partkey")
    sn = na.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    supp = su.join(broadcast(sn), su.s_nationkey == sn.s_nk).select(
        "s_suppkey", "nation"
    )
    return (
        li.join(broadcast(brass), li.l_partkey == brass.p_partkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("nation", F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("profit")
        )
    )


@query(
    "workload_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supply_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eur AS (
      SELECT ps.l_partkey, ps.supply_cost, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
    ), best AS (
      SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM eur
    )
    SELECT b.s_acctbal, b.s_name, b.n_name, p.p_partkey, p.p_name,
           b.supply_cost
    FROM best b JOIN part p ON p.p_partkey = b.l_partkey
    WHERE b.supply_cost = b.min_cost AND p.p_type = 'LARGE'
    ORDER BY b.s_acctbal DESC, b.n_name, b.s_name, p.p_partkey
    LIMIT 100
    """,
    category="workload",
)
def workload_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: the correlated min-subquery ("the supplier whose
    cost equals the minimum for that part, within the region") rewritten
    the way it should run at scale — NOT a per-part subquery, but one
    grouped aggregate to per-(part,supplier) cost, a window MIN over the
    part, and an equality filter. lineitem stands in for partsupp (the
    synthetic schema has no partsupp); min(l_extendedprice) is the supply
    cost. Region/nation broadcast into supplier BEFORE the window so the
    min is taken over the region's suppliers only — the semantics of Q2's
    correlated inner query. One shuffle for the group-by, one for the
    window partition; the double MIN/equality is exact (stored values,
    no arithmetic), so no rounding is needed."""
    from pyspark.sql import Window

    region, na, supp, part, li = tables(
        spark, sf_dir, "region", "nation", "supplier", "part", "lineitem"
    )
    eur_supp = supp.join(
        broadcast(
            na.join(
                broadcast(region.where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
        ),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supply_cost")
    )
    eur = ps.join(eur_supp, F.col("l_suppkey") == F.col("s_suppkey"))
    best = eur.withColumn(
        "min_cost", F.min("supply_cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("supply_cost") == F.col("min_cost"))
    wanted = part.where(F.col("p_type") == "LARGE")
    return (
        best.join(broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "workload_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    category="workload",
)
def workload_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: a revenue view consumed TWICE (once for its max,
    once to select the winners) — the dataset-CSE case. The view is
    auto_persist-ed so Spark computes the quarterly aggregate ONCE instead
    of re-running the lineitem scan per consumer (Catalyst does not CSE
    across a self-join's branches; SURVEY §4.1). The max side collapses to
    a one-row broadcast. Revenue is rounded to 4 on both engines before
    the max/equality so summation order can't flip the comparison."""
    from hpcc_platform_spark.plans.persist import auto_persist

    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    revenue = auto_persist(
        li.where((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "workload_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey AND n.n_name IN
         ('NATION_3', 'NATION_7')
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    category="workload",
)
def workload_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: stacked semi- and anti- self-joins on the fact
    table ("my line was returned, another supplier was on the order, no
    OTHER supplier's line was returned" — returnflag stands in for the
    receipt-after-commit lateness the synthetic schema lacks). The two
    EXISTS become leftsemi/leftanti joins on the SAME shuffle key
    (l_orderkey), so at scale all three lineitem legs co-partition into
    one exchange each rather than a correlated per-row probe; supplier
    and the nation filter broadcast."""
    li, orders, supp, na = tables(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    nat = na.where(F.col("n_name").isin("NATION_3", "NATION_7"))
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    waited = (
        l1.join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "leftanti",
        )
    )
    return (
        waited.join(
            orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("o_orderkey") == F.col("l1.l_orderkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .join(broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "workload_priority_late_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    category="workload",
)
def workload_priority_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS (an order with a late-shipping
    line — shipdate > orderdate+60d stands in for the missing
    commit/receipt dates) as a LEFTSEMI join whose condition mixes both
    sides' columns: Spark shuffles once on the order key and evaluates
    the residual inequality inside the join, never a per-row subquery."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "workload_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    category="workload",
)
def workload_customer_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: count-of-counts — LEFT OUTER join with a
    join-condition filter (so zero-order customers survive with count 0),
    per-customer count, then the distribution of those counts. Two key
    shuffles (custkey, then the tiny c_count domain); the second
    aggregation input is one row per customer, not per order."""
    cust, orders = tables(spark, sf_dir, "customer", "orders")
    o = orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        cust.join(o, F.col("o_custkey") == F.col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "workload_promo_revenue_ratio",
    oracle="""
    WITH sums AS (
      SELECT
        ROUND(SUM(CASE WHEN p.p_type = 'PROMO'
                       THEN l.l_extendedprice * (1 - l.l_discount)
                       ELSE 0 END), 4) AS promo_rev,
        ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS total_rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1996-02-01'
    )
    SELECT promo_rev, total_rev,
           ROUND(100.0 * promo_rev / total_rev, 4) AS promo_pct
    FROM sums
    """,
    category="workload",
)
def workload_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14 shape: conditional-sum ratio in ONE scan — the month of
    lineitem joins broadcast part, and promo vs total revenue come from
    the same aggregation (no second scan for the denominator). Sums are
    rounded to 4 before the division so cross-engine summation order
    can't flip the ratio's last decimal."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    win = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        win.join(broadcast(part.select("p_partkey", "p_type")),
                 F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 4)
            .alias("promo_rev"),
            F.round(F.sum(rev), 4).alias("total_rev"),
        )
    )
    return sums.select(
        "promo_rev",
        "total_rev",
        F.round(100.0 * F.col("promo_rev") / F.col("total_rev"), 4).alias("promo_pct"),
    )


@query(
    "workload_bracket_revenue",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 5 AND 15
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
    category="workload",
)
def workload_bracket_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive bracket predicates (OR of per-brand
    AND-brackets mixing both sides' columns). The join stays an equi-join
    on partkey with the disjunction as a residual filter; Catalyst pushes
    the per-side implied filters (brand/size on part, quantity bounds on
    lineitem) down into the scans."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    j = li.join(broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(5, 15)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(20, 40))
    )
    return j.where(bracket).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
        .alias("revenue")
    )


@query(
    "workload_heavy_shippers",
    oracle="""
    WITH heavy AS (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_partkey, l_suppkey
      HAVING SUM(l_quantity) > 40
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM heavy)
    ORDER BY s.s_suppkey
    """,
    category="workload",
)
def workload_heavy_shippers(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join chain — part filter semi-joins
    into a grouped lineitem HAVING threshold, whose supplier keys
    semi-join into supplier. Each stage shrinks before the next join;
    the part filter broadcasts, the grouped fact aggregates once on
    (partkey, suppkey)."""
    li, part, supp, na = tables(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    yr = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    heavy = (
        yr.join(broadcast(promo), F.col("p_partkey") == F.col("l_partkey"), "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, F.col("l_suppkey") == F.col("s_suppkey"), "leftsemi")
        .join(broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "workload_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.045 AND l_discount <= 0.075
      AND l_quantity < 24
    """,
    category="workload",
)
def workload_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-scan filtered scalar aggregate — the purest
    pushdown test. Every predicate (date range, discount band, quantity
    cap) must reach the parquet scan as PushedFilters; the plan is one
    WholeStageCodegen span ending in a partial/final agg with no shuffle
    of data rows (only the 1-row partials). Discount bounds sit at band
    midpoints (0.045/0.075) so float equality at the boundary can never
    differ between engines."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.045)
            & (F.col("l_discount") <= 0.075)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4)
            .alias("revenue")
        )
    )


@query(
    "workload_important_parts",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS part_cents
      FROM lineitem GROUP BY l_partkey
    ), total AS (SELECT SUM(part_cents) AS total_cents FROM per_part)
    SELECT p.l_partkey, ROUND(p.part_cents / 100.0, 2) AS part_value
    FROM per_part p, total t
    WHERE p.part_cents * 1600 > t.total_cents
    ORDER BY part_value DESC, p.l_partkey
    """,
    category="workload",
)
def workload_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-group value vs a HAVING
    threshold derived from the GLOBAL total — the global-scalar-broadcast
    pattern. One shuffle builds per-part values; the grand total is a
    1-row aggregate of that (already tiny) frame cross-joined back as a
    broadcast, so the threshold never forces a second pass over the fact
    table. Money is summed as exact integer cents so the share comparison
    is bit-identical across engines regardless of summation order
    (reference: global scalar hoisting, hqlttcpp.cpp
    ExplicitGlobalTransformer). per_part feeds BOTH the total and the
    filter, so it is auto_persist-ed — one lineitem scan, not two."""
    from hpcc_platform_spark.plans.persist import auto_persist

    (li,) = tables(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    per_part = auto_persist(
        li.groupBy("l_partkey").agg(F.sum(cents).alias("part_cents"))
    )
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(broadcast(total))
        .where(F.col("part_cents") * 1600 > F.col("total_cents"))
        .select(
            "l_partkey",
            F.round(F.col("part_cents") / 100.0, 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "workload_late_line_priority",
    oracle="""
    SELECT l.l_returnflag,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    category="workload",
)
def workload_late_line_priority(spark, sf_dir):
    """TPC-H Q12 shape: conditional two-way counts over a join with a
    cross-side residual (lateness compares l_shipdate to o_orderdate —
    this synthetic schema has no commit/receipt dates, so shipped >45
    days after ordering stands in). l_returnflag plays shipmode's role as
    the grouping dimension. One equi-join shuffle on orderkey; both
    counts come from the same aggregation via CASE, never two scans."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    win = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(
            win,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "workload_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
      CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#23' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1,4,9,14,19,23,36,49)
      AND l.l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    category="workload",
)
def workload_part_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape: distinct-count grouped by part attributes with a
    NOT-IN supplier exclusion. The exclusion list (negative-balance
    suppliers) is tiny, so NOT IN lowers to a broadcast LEFT ANTI join —
    never a shuffle; the part attribute filter broadcasts too (lineitem
    as the partsupp stand-in). COUNT(DISTINCT) expands to a two-phase
    distinct-then-count so the shuffle carries (brand,type,size,suppkey)
    pre-deduped partials."""
    li, part, supp = tables(spark, sf_dir, "lineitem", "part", "supplier")
    sel_parts = part.where(
        (F.col("p_brand") != "Brand#23")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(broadcast(bad_supp), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(broadcast(sel_parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "workload_small_order_revenue",
    oracle="""
    WITH bparts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'),
    qty AS (
      SELECT l_partkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM bparts)
      GROUP BY l_partkey
    )
    SELECT ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) / 700.0, 4)
             AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS small_lines
    FROM lineitem l JOIN qty q ON q.l_partkey = l.l_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * q.cnt < q.sum_qty
    """,
    category="workload",
)
def workload_small_order_revenue(spark, sf_dir):
    """TPC-H Q17 shape: the correlated per-part scalar (lines below 20%
    of their part's average quantity). The correlated subquery rewrites
    to ONE grouped aggregate over the brand-restricted fact joined back
    to the same restricted fact — the semi-join on the broadcast brand
    part list shrinks both sides before the self-join, so the only wide
    shuffle is on l_partkey. The 20%-of-average test is done in exact
    integer arithmetic (5*qty*cnt < sum) so no float average can flip a
    boundary row between engines."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    bparts = part.where(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_b = li.join(broadcast(bparts), F.col("p_partkey") == F.col("l_partkey"), "leftsemi")
    qty = li_b.groupBy(F.col("l_partkey").alias("q_partkey")).agg(
        F.sum("l_quantity").cast("long").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    small = li_b.join(qty, F.col("q_partkey") == F.col("l_partkey")).where(
        5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_qty")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return small.agg(
        F.round(F.sum(cents) / 700.0, 4).alias("avg_yearly"),
        F.count(F.lit(1)).alias("small_lines"),
    )
