"""Join-family coverage queries (SURVEY.md §2.3).

The reference's physical variety (global sort-merge thjoinslave.cpp, hash
distributed thhashdistribslave.cpp, broadcast thlookupjoinslave.cpp, smart
failover) is Catalyst's job; these queries pin the *semantics*: join forms
(inner/outer/only/semi), LOOKUP broadcast hint, ALL theta, SELF, ATMOST,
LIMIT-skip, and sliding/range matches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import (
    all_join,
    join,
    join_atmost,
    join_limit,
    keyed_join,
    lookup_join,
    range_join,
    self_join,
)
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    """,
    category="join",
)
def join_inner(spark, sf_dir):
    """JOIN inner (TAKjoin :1042) — Catalyst picks SMJ/SHJ/broadcast."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    out = join(
        orders.where(F.col("o_orderstatus") == "F"),
        cust,
        orders.o_custkey == cust.c_custkey,
    )
    return out.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 300000
    """,
    category="join",
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER JOIN (JFleftouter, eclhelper.hpp:1714) with a non-key
    residual — unmatched customers survive with nulls."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    out = join(
        cust,
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 300000),
        "left outer",
    )
    return out.select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_full_outer",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT c.c_custkey, c.c_name, s.o_custkey, s.n_orders
    FROM customer c FULL OUTER JOIN spend s ON c.c_custkey = s.o_custkey
    """,
    category="join",
)
def join_full_outer(spark, sf_dir):
    """FULL OUTER JOIN (JFleftouter|JFrightouter)."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    spend = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    out = join(cust, spend, cust.c_custkey == spend.o_custkey, "full outer")
    return out.select("c_custkey", "c_name", "o_custkey", "n_orders")


@query(
    "join_left_only",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT'
                      AND o_totalprice > 150000)
    """,
    category="join",
)
def join_left_only(spark, sf_dir):
    """LEFT ONLY (JFleftouter|JFexclude, eclhelper.hpp:1717) ≡ anti-join.
    The RHS is restricted (urgent big-ticket orders) so the result is
    non-vacuous at every SF — every customer has SOME order in this
    synthetic data, and an anti-join that returns 0 rows verifies
    nothing."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    big_urgent = orders.where(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 150000)
    )
    return join(
        cust, big_urgent, cust.c_custkey == big_urgent.o_custkey, "left only"
    ).select("c_custkey", "c_name")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
    category="join",
)
def join_semi(spark, sf_dir):
    """KEEP(1)-style inner ≡ left semi (existence check, no duplication)."""
    orders, cust = tables(spark, sf_dir, "orders", "customer")
    open_orders = orders.where(F.col("o_orderstatus") == "O")
    return join(
        cust, open_orders, cust.c_custkey == open_orders.o_custkey, "left semi"
    ).select("c_custkey", "c_name")


@query(
    "lookup_join",
    oracle="""
    SELECT c.c_custkey, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    category="join",
)
def lookup_join_q(spark, sf_dir):
    """LOOKUP join (TAKlookupjoin :1044): small dims broadcast — the
    reference's CBroadcaster tree ≡ Spark BroadcastHashJoin. At 100 TB the
    fact side never shuffles for these dims."""
    cust, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    step1 = lookup_join(cust, nation, cust.c_nationkey == nation.n_nationkey)
    step2 = lookup_join(step1, region, step1.n_regionkey == region.r_regionkey)
    return step2.select("c_custkey", "n_name", "r_name")


@query(
    "all_join_theta",
    oracle="""
    SELECT r.r_regionkey, r.r_name, n.n_nationkey, n.n_name
    FROM region r JOIN nation n ON r.r_regionkey < n.n_regionkey
    """,
    category="join",
)
def all_join_theta(spark, sf_dir):
    """JOIN ALL (TAKalljoin :1047) — no equality, arbitrary theta condition,
    RHS broadcast (BroadcastNestedLoopJoin)."""
    region, nation = tables(spark, sf_dir, "region", "nation")
    r, n = region.alias("r"), nation.alias("n")
    out = all_join(r, n, F.col("r.r_regionkey") < F.col("n.n_regionkey"))
    return out.select("r_regionkey", "r_name", "n_nationkey", "n_name")


@query(
    "self_join",
    oracle="""
    SELECT a.s_nationkey, a.s_suppkey AS supp_a, b.s_suppkey AS supp_b
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
    category="join",
)
def self_join_q(spark, sf_dir):
    """SELF JOIN (TAKselfjoin :1045) — supplier pairs within a nation;
    single input, one shuffle reused for both sides."""
    (supp,) = tables(spark, sf_dir, "supplier")
    out = self_join(
        supp,
        ["s_nationkey"],
        cond=F.col("l.s_suppkey") < F.col("r.s_suppkey"),
    )
    return out.select(
        F.col("l.s_nationkey").alias("s_nationkey"),
        F.col("l.s_suppkey").alias("supp_a"),
        F.col("r.s_suppkey").alias("supp_b"),
    )


@query(
    "keyed_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, p.p_retailprice
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size = 50
    """,
    category="join",
)
def keyed_join_q(spark, sf_dir):
    """KEYED JOIN (TAKkeyedjoin :1046): per-row B+tree probe in the
    reference → equi-join against the index-as-table in Spark; the KEYED
    filter (p_size) prunes via pushdown before the join."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    idx = part.where(F.col("p_size") == 50)
    out = keyed_join(li, idx, li.l_partkey == idx.p_partkey)
    return out.select("l_orderkey", "l_linenumber", "p_name", "p_retailprice")


@query(
    "join_atmost",
    oracle="""
    WITH counted AS (
      SELECT l_orderkey, l_linenumber, l_quantity,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS kc
      FROM lineitem
    ), kept AS (
      SELECT l_orderkey, l_linenumber, l_quantity FROM counted WHERE kc <= 3
    )
    SELECT o.o_orderkey, k.l_linenumber, k.l_quantity
    FROM orders o LEFT JOIN kept k ON o.o_orderkey = k.l_orderkey
    """,
    category="join",
)
def join_atmost_q(spark, sf_dir):
    """JOIN ATMOST(3) (eclhelper.hpp:1726): orders whose match group exceeds
    3 lineitems are treated as unmatched (nulls under LEFT OUTER)."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    out = join_atmost(
        orders.select("o_orderkey"),
        li.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "l_quantity"
        ),
        ["o_orderkey"],
        atmost=3,
        keep_unmatched=True,
    )
    return out.select("o_orderkey", "l_linenumber", "l_quantity")


@query(
    "join_limit_skip",
    oracle="""
    WITH counted AS (
      SELECT l_orderkey, l_linenumber,
             COUNT(*) OVER (PARTITION BY l_orderkey) AS kc
      FROM lineitem
    ), kept AS (
      SELECT l_orderkey, l_linenumber FROM counted WHERE kc <= 2
    )
    SELECT o.o_orderkey, o.o_totalprice, k.l_linenumber
    FROM orders o JOIN kept k ON o.o_orderkey = k.l_orderkey
    """,
    category="join",
)
def join_limit_skip(spark, sf_dir):
    """JOIN LIMIT(2, SKIP) (eclhelper.hpp:1735): LHS rows with over-limit
    match groups are dropped entirely."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    out = join_limit(
        orders.select("o_orderkey", "o_totalprice"),
        li.select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber"),
        ["o_orderkey"],
        limit=2,
        on_exceed="skip",
    )
    return out.select("o_orderkey", "o_totalprice", "l_linenumber")


@query(
    "range_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice BETWEEN p.p_retailprice * 0.5 AND p.p_retailprice * 20.0
    WHERE l.l_quantity >= 49
    """,
    category="join",
)
def range_join_q(spark, sf_dir):
    """Sliding/range match (JFslidingmatch :1729): equality prefix + bounded
    inequality — shuffles only on the equality prefix, residual evaluated
    inside the join."""
    li, part = tables(spark, sf_dir, "lineitem", "part")
    out = range_join(
        li.where(F.col("l_quantity") >= 49),
        part,
        [],
        cond=(F.col("l.l_partkey") == F.col("r.p_partkey"))
        & F.col("l.l_extendedprice").between(
            F.col("r.p_retailprice") * 0.5, F.col("r.p_retailprice") * 20.0
        ),
    )
    return out.select("l.l_orderkey", "l.l_linenumber", "r.p_partkey").toDF(
        "l_orderkey", "l_linenumber", "p_partkey"
    )


@query(
    "bucketed_join",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
    category="join",
)
def bucketed_join(spark, sf_dir):
    """Co-located join via bucketing (the Spark analogue of the reference's
    KEYED DISTRIBUTE + local join, thhashdistribslave.cpp): both sides
    written CLUSTERED BY (orderkey) INTO 8 BUCKETS, so the join needs no
    Exchange — at 100 TB this is the difference between a full shuffle of
    the fact table per query and none. tests/test_sources_plans.py asserts
    the plan is exchange-free with broadcast disabled."""
    import os
    import tempfile

    scratch = os.path.join(tempfile.gettempdir(), "hpcc_platform_spark_scratch")
    lineitem, orders = tables(spark, sf_dir, "lineitem", "orders")
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    for name, df, cols in (
        (f"bkt_orders_{sf_tag}", orders, ["o_orderkey", "o_totalprice", "o_orderstatus"]),
        (f"bkt_lineitem_{sf_tag}", lineitem, ["l_orderkey", "l_extendedprice", "l_discount"]),
    ):
        loc = os.path.join(scratch, name)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        key = cols[0]
        (
            # Cluster by the bucket key BEFORE the write: repartition's
            # pmod(murmur3) is the same function as the bucket id, so each
            # task holds exactly one bucket — the write parallelizes
            # bucket-wise AND still emits one file per bucket. Without it a
            # single-split scan sorts+writes the whole table in ONE task
            # (and a many-split scan writes tasks×buckets fragments).
            df.select(*cols)
            .repartition(8, key)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", loc)
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    o = spark.table(f"bkt_orders_{sf_tag}").where(F.col("o_orderstatus") == "F")
    l = spark.table(f"bkt_lineitem_{sf_tag}")
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
    )


@query(
    "salted_join",
    oracle="""
    SELECT s.s_nationkey, COUNT(*) AS n_lines,
           ROUND(SUM(l.l_quantity), 4) AS qty
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_nationkey
    """,
    category="join",
)
def salted_join_q(spark, sf_dir):
    """Skew-salted join (the static fallback behind the reference's
    SKEW() join options; AQE covers the runtime case): the fact side gets
    a random salt, the dimension side is replicated salt_n ways, and the
    join key becomes (key, salt) — each hot supplier spreads over salt_n
    reducers. Result rows are identical to the unsalted join, which is
    exactly what the oracle checks."""
    from hpcc_platform_spark.operators.skew import salted_join

    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    joined = salted_join(
        li.select(F.col("l_suppkey"), "l_quantity"),
        supp.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"),
        ["l_suppkey"],
        salt_n=8,
    )
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


@query(
    "salted_join_skewed",
    oracle="""
    WITH sk AS (
      SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_suppkey END AS skew_key,
             l_extendedprice, l_discount
      FROM lineitem
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(SUM(sk.l_extendedprice * (1 - sk.l_discount)), 4) AS revenue
    FROM sk JOIN supplier s ON s.s_suppkey = sk.skew_key
    GROUP BY s.s_name
    """,
    category="join",
)
def salted_join_skewed(spark, sf_dir):
    """Salted join under DELIBERATE skew: ~30% of the fact rows are
    remapped to one hot key (supplier 0) — the zipf-hot-key shape the
    reference's SKEW() options exist for (thorlcr/msort/tsortm.cpp
    sample-based partitioning). The salt spreads the hot key across
    salt_n reducers; the oracle replays the remap + plain join, proving
    the salted plan changes the distribution and nothing else.
    bench.py's skew_demo section times this salted plan against the
    unsalted straggler with AQE skew-handling off."""
    from hpcc_platform_spark.operators.skew import salted_join

    li, supp = tables(spark, sf_dir, "lineitem", "supplier")
    sk = li.select(
        F.when(F.col("l_orderkey") % 10 < 3, F.lit(0))
        .otherwise(F.col("l_suppkey"))
        .cast("long")
        .alias("skew_key"),
        "l_extendedprice",
        "l_discount",
    )
    sm = supp.select(F.col("s_suppkey").alias("skew_key"), "s_name")
    joined = salted_join(sk, sm, ["skew_key"], salt_n=8)
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        ),
    )


@query(
    "asof_join_events",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, p.value, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    category="join",
)
def asof_join_events(spark, sf_dir):
    """As-of (point-in-time) join: each purchase matched to the same
    user's most recent view at-or-before it. Implemented as tag + union +
    one partitioned window (operators/asof.py) — ONE key shuffle, no
    range-join explosion, no BNLJ (plan-asserted in tests). Reference
    analogue: sorted KEYED JOIN + ATMOST(1) stepping (thorstep.cpp);
    oracle is DuckDB's native ASOF LEFT JOIN."""
    from hpcc_platform_spark.operators.asof import asof_join

    (ev,) = tables(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    return asof_join(
        purchases, views, on="user_id", left_time="ts", right_time="view_ts"
    )


@query(
    "join_atmost_range",
    oracle="""
    WITH pairs AS (
      SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_quantity,
             COUNT(*) OVER (PARTITION BY o.o_orderkey) AS mc
      FROM orders o JOIN lineitem l
        ON l.l_orderkey = o.o_orderkey
       AND l.l_shipdate < o.o_orderdate + INTERVAL 30 DAY
    ),
    good AS (
      SELECT o_orderkey, o_orderpriority, l_linenumber, l_quantity
      FROM pairs WHERE mc <= 3
    )
    SELECT o.o_orderkey, o.o_orderpriority, g.l_linenumber, g.l_quantity
    FROM orders o LEFT JOIN good g ON g.o_orderkey = o.o_orderkey
    """,
    category="join",
)
def join_atmost_range_q(spark, sf_dir):
    """ATMOST with equality prefix + range tail (MJFhasrange
    eclhelper.hpp:2806): orders matched to lineitems shipped within 30
    days, abandoning (→ unmatched) any order with more than 3 such lines.
    The range predicate rides inside the orderkey equi-join as a
    residual; the per-LHS-row count is one window over the join output."""
    from hpcc_platform_spark.operators import join_atmost_range

    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    out = join_atmost_range(
        orders.select("o_orderkey", "o_orderpriority", "o_orderdate"),
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
        eq_pairs=[("o_orderkey", "l_orderkey")],
        range_cond=F.col("l_shipdate")
        < F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
        atmost=3,
        left_id="o_orderkey",
    )
    return out.select("o_orderkey", "o_orderpriority", "l_linenumber", "l_quantity")


@query(
    "lookup_join_keep",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    )
    SELECT c.c_custkey, r.o_orderkey, r.o_orderdate, r.o_totalprice
    FROM customer c JOIN ranked r ON r.o_custkey = c.c_custkey
    WHERE r.rn <= 2
    """,
    category="join",
)
def lookup_join_keep_q(spark, sf_dir):
    """MANY LOOKUP KEEP(2) with a DECLARED tie-order (JFmanylookup
    eclhelper.hpp:1732): each customer's first two orders by
    (orderdate, orderkey). The reference keeps hash-table arrival order
    ("any n"); we rank the RHS key groups before the broadcast so the
    kept set is deterministic and the broadcast ships only n rows per
    key."""
    from hpcc_platform_spark.operators import lookup_join_keep

    cust, orders = tables(spark, sf_dir, "customer", "orders")
    out = lookup_join_keep(
        cust.select("c_custkey"),
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        keys=["o_custkey"],
        keep=2,
        order_by=["o_orderdate", "o_orderkey"],
        how="inner",
        on=F.col("o_custkey") == F.col("c_custkey"),
    )
    return out.select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
