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
    SELECT o_orderkey, CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS counter
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


@query(
    "case_dataset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000
    """,
    category="transform",
)
def case_dataset(spark, sf_dir):
    """Dataset-level IF/CASE (TAKif :914, TAKcase :930): the condition picks
    which dataset to evaluate; the unused branch never executes (Roxie
    devdoc: 'conditional branches never start unused inputs' — Python
    laziness gives the same property: the unpicked plan is never acted)."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_totalprice")
    # Condition over metadata (row count parity of the source) — stable for
    # a given sf_dir, so the oracle pins the taken branch.
    take_high_value = base.count() > 100
    high = base.where(F.col("o_totalprice") > 200000)
    low = base.where(F.col("o_totalprice") <= 200000)
    return high if take_high_value else low


@query(
    "process_stateful",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'purchase' THEN value ELSE -value END AS delta,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM events
    ), bal AS (
      SELECT user_id, event_id, rn, GREATEST(0.0, delta) AS balance FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.event_id, s.rn, GREATEST(0.0, b.balance + s.delta)
      FROM bal b JOIN seq s ON s.user_id = b.user_id AND s.rn = b.rn + 1
    )
    SELECT user_id, event_id, ROUND(balance, 4) AS balance FROM bal
    """,
    category="transform",
)
def process_stateful(spark, sf_dir):
    """PROCESS (TAKprocess :994): stateful scan with a RIGHT state record —
    a floor-at-zero running balance (max(0, prev + delta)), a genuinely
    non-linear recurrence no window frame expresses. The oracle is a
    recursive CTE stepping the same recurrence row-by-row per user (ts cast
    to µs so ordering matches the ingested timestamps); the unit test in
    tests/test_operators.py additionally pins the closed form."""
    import pandas as pd

    from hpcc_platform_spark.operators import iterate_pandas

    (events,) = tables(spark, sf_dir, "events")
    deltas = events.select(
        "user_id", "event_id", "ts",
        (F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(-F.col("value"))).alias("delta"),
    )

    def floor_balance(pdf: pd.DataFrame) -> pd.DataFrame:
        bal, out = 0.0, []
        for d in pdf["delta"]:
            bal = max(0.0, bal + d)
            out.append(round(bal, 4))
        return pdf.assign(balance=out)[["user_id", "event_id", "balance"]]

    return iterate_pandas(
        deltas,
        keys=["user_id"],
        order_by=["ts", "event_id"],
        fn=floor_balance,
        schema="user_id long, event_id long, balance double",
    )


@query(
    "aggregate_user_transform",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="transform",
)
def aggregate_user_transform(spark, sf_dir):
    """AGGREGATE with a user TRANSFORM (no_aggregate hqlexpr.hpp:446):
    arbitrary per-group fold via applyInPandas (the pandas-UDAF lowering of
    the reference's processFirst/processNext/mergeAggregate contract) —
    quantity-weighted average price, verified against its SQL closed form."""
    import pandas as pd

    (li,) = tables(spark, sf_dir, "lineitem")

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"].sum()
        v = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum()
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "wavg_price": [round(v / w, 4)]}
        )

    return (
        li.select("l_returnflag", "l_quantity", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(wavg, schema="l_returnflag string, wavg_price double")
    )


@query(
    "denormalize_group",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice,
           COUNT(l.l_orderkey) AS n_children,
           COALESCE(ROUND(SUM(l.l_extendedprice), 4), 0.0) AS child_value
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_totalprice
    """,
    category="transform",
)
def denormalize_group(spark, sf_dir):
    """DENORMALIZE GROUP (TAKdenormalizegroup :1068): whole-group variant —
    parent + ALL children folded in one transform call; parents with no
    children keep an empty child set (LEFT OUTER fold)."""
    orders, li = tables(spark, sf_dir, "orders", "lineitem")
    children = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_linenumber", "l_extendedprice")).alias("items")
    )
    folded = orders.join(
        children, orders.o_orderkey == children.l_orderkey, "left"
    )
    return folded.select(
        "o_orderkey",
        "o_totalprice",
        F.coalesce(F.size("items"), F.lit(0)).cast("long").alias("n_children"),
        F.coalesce(
            F.round(
                F.aggregate(
                    "items", F.lit(0.0), lambda acc, x: acc + x["l_extendedprice"]
                ),
                4,
            ),
            F.lit(0.0),
        ).alias("child_value"),
    )


@query(
    "regroup_union",
    oracle="""
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM (
      SELECT user_id, value FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, value FROM events WHERE event_type = 'signup'
    ) GROUP BY user_id
    """,
    category="transform",
)
def regroup_union(spark, sf_dir):
    """REGROUP (TAKregroup :982): interleave two grouped streams into one
    grouped dataset — under the carried-keys convention, union then
    per-group ops see each key's rows from both inputs."""
    from hpcc_platform_spark.operators import regroup

    (events,) = tables(spark, sf_dir, "events")
    a = events.where(F.col("event_type") == "purchase").select("user_id", "value")
    b = events.where(F.col("event_type") == "signup").select("user_id", "value")
    merged = regroup(["user_id"], a, b)
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
