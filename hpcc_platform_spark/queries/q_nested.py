"""Nested-data coverage queries (SURVEY.md §1.1 child datasets, §2.2
NORMALIZE/DENORMALIZE, dictionaries, SET OF).

The reference's child datasets (DATASET-typed fields, sq.ecl fixtures) map
to array<struct> columns; moving between nested and flat is
collect_list(struct(...)) ↔ explode. Dictionaries (type_dictionary,
rtlconst.hpp:73) map to MapType lookups built from small tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import normalize
from hpcc_platform_spark.queries.registry import query, tables


def _nest_lineitems(li):
    """orders' lineitems as a sorted child dataset: array<struct> ordered by
    (l_linenumber, l_quantity, l_extendedprice) — array_sort on struct
    compares fields left-to-right. All three fields participate because
    l_linenumber alone is NOT unique in the synthetic data; the full
    tiebreak keeps nested order deterministic."""
    return li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("items")
    )


@query(
    "denormalize_summary",
    oracle="""
    SELECT l_orderkey,
           COUNT(*) AS n_items,
           ROUND(MAX(l_quantity), 4) AS max_qty,
           ROUND(SUM(l_extendedprice), 4) AS order_value
    FROM lineitem GROUP BY l_orderkey
    """,
    category="nested",
)
def denormalize_summary(spark, sf_dir):
    """DENORMALIZE (TAKdenormalize :1056): fold children into a nested child
    dataset, then summarize it with array lambdas (child aggregates à la the
    reference's aggsq tests).

    The child array is nested UNSORTED and carries only the two fields the
    child aggregates read: count/max/sum are order-independent, so the
    array_sort (O(k log k) per parent) and the l_linenumber tiebreak field
    the sorted variant needs (see _nest_lineitems, which
    normalize_roundtrip still uses because child POSITION is its output)
    would be computed and shuffled only to be thrown away (guide §1.2:
    don't compute what you discard; §2.3: shuffle fewer bytes). Sum order
    over the unsorted child list is engine-arbitrary — the same guarantee
    class as every groupBy SUM, handled by ROUND(x, 4) on both sides."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_extendedprice")).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.round(
            F.array_max(F.transform("items", lambda x: x["l_quantity"])), 4
        ).alias("max_qty"),
        F.round(
            F.aggregate(
                "items",
                F.lit(0.0),
                lambda acc, x: acc + x["l_extendedprice"],
            ),
            4,
        ).alias("order_value"),
    )


@query(
    "normalize_roundtrip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CAST(row_number() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_quantity, l_extendedprice) AS INT) AS child_pos
    FROM lineitem
    """,
    category="nested",
)
def normalize_roundtrip(spark, sf_dir):
    """NORMALIZE child datasets (TAKnormalizechild :910): nest lineitems
    under orders, then explode back with a per-parent COUNTER — the
    roundtrip must reproduce the flat table (sq.ecl's nested↔flat duality)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = _nest_lineitems(li)
    flat = normalize(nested, "items", child_alias="item", with_counter="child_pos")
    return flat.select(
        "l_orderkey",
        F.col("item.l_linenumber").alias("l_linenumber"),
        F.col("item.l_quantity").alias("l_quantity"),
        F.col("child_pos").cast("int").alias("child_pos"),
    )


@query(
    "dictionary_lookup",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation_name
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    category="nested",
)
def dictionary_lookup(spark, sf_dir):
    """DICTIONARY (type_dictionary, rtlconst.hpp:73; no_indict lookups):
    build a scalar-payload map from the nation table, look up per row via
    element_at. The map literal ships to executors once (broadcast-style) —
    the Spark form of ECL's in-memory dictionary."""
    cust, nation = tables(spark, sf_dir, "customer", "nation")
    pairs = nation.select("n_nationkey", "n_name").collect()
    mapping = F.create_map(
        *[F.lit(v) for row in pairs for v in (row.n_nationkey, row.n_name)]
    )
    return cust.select(
        "c_custkey", F.element_at(mapping, F.col("c_nationkey")).alias("nation_name")
    )


@query(
    "set_membership",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    category="nested",
)
def set_membership(spark, sf_dir):
    """SET OF + IN (type_set rtlconst.hpp:48; no_in hqlexpr.hpp:211) —
    membership filter against a scalar set."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderpriority")


@query(
    "set_functions",
    oracle="""
    SELECT c_nationkey,
           list_aggr(list_sort(list(DISTINCT c_mktsegment)), 'string_agg', ',') AS segments,
           CAST(len(list(DISTINCT c_mktsegment)) AS INT) AS n_segments
    FROM customer GROUP BY c_nationkey
    """,
    category="nested",
)
def set_functions(spark, sf_dir):
    """CREATESET / set ops (no_createset :562): collect the distinct set per
    group; serialized sorted so the value is deterministic."""
    (cust,) = tables(spark, sf_dir, "customer")
    return cust.groupBy("c_nationkey").agg(
        F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
        F.size(F.collect_set("c_mktsegment")).cast("int").alias("n_segments"),
    )


@query(
    "child_dataset_hof",
    oracle="""
    SELECT l_orderkey,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 30) AS INT) AS n_big,
           ROUND(COALESCE(SUM(l_extendedprice) FILTER (WHERE l_quantity > 30), 0), 4) AS big_value,
           CAST(COUNT(*) AS INT) AS n_children
    FROM lineitem
    GROUP BY l_orderkey
    """,
    category="nested",
)
def child_dataset_hof(spark, sf_dir):
    """Child-dataset operations WITHOUT re-exploding (sq.ecl-style nested
    records operated on in place): build the nested form once
    (collect_list(struct)), then filter/aggregate the child dataset with
    higher-order array functions — the Spark-first form of ECL's
    ds.children(filter) aggregation, one shuffle total, children never
    leave their parent row."""
    (li,) = tables(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_quantity", "l_extendedprice")).alias("items")
    )
    # Bind the filtered child list once: as a free expression the filter
    # would be inlined into both consumers and run twice per row (the
    # change-#14 pattern).
    staged = nested.select(
        "l_orderkey",
        "items",
        F.filter("items", lambda x: x["l_quantity"] > 30).alias("__big__"),
    )
    return staged.select(
        "l_orderkey",
        F.size("__big__").alias("n_big"),
        F.round(
            F.aggregate(
                "__big__", F.lit(0.0), lambda acc, x: acc + x["l_extendedprice"]
            ),
            4,
        ).alias("big_value"),
        F.size("items").alias("n_children"),
    )
