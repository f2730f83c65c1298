"""Aggregation coverage queries (SURVEY.md §2.4).

Determinism: every double-typed aggregate is rounded to 4 places on both
sides (summation order differs across engines/partitionings). Integer sums
are cast to BIGINT in the oracle (DuckDB SUM(int) returns HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import (
    distribution,
    global_agg,
    group_having,
    quantile_exact,
    table_agg,
)
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "groupagg_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregate",
)
def groupagg_q1(spark, sf_dir):
    """Flagship: TPC-H Q1-shaped grouped hash aggregate (TAKhashaggregate).

    The whole pipeline is one scan → partial agg → exchange on the (tiny
    cardinality) group key → final agg; Catalyst does map-side combine
    exactly like the reference's mergeAggregate partial/final protocol.
    """
    (li,) = tables(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return table_agg(
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")),
        ["l_returnflag", "l_linestatus"],
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "global_agg",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           ROUND(SUM(l_quantity), 4) AS total_qty,
           ROUND(MIN(l_extendedprice), 4) AS min_price,
           ROUND(MAX(l_extendedprice), 4) AS max_price,
           CAST(COUNT(*) > 0 AS BOOLEAN) AS exists_any
    FROM lineitem
    """,
    category="aggregate",
)
def global_agg_q(spark, sf_dir):
    """Whole-dataset aggregate (TAKaggregate :896) + EXISTS/COUNT fused
    variants (TAKexistsaggregate/TAKcountaggregate :1010-1011)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return global_agg(
        li,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey").alias("n_orders"),
        F.round(F.sum("l_quantity"), 4).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        (F.count(F.lit(1)) > 0).alias("exists_any"),
    )


@query(
    "group_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS spend
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 10
    """,
    category="aggregate",
)
def group_having_q(spark, sf_dir):
    """TABLE + HAVING (post-aggregation filter on grouped result)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return group_having(
        orders,
        ["o_custkey"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("spend"),
        ],
        F.col("n_orders") >= 10,
    )


@query(
    "stats_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(var_pop(l_quantity), 4) AS var_qty,
           ROUND(stddev_pop(l_quantity), 4) AS std_qty,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def stats_agg(spark, sf_dir):
    """VARIANCE/COVARIANCE/CORRELATION (no_variance/covariance/correlation,
    ecl/hql/hqlexpr.hpp:634-636 in the reference)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return table_agg(
        li,
        ["l_returnflag"],
        F.round(F.var_pop("l_quantity"), 4).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("std_qty"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@query(
    "cube_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="aggregate",
)
def cube_agg(spark, sf_dir):
    """CUBE grouping sets — a Spark-free superset of the reference (ECL has
    no CUBE; nearest is multiple TABLEs unioned, SURVEY §2.4)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("revenue"),
        )
    )


@query(
    "distribution_profile",
    oracle="""
    SELECT 'c_mktsegment' AS field,
           COUNT(c_mktsegment) AS n_nonnull,
           COUNT(DISTINCT c_mktsegment) AS n_distinct,
           MIN(c_mktsegment) AS min_value, MAX(c_mktsegment) AS max_value
    FROM customer
    UNION ALL
    SELECT 'c_nationkey',
           COUNT(c_nationkey), COUNT(DISTINCT c_nationkey),
           MIN(CAST(c_nationkey AS VARCHAR)), MAX(CAST(c_nationkey AS VARCHAR))
    FROM customer
    """,
    category="aggregate",
)
def distribution_profile(spark, sf_dir):
    """DISTRIBUTION(ds, fields) (TAKdistribution :916; reference impl
    rtl/eclrtl/rtldistr.cpp) — per-field profile as a tidy DataFrame."""
    (cust,) = tables(spark, sf_dir, "customer")
    return distribution(cust, ["c_mktsegment", "c_nationkey"])


@query(
    "quantile_exact",
    oracle="""
    WITH tiled AS (
      SELECT l_quantity, l_orderkey, l_linenumber,
             ntile(4) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber) AS tile
      FROM lineitem
    ), ranked AS (
      SELECT l_quantity, tile,
             row_number() OVER (
               PARTITION BY tile
               ORDER BY l_quantity DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      FROM tiled
    )
    SELECT CAST(tile AS INT) AS tile, l_quantity FROM ranked WHERE rn = 1 AND tile < 4
    """,
    category="aggregate",
)
def quantile_exact_q(spark, sf_dir):
    """QUANTILE(ds, 4) (TAKquantile :1082) — exact quartile boundary rows."""
    (li,) = tables(spark, sf_dir, "lineitem")
    out = quantile_exact(li, "l_quantity", 4, ["l_orderkey", "l_linenumber"])
    return out.select(F.col("tile").cast("int").alias("tile"), "l_quantity")


@query(
    "approx_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps
    FROM lineitem
    """,
    category="aggregate",
)
def approx_distinct(spark, sf_dir):
    """COUNT DISTINCT — exact form for the oracle; the 100 TB path is
    approx_count_distinct (HLL), exercised in tests (no cross-engine oracle
    since sketches differ)."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return global_agg(
        li,
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
    )


@query(
    "benford_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(FLOOR(o_totalprice / POWER(10, FLOOR(LOG10(o_totalprice)))) AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), c AS (
      SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
    )
    SELECT digit, n,
           ROUND(n / (SELECT SUM(n)::DOUBLE FROM c), 4) AS observed_freq,
           ROUND(LOG10(1.0 + 1.0 / digit), 4) AS expected_freq
    FROM c
    """,
    category="aggregate",
)
def benford_digits(spark, sf_dir):
    """Benford first-significant-digit profile
    (ecllibrary/std/DataPatterns/Benford.ecl): numeric digit extraction —
    no string-format dependence — one groupBy, map-side partial agg."""
    from hpcc_platform_spark.functions.profile import benford_first_digit

    (orders,) = tables(spark, sf_dir, "orders")
    return benford_first_digit(orders, "o_totalprice")


@query(
    "profile_fields",
    oracle="""
    WITH tall AS (
      SELECT 'c_mktsegment' AS field, CAST(c_mktsegment AS VARCHAR) AS value,
             regexp_replace(regexp_replace(regexp_replace(c_mktsegment, '[A-Z]', 'A', 'g'),
                            '[a-z]', 'a', 'g'), '[0-9]', '9', 'g') AS pattern
      FROM customer
      UNION ALL
      SELECT 'c_name', CAST(c_name AS VARCHAR),
             regexp_replace(regexp_replace(regexp_replace(c_name, '[A-Z]', 'A', 'g'),
                            '[a-z]', 'a', 'g'), '[0-9]', '9', 'g')
      FROM customer
    ), per_field AS (
      SELECT field,
             COUNT(value) AS fill_count,
             ROUND(COUNT(value) / (SELECT COUNT(*)::DOUBLE FROM customer), 4) AS fill_rate,
             COUNT(DISTINCT value) AS cardinality,
             MIN(value) AS min_value, MAX(value) AS max_value
      FROM tall GROUP BY field
    ), pat AS (
      SELECT field, pattern AS top_pattern, COUNT(*) AS top_pattern_n,
             row_number() OVER (PARTITION BY field ORDER BY COUNT(*) DESC, pattern) AS rn
      FROM tall WHERE pattern IS NOT NULL GROUP BY field, pattern
    )
    SELECT p.field, p.fill_count, p.fill_rate, p.cardinality, p.min_value, p.max_value,
           t.top_pattern, t.top_pattern_n
    FROM per_field p LEFT JOIN pat t ON p.field = t.field AND t.rn = 1
    """,
    category="aggregate",
)
def profile_fields(spark, sf_dir):
    """DataPatterns Profile (ecllibrary/std/DataPatterns/Profile.ecl): per
    field — fill count/rate, cardinality, min/max, most popular A/a/9 text
    pattern. Tall-frame union + one (field[, pattern]) groupBy each."""
    from hpcc_platform_spark.functions.profile import profile

    (cust,) = tables(spark, sf_dir, "customer")
    return profile(cust, ["c_mktsegment", "c_name"])


@query(
    "best_record_structure",
    oracle="""
    WITH tall AS (
      SELECT 'c_name' AS field, CAST(c_name AS VARCHAR) AS value FROM customer
      UNION ALL
      SELECT 'c_custkey', CAST(c_custkey AS VARCHAR) FROM customer
      UNION ALL
      SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR) FROM customer
    ), stats AS (
      SELECT field,
             MIN(length(value)) AS min_len,
             MAX(length(value)) AS max_len,
             MIN(CASE WHEN regexp_matches(value, '^[0-9]+$') THEN 1 ELSE 0 END) AS all_digits,
             MIN(CASE WHEN regexp_matches(value, '^-?[0-9]+$') THEN 1 ELSE 0 END) AS all_ints
      FROM tall GROUP BY field
    )
    SELECT field,
           CASE WHEN all_digits = 1 THEN 'UNSIGNED' || CAST(CAST(CEIL(max_len / 2.0) AS BIGINT) AS VARCHAR)
                WHEN all_ints = 1 THEN 'INTEGER' || CAST(CAST(CEIL((max_len + 1) / 2.0) AS BIGINT) AS VARCHAR)
                WHEN min_len = max_len THEN 'STRING' || CAST(max_len AS VARCHAR)
                ELSE 'STRING' END AS best_type,
           min_len, max_len
    FROM stats
    """,
    category="aggregate",
)
def best_record_structure_q(spark, sf_dir):
    """DataPatterns BestRecordStructure
    (ecllibrary/std/DataPatterns/BestRecordStructure.ecl): tightest
    ECL-style type recommendation per field from observed values — one
    aggregate pass, no driver iteration."""
    from hpcc_platform_spark.functions.profile import best_record_structure

    (cust,) = tables(spark, sf_dir, "customer")
    return best_record_structure(cust, ["c_name", "c_custkey", "c_mktsegment"])


@query(
    "salted_agg",
    oracle="""
    SELECT l_returnflag, ROUND(SUM(l_quantity), 4) AS qty,
           ROUND(SUM(l_extendedprice), 4) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregate",
)
def salted_agg(spark, sf_dir):
    """Hot-key-safe two-phase aggregation (the static fallback behind the
    reference's SKEW() options): partial sums by (key, salt), final sums by
    key — the reduce side of a dominant key spreads over salt_n reducers.
    l_returnflag has only 3 values (maximal skew for a hash agg), and the
    oracle proves salted == plain."""
    from hpcc_platform_spark.operators.skew import salted_agg_sum

    (li,) = tables(spark, sf_dir, "lineitem")
    out = salted_agg_sum(
        li,
        ["l_returnflag"],
        {"l_quantity": "qty", "l_extendedprice": "revenue"},
        salt_n=8,
    )
    return out.select(
        "l_returnflag",
        F.round("qty", 4).alias("qty"),
        F.round("revenue", 4).alias("revenue"),
    )


@query(
    "hypertable_rollup",
    oracle="""
    WITH fine AS (
      SELECT date_trunc('minute', CAST(ts AS TIMESTAMP)) AS bucket,
             COUNT(*) AS n, SUM(value) AS total,
             MIN(value) AS vmin, MAX(value) AS vmax
      FROM events GROUP BY 1
    ),
    hour AS (
      SELECT date_trunc('hour', bucket) AS bucket,
             SUM(n) AS n, SUM(total) AS total, MIN(vmin) AS vmin, MAX(vmax) AS vmax
      FROM fine GROUP BY 1
    ),
    day AS (
      SELECT date_trunc('day', bucket) AS bucket,
             SUM(n) AS n, SUM(total) AS total, MIN(vmin) AS vmin, MAX(vmax) AS vmax
      FROM hour GROUP BY 1
    )
    SELECT level, bucket, CAST(n AS BIGINT) AS n, ROUND(total, 4) AS total,
           ROUND(vmin, 4) AS vmin, ROUND(vmax, 4) AS vmax,
           ROUND(ROUND(total, 4) / n, 4) AS avg_val
    FROM (
      SELECT 'minute' AS level, * FROM fine
      UNION ALL SELECT 'hour', * FROM hour
      UNION ALL SELECT 'day', * FROM day
    )
    """,
    category="aggregate",
)
def hypertable_rollup_q(spark, sf_dir):
    """Hypertable rollup (continuous-aggregate hierarchy): minute buckets
    from the raw events scan once; hour and day levels re-aggregate the
    finer level's partials (sum-of-sums, min-of-mins) — the raw table is
    scanned exactly once regardless of how many levels stack. AVG derived
    from (sum, count) at the end."""
    from hpcc_platform_spark.operators.aggregate import time_rollup_hierarchy

    (ev,) = tables(spark, sf_dir, "events")
    return time_rollup_hierarchy(ev, "ts", "value")


@query(
    "blas_gram_matrix",
    oracle="""
    WITH a AS (
      SELECT l_suppkey % 25 AS i, l_partkey % 20 AS j,
             SUM(l_quantity) AS v
      FROM lineitem GROUP BY 1, 2
    )
    SELECT x.i AS i, y.i AS j, ROUND(SUM(x.v * y.v), 4) AS v
    FROM a x JOIN a y ON x.j = y.j
    WHERE x.i <= y.i
    GROUP BY x.i, y.i
    """,
    category="aggregate",
)
def blas_gram_matrix(spark, sf_dir):
    """Std.BLAS dsyrk (plugins/eclblas/dsyrk.cpp): Gram matrix G = A @ A'
    (upper triangle) of a coordinate-form matrix derived from lineitem —
    the covariance-kernel shape. One join shuffle on the contracted
    dimension + one (i, j) aggregation; entries stay integral so the
    comparison is exact."""
    from pyspark.sql import functions as F

    from hpcc_platform_spark.operators.blas import dsyrk

    (li,) = tables(spark, sf_dir, "lineitem")
    a = li.groupBy(
        (F.col("l_suppkey") % 25).alias("i"),
        (F.col("l_partkey") % 20).alias("j"),
    ).agg(F.sum("l_quantity").alias("v"))
    return dsyrk(a, upper=True).withColumn("v", F.round("v", 4))
