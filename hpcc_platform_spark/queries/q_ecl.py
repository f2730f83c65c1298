"""ECL front-door coverage: real ECL query TEXT executed end-to-end
through eclfront.run_ecl and oracle-checked — proof that a reference
user's everyday query files run verbatim (lexer ecl/hql/hqllex.l,
grammar ecl/hql/hqlgram.y are the reference analogue of this funnel).
"""

from __future__ import annotations

from hpcc_platform_spark.queries.registry import query, tables


def _catalog(spark, sf_dir, *names):
    return dict(zip(names, tables(spark, sf_dir, *names)))


@query(
    "ecl_front_groupagg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice), 4) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_quantity < 10 AND l_discount > 0.05
    GROUP BY l_returnflag
    """,
    category="workload",
)
def ecl_front_groupagg(spark, sf_dir):
    """ECL text → filtered TABLE group-aggregate, executed verbatim."""
    from hpcc_platform_spark.eclfront import run_ecl

    ecl = """
    fast := lineitem(l_quantity < 10, l_discount > 0.05);
    OUTPUT(TABLE(fast,
        { l_returnflag,
          total := ROUND(SUM(GROUP, l_extendedprice), 4),
          n := COUNT(GROUP) },
        l_returnflag));
    """
    return run_ecl(ecl, _catalog(spark, sf_dir, "lineitem"))


@query(
    "ecl_front_join_topn",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_totalprice > 100000
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 10
    """,
    category="workload",
)
def ecl_front_join_topn(spark, sf_dir):
    """ECL text → filter, LOOKUP join, TOPN with tiebreak — verbatim."""
    from hpcc_platform_spark.eclfront import run_ecl

    ecl = """
    big := orders(o_totalprice > 100000);
    j := JOIN(big, customer, LEFT.o_custkey = RIGHT.c_custkey, LOOKUP);
    OUTPUT(TOPN(j, 10, -o_totalprice, o_orderkey));
    """
    out = run_ecl(ecl, _catalog(spark, sf_dir, "orders", "customer"))
    return out.select("o_orderkey", "c_name", "o_totalprice")


@query(
    "ecl_front_scalar_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 150000
      AND NOT o_orderstatus = 'F'
    """,
    category="workload",
)
def ecl_front_scalar_count(spark, sf_dir):
    """ECL text → IN / BETWEEN / NOT filter + dataset COUNT — verbatim."""
    from hpcc_platform_spark.eclfront import run_ecl

    ecl = """
    OUTPUT(COUNT(orders(
        o_orderpriority IN ['1-URGENT', '2-HIGH']
        AND o_totalprice BETWEEN 50000 AND 150000
        AND NOT (o_orderstatus = 'F'))));
    """
    return run_ecl(ecl, _catalog(spark, sf_dir, "orders"))


@query(
    "ecl_front_q3_shape",
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
def ecl_front_q3_shape(spark, sf_dir):
    """TPC-H Q3 written as plain ECL text and executed through the front
    door: two LOOKUP joins, a grouped TABLE with a computed revenue
    aggregate, TOPN with tiebreak — same plan family as the DataFrame
    version (workload_shipping_priority), proving a real multi-join
    reference query runs verbatim."""
    from hpcc_platform_spark.eclfront import run_ecl

    ecl = """
    bld := customer(c_mktsegment = 'BUILDING');
    ords := orders(o_orderdate < '1995-03-15');
    late := lineitem(l_shipdate > '1995-03-15');
    co := JOIN(ords, bld, LEFT.o_custkey = RIGHT.c_custkey, LOOKUP);
    col := JOIN(late, co, LEFT.l_orderkey = RIGHT.o_orderkey);
    rev := TABLE(col,
        { l_orderkey, o_orderdate,
          revenue := ROUND(SUM(GROUP, l_extendedprice * (1 - l_discount)), 4) },
        l_orderkey, o_orderdate);
    OUTPUT(TOPN(rev, 10, -revenue, l_orderkey));
    """
    out = run_ecl(
        ecl, _catalog(spark, sf_dir, "customer", "orders", "lineitem")
    )
    return out.select("l_orderkey", "revenue", "o_orderdate")
