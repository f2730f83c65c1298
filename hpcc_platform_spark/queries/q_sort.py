"""Sort / top-k / merge coverage queries (SURVEY.md §2.6).

The value-hash compare is order-insensitive, so sort queries make order
*observable* by materializing a rank column — the sorted position IS the
tested output, exactly how the reference's terasort verifies order with a
pairwise ROLLUP (testing/benchmarks/ecl/terasort.ecl).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.operators import global_sort, merge_sorted, project_counter, topn
from hpcc_platform_spark.queries.registry import query, tables
from hpcc_platform_spark.sources.inline import inline_dataset


@query(
    "global_sort_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate,
           CAST(row_number() OVER (
             ORDER BY l_shipdate, l_orderkey, l_linenumber) AS BIGINT) AS sort_pos
    FROM lineitem WHERE l_quantity >= 48
    """,
    category="sort",
)
def global_sort_rank(spark, sf_dir):
    """Global SORT (TAKsort :889): two-phase range-partition numbering ≡ the
    reference's sampled-split-point msort + rank-offset exchange
    (thorlcr/msort/tsortm.cpp:66,242). The sort position is materialized so
    the oracle verifies total order; no single-partition exchange anywhere
    in the plan."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return project_counter(
        li.where(F.col("l_quantity") >= 48).select(
            "l_orderkey", "l_linenumber", "l_shipdate"
        ),
        ["l_shipdate", "l_orderkey", "l_linenumber"],
        "sort_pos",
    )


@query(
    "topn",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100
    """,
    category="sort",
)
def topn_q(spark, sf_dir):
    """TOPN(ds, 100) (TAKtopn :936) — TakeOrderedAndProject: per-partition
    heaps + merge, identical algorithm to thorlcr/activities/topn/."""
    (li,) = tables(spark, sf_dir, "lineitem")
    return topn(
        li.select("l_orderkey", "l_linenumber", "l_extendedprice"),
        100,
        F.col("l_extendedprice").desc(),
        "l_orderkey",
        "l_linenumber",
    )


@query(
    "merge_sorted",
    oracle="""
    SELECT s_suppkey, s_acctbal,
           CAST(row_number() OVER (ORDER BY s_acctbal, s_suppkey) AS BIGINT) AS pos
    FROM supplier
    """,
    category="sort",
)
def merge_sorted_q(spark, sf_dir):
    """MERGE of sorted streams (TAKmerge :937): two disjoint sorted halves
    re-merged; the rank column proves the merged order is total."""
    (supp,) = tables(spark, sf_dir, "supplier")
    base = supp.select("s_suppkey", "s_acctbal")
    lo = global_sort(base.where(F.col("s_acctbal") < 0), "s_acctbal", "s_suppkey")
    hi = global_sort(base.where(F.col("s_acctbal") >= 0), "s_acctbal", "s_suppkey")
    merged = merge_sorted([lo, hi], "s_acctbal", "s_suppkey")
    return project_counter(merged, ["s_acctbal", "s_suppkey"], "pos")


@query(
    "terasort_verify",
    oracle=(
        "SELECT CAST("
        + __import__("os").environ.get("SPARK_GRAFT_TERASORT_ROWS", "500000")
        + " AS BIGINT) AS n_rows, TRUE AS is_sorted"
    ),
    category="sort",
)
def terasort_verify(spark, sf_dir):
    """Scaled terasort self-check (the reference's own benchmark
    definition: testing/benchmarks/ecl/terasort.ecl — global SORT by a
    random-ish key, then order verification; its double-ROLLUP check maps
    to per-partition monotonicity + partition-boundary ordering).
    Generation is deterministic (md5 of row id); the sort is Spark's
    sample-based range partition + per-partition sort — the same design as
    thorlcr/msort (tsortm.cpp split points from samples)."""
    import os as _os

    import pandas as pd

    # Scale knob: the reference's self-check is ~1 GB (terasort.ecl:20-34);
    # default 500k rows (~50 MB) keeps the per-round bench budget, and
    # SPARK_GRAFT_TERASORT_ROWS=10000000 reproduces the documented scale
    # (the plan is identical — range exchange + per-partition sort — so the
    # default measures the same shape, smaller).
    n = int(_os.environ.get("SPARK_GRAFT_TERASORT_ROWS", "500000"))
    rows = spark.range(n).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("key"),
        F.col("id").alias("seq"),
    )
    sorted_df = rows.orderBy("key")

    def check(pdfs):
        cnt, ok, first, last = 0, True, None, None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ok = ok and bool(pdf["key"].is_monotonic_increasing)
            if first is None:
                first = pdf["key"].iloc[0]
            else:
                ok = ok and (last <= pdf["key"].iloc[0])
            last = pdf["key"].iloc[-1]
            cnt += len(pdf)
        yield pd.DataFrame({"cnt": [cnt], "ok": [ok], "first": [first], "last": [last]})

    parts = [
        r
        for r in sorted_df.mapInPandas(
            check, "cnt long, ok boolean, first string, last string"
        ).collect()
        if r.cnt
    ]
    parts.sort(key=lambda r: r.first)
    total = sum(r.cnt for r in parts)
    is_sorted = all(r.ok for r in parts) and all(
        parts[i].last <= parts[i + 1].first for i in range(len(parts) - 1)
    )
    return inline_dataset(
        spark, [(total, is_sorted)], "n_rows long, is_sorted boolean"
    )


@query(
    "subsort_runs",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber,
           CAST(row_number() OVER (
             PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber) AS INT) AS pos
    FROM lineitem WHERE l_quantity >= 45
    """,
    category="sort",
)
def subsort_runs(spark, sf_dir):
    """SUBSORT (TAKsubsort :1029): refine an existing sort by extra keys
    without a global exchange — repartition on the run prefix, sort within
    partitions. Verification mirrors terasort_verify: a sequential
    mapInPandas scan numbers each prefix run AS DELIVERED, so the oracle's
    per-group row_number only matches if rows genuinely arrive grouped and
    sorted (the numbering is not a window that would re-sort them)."""
    from collections.abc import Iterator

    import pandas as pd

    from hpcc_platform_spark.operators import subsort

    (li,) = tables(spark, sf_dir, "lineitem")
    refined = subsort(
        li.where(F.col("l_quantity") >= 45).select(
            "l_returnflag", "l_quantity", "l_orderkey", "l_linenumber"
        ),
        ["l_returnflag"],
        ["l_quantity", "l_orderkey", "l_linenumber"],
    )

    def number_runs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last, c = None, 0
        for pdf in batches:
            pos = []
            for rf in pdf["l_returnflag"]:
                if rf != last:
                    last, c = rf, 0
                c += 1
                pos.append(c)
            yield pd.DataFrame(
                {
                    "l_returnflag": pdf["l_returnflag"],
                    "l_orderkey": pdf["l_orderkey"],
                    "l_linenumber": pdf["l_linenumber"],
                    "pos": pd.array(pos, dtype="int32"),
                }
            )

    return refined.mapInPandas(
        number_runs,
        schema="l_returnflag string, l_orderkey bigint, l_linenumber int, pos int",
    )


@query(
    "sorted_assertion",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier
    """,
    category="sort",
)
def sorted_assertion(spark, sf_dir):
    """SORTED(ds, keys) assertion (TAKsorted :1000): rows pass through
    unchanged when the declared order holds; the job FAILS on the first
    out-of-order pair (failure path pinned in tests). Here the input is
    locally sorted by the declared keys, so the assertion passes and the
    oracle sees the identity projection."""
    from hpcc_platform_spark.operators import assert_sorted, local_sort

    (supp,) = tables(spark, sf_dir, "supplier")
    base = local_sort(
        supp.select("s_suppkey", "s_nationkey", "s_acctbal"),
        "s_nationkey", "s_acctbal", "s_suppkey",
    )
    return assert_sorted(base, "s_nationkey", "s_acctbal", "s_suppkey")
