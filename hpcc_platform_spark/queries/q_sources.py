"""Source/sink coverage queries (SURVEY.md §2.1).

Roundtrip pattern: materialize through the format under test into a scratch
dir, read back, and compare against the DuckDB oracle over the original
parquet — proving the writer+reader pair preserves values.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from hpcc_platform_spark.queries.registry import query, tables
from hpcc_platform_spark.sources import (
    build_index,
    inline_dataset,
    read_csv,
    read_index,
    read_json,
    read_superfile,
    write_csv,
    write_json,
    write_parquet,
)

_SCRATCH = os.path.join(tempfile.gettempdir(), "hpcc_platform_spark_scratch")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


@query(
    "inline_table",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'alpha', 10.5), (2, 'beta', 20.25), (3, 'gamma', NULL)
    ) AS t(id, name, score)
    """,
    category="sources",
)
def inline_table(spark, sf_dir):
    """Inline DATASET([...]) literal (TAKinlinetable :1034)."""
    return inline_dataset(
        spark,
        [(1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", None)],
        "id int, name string, score double",
    )


@query(
    "csv_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    category="sources",
)
def csv_roundtrip(spark, sf_dir):
    """CSV write+read with dialect options (TAKcsvwrite :921 /
    TAKcsvread :977, ICsvParameters eclhelper.hpp:2109-2112): pipe
    separator + quote, explicit schema (no inference in the engine path)."""
    (region,) = tables(spark, sf_dir, "region")
    path = _scratch("region_csv")
    write_csv(region.select("r_regionkey", "r_name"), path, separator="|")
    return read_csv(
        spark, path, schema="r_regionkey int, r_name string", separator="|"
    )


@query(
    "json_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    category="sources",
)
def json_roundtrip(spark, sf_dir):
    """JSON write+read (TAKjsonwrite :1079 / TAKjsonread :1080)."""
    (nation,) = tables(spark, sf_dir, "nation")
    path = _scratch("nation_json")
    write_json(nation, path)
    return read_json(
        spark, path, schema="n_nationkey int, n_name string, n_regionkey int"
    )


@query(
    "index_keyed_read",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice FROM part
    WHERE p_partkey BETWEEN 1000 AND 1200
    """,
    category="sources",
)
def index_keyed_read(spark, sf_dir):
    """INDEX build + KEYED read (TAKindexwrite :923, TAKindexread :963):
    range-partitioned sorted parquet; the KEYED range filter reaches the
    scan as PushedFilters + row-group pruning (the jhtree segment-monitor
    analogue)."""
    (part,) = tables(spark, sf_dir, "part")
    path = _scratch("part_index")
    build_index(part, path, keyed=["p_partkey"], n_parts=4)
    out = read_index(
        spark,
        path,
        keyed_filter=F.col("p_partkey").between(1000, 1200),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    return out


@query(
    "superfile_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    WHERE o_orderstatus IN ('F', 'O')
    """,
    category="sources",
)
def superfile_read(spark, sf_dir):
    """Superfile union-of-files (dadfs.hpp:493-497): two part-files written
    separately, read back as one logical dataset via multi-path read."""
    (orders,) = tables(spark, sf_dir, "orders")
    base = orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
    p1, p2 = _scratch("orders_part_f"), _scratch("orders_part_o")
    write_parquet(base.where(F.col("o_orderstatus") == "F"), p1)
    write_parquet(base.where(F.col("o_orderstatus") == "O"), p2)
    return read_superfile(spark, [p1, p2])
