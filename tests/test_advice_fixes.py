"""Targeted tests for the r2 ADVICE items: pipe schema parsing + streaming,
join_limit single-scan fail guard, helper float-sort alignment."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hpcc_platform_spark.operators import join_limit
from hpcc_platform_spark.sources import pipe_through
from tests.helpers import _canon


def test_pipe_parses_parameterized_types(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, s string"
    )
    out = pipe_through(df, ["cat"], "id decimal(10,2), s string")
    rows = sorted((float(r.id), r.s) for r in out.collect())
    assert rows == [(1.0, "a"), (2.0, "b")]


def test_pipe_streams_large_partition(spark):
    n = 60_000  # several Arrow batches and read_csv chunks
    df = spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v")).coalesce(2)
    out = pipe_through(df, ["cat"], "id bigint, v bigint")
    assert out.count() == n
    assert out.agg(F.sum("v")).head()[0] == n * (n - 1)


def test_pipe_empty_partitions(spark):
    df = spark.range(0).select(F.col("id"))
    assert pipe_through(df, ["cat"], "id bigint").count() == 0


def test_pipe_nonzero_exit_raises(spark):
    df = spark.range(5).select(F.col("id"))
    out = pipe_through(df, ["sh", "-c", "cat; exit 3"], "id bigint")
    with pytest.raises(Exception, match="exited with 3"):
        out.count()


def test_join_limit_fail_is_lazy_and_single_plan(spark):
    left = spark.createDataFrame([(1,), (2,)], "k int")
    right = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    # Construction must NOT raise (no eager count)...
    out = join_limit(left, right, ["k"], limit=1, on_exceed="fail")
    # ...the error fires at execution, from the in-plan guard.
    with pytest.raises(Exception, match="JOIN LIMIT"):
        out.collect()
    ok = join_limit(left, right, ["k"], limit=2, on_exceed="fail")
    assert ok.count() == 3


def test_canon_aligns_rows_despite_float_ulp_noise():
    a = pd.DataFrame({"k": ["x", "y"], "v": [1.0000000001, 1.0]})
    b = pd.DataFrame({"k": ["x", "y"], "v": [1.0, 1.0000000001]})
    ga, gb = _canon(a), _canon(b)
    # Same non-float key order on both sides even though raw float sort
    # order would have swapped the rows.
    assert list(ga["k"]) == list(gb["k"]) == ["x", "y"]
