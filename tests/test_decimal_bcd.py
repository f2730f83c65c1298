"""DECIMAL BCD edge semantics (reference rtl/nbcd/nbcd.cpp: 32-digit packed
BCD with round-half-up on magnitude): Spark DecimalType parity at the
rounding boundary, full precision width, and overflow contract."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").head().v


def test_scale_reduction_rounds_half_up(spark):
    # nbcd.cpp Decimal::round :421-445: digits[lsb-1] >= 5 -> increment.
    assert _one(spark, "CAST(CAST('2.345' AS DECIMAL(10,3)) AS DECIMAL(12,2))") == Decimal("2.35")
    assert _one(spark, "CAST(CAST('2.344' AS DECIMAL(10,3)) AS DECIMAL(12,2))") == Decimal("2.34")
    # Sign held separately from the BCD magnitude -> half away from zero.
    assert _one(spark, "CAST(CAST('-2.345' AS DECIMAL(10,3)) AS DECIMAL(12,2))") == Decimal("-2.35")


def test_carry_propagates_through_all_digits(spark):
    # 9.995 -> 10.00: the increment carries across every digit (incLSD loop).
    assert _one(spark, "CAST(CAST('9.995' AS DECIMAL(10,3)) AS DECIMAL(12,2))") == Decimal("10.00")


def test_exact_arithmetic_at_and_past_32_digits(spark):
    # (Expected values written as literals: Python's default Decimal context
    # is only 28 digits, so computing them would itself round.)
    d32 = "9" * 32
    assert _one(
        spark, f"CAST('{d32}' AS DECIMAL(32,0)) - CAST(1 AS DECIMAL(32,0))"
    ) == Decimal("9" * 31 + "8")
    # Wider than the reference's 32-digit BCD: Spark is exact to 38.
    got = _one(
        spark,
        "CAST('1234567890123456789' AS DECIMAL(19,0)) * CAST('9999999999999999999' AS DECIMAL(19,0))",
    )
    assert got == Decimal("12345678901234567888765432109876543211")


def test_overflow_contract(spark):
    # ANSI mode: overflow on cast raises; try_cast yields NULL (the SKIP
    # analog). Our engine's contract is explicit failure or explicit NULL,
    # never silently wrong digits.
    assert _one(spark, "TRY_CAST('12345' AS DECIMAL(3,0))") is None
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    if ansi == "true":
        with pytest.raises(Exception):
            _one(spark, "CAST('12345' AS DECIMAL(3,0))")
    else:
        assert _one(spark, "CAST('12345' AS DECIMAL(3,0))") is None


def test_sum_of_decimal_column_is_exact(spark):
    df = spark.range(10_000).select(
        (F.lit("0.1").cast("decimal(10,1)")).alias("d")
    )
    assert df.agg(F.sum("d")).head()[0] == Decimal("1000.0")
