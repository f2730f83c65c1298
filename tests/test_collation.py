"""Locale collation (Std.Uni / unicodelib parity on Spark collated strings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.functions import (
    collated,
    collated_sort,
    collation_name,
    compare_at_strength,
    locale_compare_ignore_case,
)


def test_collation_name_strength_mapping():
    assert collation_name("de", 1) == "de_CI_AI"
    assert collation_name("de", 2) == "de_CI"
    assert collation_name("de", 3) == "de"
    assert collation_name("de", 5) == "de"  # 4/5 collapse to tertiary


def test_german_collation_sorts_umlauts_with_base(spark):
    df = spark.createDataFrame(
        [(0, "Zebra"), (1, "Äpfel"), (2, "Apfel"), (3, "Ärger"), (4, "Arm")],
        "id int, name string",
    )
    got = [r.name for r in collated_sort(df, "name", "de", 3, "id").collect()]
    assert got == ["Apfel", "Äpfel", "Ärger", "Arm", "Zebra"]


def test_compare_at_strength_levels(spark):
    df = spark.createDataFrame([("côte", "COTE")], "a string, b string")
    row = df.select(
        compare_at_strength("a", F.col("b"), 1).alias("c1"),
        compare_at_strength("a", F.col("b"), 2).alias("c2"),
        compare_at_strength("a", F.col("b"), 3).alias("c3"),
        locale_compare_ignore_case("a", F.col("b")).alias("ci"),
    ).head()
    assert row.c1 == 0  # primary: base letters equal
    assert row.c2 != 0  # secondary: accent difference counts
    assert row.c3 != 0
    assert row.ci == row.c2


def test_collated_group_by_merges_case_variants(spark):
    df = spark.createDataFrame(
        [("Strasse",), ("STRASSE",), ("strasse",), ("weg",)], "s string"
    )
    out = {
        r.n
        for r in df.groupBy(collated("s", "UNICODE", 2).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {3, 1}


def test_ebcdic_sort_key_order_properties(spark):
    """EBCDIC collation inverts ASCII's case/digit order: space < lower
    < UPPER < digits (CCSID 037). Pin the canonical inversions."""
    from hpcc_platform_spark.functions.collation import ebcdic_sort_key

    df = spark.createDataFrame(
        [("a",), ("B",), ("1",), (" ",), ("z",), ("A",), ("9",)], "s string"
    )
    got = [r.s for r in df.orderBy(ebcdic_sort_key("s")).collect()]
    assert got == [" ", "a", "z", "A", "B", "1", "9"]
    # round-trip parity with Python's cp037 codec byte order
    import random
    rnd = random.Random(7)
    pool = [chr(i) for i in range(0x20, 0x7F)]
    words = ["".join(rnd.choice(pool) for _ in range(5)) for _ in range(40)]
    wdf = spark.createDataFrame([(w,) for w in words], "s string")
    spark_order = [r.s for r in wdf.orderBy(ebcdic_sort_key("s"), "s").collect()]
    py_order = sorted(words, key=lambda w: (w.encode("cp037"), w))
    assert spark_order == py_order
