"""ECL record/type layer behavior (SURVEY §1.2): fixed-width padding,
unsigned widths, decimals, nesting."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import types as T

from hpcc_platform_spark.schema import Field, RecordDef, fixed_eq


def test_spark_type_mapping():
    rec = RecordDef(
        [
            Field("flag", "boolean"),
            Field("tiny", "integer1"),
            Field("big", "unsigned8"),
            Field("price", "decimal10_2"),
            Field("name", "string10"),
            Field("tags", "set of string"),
        ]
    )
    st = rec.spark_type()
    assert st["flag"].dataType == T.BooleanType()
    assert st["tiny"].dataType == T.ByteType()
    assert st["big"].dataType == T.DecimalType(20, 0)
    assert st["price"].dataType == T.DecimalType(10, 2)
    assert st["name"].dataType == T.StringType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())


def test_nested_child_dataset():
    book = RecordDef([Field("title", "string"), Field("rating", "unsigned1")])
    person = RecordDef([Field("pname", "string20"), Field("books", "", child=book)])
    st = person.spark_type()
    assert isinstance(st["books"].dataType, T.ArrayType)
    assert st["books"].dataType.elementType["rating"].dataType == T.ShortType()


def test_coerce_fixed_width_and_qstring(spark):
    rec = RecordDef(
        [Field("code", "string5"), Field("tag", "qstring4"), Field("n", "unsigned2")]
    )
    df = spark.createDataFrame(
        [("abcdefgh", "mix", "7"), ("xy", "lower", "300000")],
        "code string, tag string, n string",
    )
    rows = rec.coerce(df).collect()
    assert rows[0].code == "abcde"  # truncated to width
    assert rows[1].code == "xy   "  # blank-padded to width
    assert rows[0].tag == "MIX "  # uppercased + padded
    assert rows[0].n == 7 and isinstance(rows[0].n, int)


def test_unsigned8_holds_beyond_long(spark):
    rec = RecordDef([Field("u", "unsigned8")])
    df = spark.createDataFrame([("18446744073709551615",)], "u string")
    got = rec.coerce(df).head().u
    assert got == Decimal(2**64 - 1)


def test_fixed_eq_ignores_trailing_blanks(spark):
    df = spark.createDataFrame([("ab   ", "ab"), ("ab", "ac")], "a string, b string")
    got = [r.eq for r in df.select(fixed_eq("a", "b").alias("eq")).collect()]
    assert got == [True, False]
