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


def test_ebcdic_decode_roundtrip(spark):
    from hpcc_platform_spark.schema import ebcdic_to_string

    texts = ["HELLO", "Wörld & Co", "1234567890", "a-b/c.d"]
    df = spark.createDataFrame(
        [(t, bytearray(t.encode("cp037"))) for t in texts], "expect string, raw binary"
    )
    rows = df.select("expect", ebcdic_to_string("raw").alias("got")).collect()
    for r in rows:
        assert r.got == r.expect


def test_bitfield_extract_all_fields(spark):
    from hpcc_platform_spark.schema import bitfield_extract

    packed = 0b101_0110_11111111
    df = spark.createDataFrame([(packed,)], "p long")
    row = df.select(
        bitfield_extract("p", 0, 8).alias("low"),
        bitfield_extract("p", 8, 4).alias("mid"),
        bitfield_extract("p", 12, 3).alias("high"),
    ).head()
    assert (row.low, row.mid, row.high) == (0b11111111, 0b0110, 0b101)


def test_enum_decode_default_and_ifblock_nulls(spark):
    from pyspark.sql import functions as F

    from hpcc_platform_spark.schema import enum_decode, ifblock

    df = spark.createDataFrame([(1,), (9,)], "code int")
    rows = df.select(
        enum_decode("code", {1: "one"}, "other").alias("s"),
        *ifblock(F.col("code") == 1, extra=F.lit("present")),
    ).collect()
    got = {(r.s, r.extra) for r in rows}
    assert got == {("one", "present"), ("other", None)}


def test_translation_modes(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from hpcc_platform_spark.sources import read_translated

    path = str(tmp_path / "gen")
    spark.range(10).select(
        F.col("id").cast("int").alias("k"),
        F.lit("x").alias("extra"),
        F.col("id").cast("float").alias("v"),
    ).write.parquet(path)

    # Payload: widen k, drop extra, NULL-fill added
    out = read_translated(spark, path, "k bigint, v double, added string")
    assert out.schema.simpleString() == "struct<k:bigint,v:double,added:string>"
    assert out.where(F.col("added").isNull()).count() == 10

    # remove_only: dropping 'extra' is fine; a missing declared field raises
    ok = read_translated(spark, path, "k bigint, v double", mode="remove_only")
    assert ok.count() == 10
    with pytest.raises(ValueError, match="missing from disk"):
        read_translated(spark, path, "k bigint, nope int", mode="remove_only")

    # none: exact match required
    with pytest.raises(ValueError, match="layout mismatch"):
        read_translated(spark, path, "k bigint, v double", mode="none")
    exact = read_translated(spark, path, "k int, extra string, v float", mode="none")
    assert exact.count() == 10

    # narrowing refused
    with pytest.raises(ValueError, match="not a lossless widening"):
        read_translated(spark, path, "k smallint, v double, extra string")


def test_alien_type_codec_roundtrip(spark):
    """type_alien (rtlconst.hpp:52): a registered TYPE module's
    LOAD/STORE codec pair applies at ingest and store — here a
    zero-padded reversed-digits physical form for an integer."""
    from pyspark.sql import functions as F

    from hpcc_platform_spark.schema import (
        Field,
        RecordDef,
        alien_load,
        alien_store,
        register_alien_type,
    )
    import pyspark.sql.types as T

    register_alien_type(
        "revnum",
        load=lambda c: F.reverse(c).cast("long"),
        store=lambda c: F.reverse(F.lpad(c.cast("string"), 6, "0")),
        logical_type=T.LongType(),
    )
    df = spark.createDataFrame([("321000",), ("540000",)], "v string")
    loaded = df.select(alien_load("revnum", "v").alias("v"))
    assert [r.v for r in loaded.collect()] == [123, 45]
    stored = loaded.select(alien_store("revnum", "v").alias("v"))
    assert [r.v for r in stored.collect()] == ["321000", "540000"]
    # record-level: a field declared alien:<name> decodes on coerce
    rec = RecordDef([Field("v", "alien:revnum")])
    assert rec.spark_type()["v"].dataType == T.LongType()
    out = rec.coerce(df)
    assert [r.v for r in out.collect()] == [123, 45]
