"""Scalar-function wrappers not covered by the SQL oracle: phonetics,
engine-internal hashes."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.functions.hashing import ecl_hash32, ecl_hash64
from hpcc_platform_spark.functions.phonetic import metaphone_key, soundex_key


def test_soundex_blocks_similar_names(spark):
    df = spark.createDataFrame(
        [("Robert",), ("Rupert",), ("Smith",), ("Smyth",), ("Jones",)], "name string"
    )
    got = dict(
        (r.name, r.sdx) for r in df.select("name", soundex_key("name").alias("sdx")).collect()
    )
    assert got["Robert"] == got["Rupert"] == "R163"
    assert got["Smith"] == got["Smyth"]
    assert got["Jones"] != got["Smith"]


def test_metaphone_key_properties(spark):
    df = spark.createDataFrame(
        [("Philip",), ("Filip",), ("Catherine",), ("Katherine",), ("Zachary",)],
        "name string",
    )
    got = dict(
        (r.name, r.mk)
        for r in df.select("name", metaphone_key("name").alias("mk")).collect()
    )
    assert got["Philip"] == got["Filip"]  # PH→F
    assert got["Catherine"] == got["Katherine"]  # C→K before A
    assert got["Zachary"].startswith("S")  # Z→S
    # Deterministic non-empty keys.
    assert all(v for v in got.values())


def test_engine_hashes_stable_and_distributing(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    out = df.select(
        ecl_hash32("k").alias("h32"), ecl_hash64("k").alias("h64")
    ).collect()
    h64s = {r.h64 for r in out}
    assert len(h64s) == 1000  # no collisions on 1k keys
    again = df.select(ecl_hash64("k").alias("h64")).collect()
    assert [r.h64 for r in again] == [r.h64 for r in out]  # stable across runs


def test_unicode_strip_accents_and_nfc(spark):
    import unicodedata

    from pyspark.sql import functions as F

    from hpcc_platform_spark.functions.unicode import (
        casefold,
        nfc_normalize,
        strip_accents,
    )

    # NFD input (decomposed e + combining acute) must NFC-fold to é and
    # accent-strip to plain e; ß casefolds to ss.
    decomposed = "été Straße"
    df = spark.createDataFrame([(decomposed,)], "s string")
    row = df.select(
        nfc_normalize(F.col("s")).alias("nfc"),
        strip_accents(F.col("s")).alias("plain"),
        casefold(F.col("s")).alias("folded"),
    ).head()
    assert row.nfc == unicodedata.normalize("NFC", decomposed) == "été Straße"
    assert row.plain == "ete Straße"
    assert row.folded == "été strasse"


def test_benford_profile_sums_to_one(spark, sf_dir):
    from hpcc_platform_spark.functions.profile import benford_first_digit

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = benford_first_digit(orders, "o_totalprice").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.observed_freq for r in rows) - 1.0) < 0.01
    assert abs(sum(r.expected_freq for r in rows) - 1.0) < 0.01


def test_months_between_ecl_whole_months(spark):
    from pyspark.sql import functions as F

    from hpcc_platform_spark.functions.dates import months_between_ecl

    cases = [
        ("2024-01-15", "2024-03-15", 2),   # exact anniversaries
        ("2024-01-15", "2024-03-14", 1),   # day not reached -> truncate
        ("2024-03-15", "2024-01-16", -1),  # negative, truncated toward zero
        ("2024-01-31", "2024-02-29", 0),   # leap February, day short of 31
    ]
    df = spark.createDataFrame(cases, "f string, t string, expect int")
    rows = df.select(
        months_between_ecl(F.col("f").cast("date"), F.col("t").cast("date")).alias("m"),
        "expect",
    ).collect()
    for r in rows:
        assert r.m == r.expect, (r.m, r.expect)


def test_eclhash_reference_exact_values():
    """The parity hash family reproduces the reference's values
    bit-for-bit (pinned by testing/regress/ecl/key/hash.xml)."""
    from hpcc_platform_spark.functions.eclhash import (
        ecl_crc,
        fnv1_32,
        fnv1_64,
        jenkins_hash,
    )

    assert jenkins_hash(0) == 1447026491
    assert jenkins_hash(1234567890) == 39649401
    assert jenkins_hash("abcdefghijklmnopqrstuvwxyz") == 3308244712
    assert fnv1_64(0) == 12161962213042174405
    assert fnv1_64("abcdefghijklmnopqrstuvwxyz") == 6009962005348432088
    assert ecl_crc(0) == 0
    assert ecl_crc(1234567890) == 1299951406
    assert ecl_crc("abcdefghijklmnopqrstuvwxyz") == 3821792911
    assert fnv1_32("") == 0x811C9DC5  # init value on empty input


def test_eclhash_column_forms_match_python(spark):
    from pyspark.sql import functions as F

    from hpcc_platform_spark.functions import eclhash as EH

    df = spark.range(1, 50).select(F.col("id").alias("v"))
    rows = df.select(
        "v",
        EH.fnv1_32_col(F.col("v")).alias("h32"),
        EH.fnv1_64_col(F.col("v")).alias("h64"),
        EH.jenkins_col(F.col("v")).alias("hj"),
        EH.ecl_crc_col(F.col("v")).alias("hc"),
    ).collect()
    for r in rows:
        assert r.h32 == EH.fnv1_32(r.v)
        h64 = EH.fnv1_64(r.v)
        assert r.h64 == (h64 - (1 << 64) if h64 >= 1 << 63 else h64)
        assert r.hj == EH.jenkins_hash(r.v)
        assert r.hc == EH.ecl_crc(r.v)
