"""The reference's own benchmark definitions, scaled down as self-checks
(BASELINE.md): thorbench1 micro-ops (thorbench1.ecl:62-110) and the
terasort order-verification (terasort.ecl) — generation, filter-count,
write/read roundtrip, copy, global sort + verify, hash distribute +
co-locality verification."""

from __future__ import annotations

from pyspark.sql import functions as F

N = 200_000


def _gen(spark):
    # {key, node, payload} row shape per thorbench1.ecl:36-41, scaled.
    return spark.range(N).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("key"),
        (F.col("id") % 32).cast("int").alias("node"),
        F.repeat(F.lit("x"), 40).alias("payload"),
    )


def test_thorbench_gen_filter_count(spark):
    df = _gen(spark)
    n = df.where(F.col("key").startswith("a")).count()
    # md5 hex first char uniform over 16 symbols -> ~1/16 of rows
    assert abs(n - N / 16) < N / 16 * 0.2


def test_thorbench_write_read_copy(spark, tmp_path):
    df = _gen(spark)
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    df.write.mode("overwrite").parquet(p1)
    back = spark.read.parquet(p1)
    assert back.count() == N
    back.write.mode("overwrite").parquet(p2)  # read + rewrite (copy)
    assert spark.read.parquet(p2).count() == N


def test_thorbench_sort_and_verify(spark):
    df = _gen(spark).orderBy("key")
    import pandas as pd

    def check(pdfs):
        ok, first, last, cnt = True, None, None, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            ok = ok and bool(pdf["key"].is_monotonic_increasing)
            first = pdf["key"].iloc[0] if first is None else first
            last = pdf["key"].iloc[-1]
            cnt += len(pdf)
        yield pd.DataFrame({"ok": [ok], "first": [first], "last": [last], "cnt": [cnt]})

    parts = [r for r in df.mapInPandas(check, "ok boolean, first string, last string, cnt long").collect() if r.cnt]
    parts.sort(key=lambda r: r.first)
    assert all(r.ok for r in parts)
    assert all(parts[i].last <= parts[i + 1].first for i in range(len(parts) - 1))
    assert sum(r.cnt for r in parts) == N


def test_thorbench_distribute_colocality(spark):
    # DISTRIBUTE(HASH(key)) + verify co-location: after repartition by key,
    # every key's rows sit in exactly one partition (thorbench1.ecl:104-110).
    df = _gen(spark).repartition(16, "node")
    spread = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("node")
        .agg(F.countDistinct("pid").alias("npart"))
    )
    assert spread.where(F.col("npart") > 1).count() == 0
