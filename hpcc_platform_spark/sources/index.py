"""INDEX build/read (SURVEY.md §2.1): the reference's B+tree indexes
(system/jhtree/) re-expressed as sorted, partitioned parquet with min/max
statistics.

Why this is the right mapping: an HPCC INDEX is (a) globally sorted on the
keyed fields, (b) range-partitioned into parts, (c) consulted via KEYED
range filters with bloom filters (jhtree.hpp:44-58, bloom.hpp:33-146).
Parquet gives (a) within files via sort, (b) via repartitionByRange, and
(c) via row-group min/max + optional bloom filters + partition pruning —
Catalyst pushes KEYED-style predicates into the scan automatically.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

_META_FILE = "_hpcc_index_meta.json"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p, p.getFileSystem(spark._jsc.hadoopConfiguration())


def _write_index_meta(spark: SparkSession, path: str, meta: dict) -> None:
    """Persist the key layout next to the parts (underscore-prefixed files
    are invisible to Spark's parquet listing). Hadoop FS API, not local
    open(): the same code works on hdfs:// and s3a:// paths."""
    p, fs = _hadoop_path(spark, f"{path}/{_META_FILE}")
    out = fs.create(p, True)
    out.write(bytearray(json.dumps(meta).encode()))
    out.close()


def _read_index_meta(spark: SparkSession, path: str) -> dict | None:
    p, fs = _hadoop_path(spark, f"{path}/{_META_FILE}")
    if not fs.exists(p):
        return None  # pre-metadata index: no validation possible
    stream = fs.open(p)
    try:
        text = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def build_index(
    df: DataFrame,
    path: str,
    keyed: Sequence[str],
    n_parts: int | None = None,
    bloom_cols: Sequence[str] | None = None,
) -> None:
    """INDEX build (TAKindexwrite :923; keybuild.cpp): global sort by the
    keyed fields → range-partitioned sorted parquet parts.

    Parquet writes min/max stats per row group for free; ``bloom_cols``
    additionally enables parquet bloom filters (the analogue of the
    reference's index blooms, system/jhtree/bloom.hpp:33-146) for
    high-cardinality point lookups on non-leading keys. Note parquet
    skips the bloom for fully dictionary-encoded (low-NDV) columns — the
    dictionary page already gives an exact row-group filter there, which
    mirrors why the reference only builds blooms for selective fields
    (bloom.hpp BloomBuilder limits). The key
    layout is persisted alongside the parts so reads can validate KEYED
    clauses against it (the reference stores it in the index header,
    jhtree.hpp KeyHdr).
    """
    parted = (
        df.repartitionByRange(n_parts, *keyed) if n_parts else df.repartitionByRange(*keyed)
    )
    writer = parted.sortWithinPartitions(*keyed).write.mode("overwrite")
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(path)
    _write_index_meta(
        df.sparkSession, path, {"keyed": list(keyed), "bloom": list(bloom_cols or [])}
    )


def _filter_references(df: DataFrame, flt: Column) -> set[str]:
    """Column names referenced by a filter, from the analyzed plan (the
    unresolved Column expression has no references yet)."""
    plan = df.where(flt)._jdf.queryExecution().analyzed()
    seq = plan.references().toSeq()
    return {seq.apply(i).name() for i in range(seq.size())}


def read_index(
    spark: SparkSession,
    path: str,
    keyed_filter: Column | None = None,
    columns: Sequence[str] | None = None,
    wild: Sequence[str] = (),
    payload_filter: Column | None = None,
) -> DataFrame:
    """INDEX read (TAKindexread :963 + fused filter/project variants
    :964-968): scan with KEYED ranges pushed into the parquet reader.

    ``keyed_filter`` is validated against the key layout persisted at build
    time, the way the reference validates KEYED/WILD clauses when building
    segment monitors (ecl/hqlcpp/hqlcfilter.hpp:64 buildSegments,
    hqlsource.cpp:3072-3112):

    - every field it references must be a keyed field (payload predicates
      go in ``payload_filter`` — still applied, still Catalyst-pushed, but
      they don't pretend to drive index seeks);
    - the referenced keyed fields must form a contiguous prefix of the key
      layout; a skipped leading field must be named in ``wild`` (ECL
      WILD()) to acknowledge the post-seek scan it implies.

    Indexes built before the metadata existed validate nothing (legacy
    pass-through). The returned plan shows PushedFilters — the Spark form
    of the reference's segment monitors (rtl/eclrtl/rtlkey.hpp) — and
    prunes row groups via the stats written at build time.
    """
    df = spark.read.parquet(path)
    if keyed_filter is not None:
        meta = _read_index_meta(spark, path)
        if meta is not None:
            keyed: list[str] = meta["keyed"]
            refs = _filter_references(df, keyed_filter)
            non_keyed = sorted(refs - set(keyed))
            if non_keyed:
                raise ValueError(
                    f"KEYED filter references non-keyed field(s) {non_keyed}; "
                    f"index key layout is {keyed}. Move payload predicates to "
                    "payload_filter="
                )
            if refs:
                last = max(keyed.index(r) for r in refs)
                skipped = [
                    k
                    for k in keyed[:last]
                    if k not in refs and k not in set(wild)
                ]
                if skipped:
                    raise ValueError(
                        f"KEYED filter skips leading key field(s) {skipped} "
                        f"(key layout {keyed}); declare them in wild= (ECL "
                        "WILD) to acknowledge the scan"
                    )
        df = df.where(keyed_filter)
    if payload_filter is not None:
        df = df.where(payload_filter)
    if columns:
        df = df.select(*columns)
    return df


# --- Fused scan-level aggregation (TAKindexcount :966, TAKindexaggregate
# :965, TAKindexgroupaggregate :967 — aggregation pushed INTO the index
# read, eclhelper.hpp:957-968). Spark analogue: parquet aggregate
# pushdown answers COUNT/MIN/MAX from row-group footers without reading
# data pages — the same "the index header already knows this" shortcut
# jhtree takes. Requires the V2 parquet reader and no data filters, so
# the helpers scope both confs and materialize inside the scope.
from contextlib import contextmanager


@contextmanager
def _v2_agg_pushdown(spark: SparkSession):
    saved = {
        "spark.sql.sources.useV1SourceList": spark.conf.get(
            "spark.sql.sources.useV1SourceList"
        ),
        "spark.sql.parquet.aggregatePushdown": spark.conf.get(
            "spark.sql.parquet.aggregatePushdown"
        ),
    }
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        yield
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def scan_count(spark: SparkSession, path: str) -> int:
    """COUNT answered from parquet footers (TAKindexcount :966) — the
    plan's scan output IS count(*); zero data pages read."""
    with _v2_agg_pushdown(spark):
        return spark.read.parquet(path).groupBy().count().collect()[0][0]


def scan_min_max(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> dict[str, tuple]:
    """Per-column (min, max) answered from footers (TAKindexaggregate
    :965). Returns {col: (min, max)}."""
    from pyspark.sql import functions as F

    with _v2_agg_pushdown(spark):
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"mn_{c}"), F.max(c).alias(f"mx_{c}")]
        row = spark.read.parquet(path).agg(*aggs).collect()[0]
        return {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}
