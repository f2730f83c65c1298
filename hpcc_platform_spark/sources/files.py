"""File readers/writers with ECL-dialect options (SURVEY.md §2.1).

CSV options mirror the reference's ICsvParameters contract
(rtl/include/eclhelper.hpp:2109-2112: getQuote/getSeparator/getTerminator/
getEscape) onto Spark's csv reader options. XML/JSON row-tag reads mirror
TAKxmlread/TAKjsonread (:978, :1080) with the row-path idea mapping to
Spark's rowTag / multiLine JSON. Superfiles (IDistributedSuperFile,
dali/base/dadfs.hpp:493-497) are multi-path reads — Spark readers accept
path lists natively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: T.StructType | str | None = None,
    separator: str = ",",
    quote: str = '"',
    escape: str = "\\",
    terminator: str = "\n",
    header: bool = False,
) -> DataFrame:
    """CSV read (TAKcsvread :977; splitter csvsplitter.hpp:76-89).

    ECL dialect knobs → Spark options. ``terminator`` maps to lineSep
    (Spark supports 1-char line separators; the reference's multi-char
    terminators are not supported — split upstream if needed).
    """
    reader = (
        spark.read.option("sep", separator)
        .option("quote", quote)
        .option("escape", escape)
        .option("header", str(header).lower())
    )
    if terminator != "\n":
        reader = reader.option("lineSep", terminator)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    paths = [path] if isinstance(path, str) else list(path)
    return reader.csv(paths)


def write_csv(
    df: DataFrame,
    path: str,
    separator: str = ",",
    quote: str = '"',
    header: bool = False,
    mode: str = "overwrite",
) -> None:
    """CSV write (TAKcsvwrite :921)."""
    (
        df.write.mode(mode)
        .option("sep", separator)
        .option("quote", quote)
        .option("header", str(header).lower())
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str | Sequence[str],
    schema: T.StructType | str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON read (TAKjsonread :1080). multiline=True ≈ whole-file documents
    with a row path; default is JSON-lines."""
    reader = spark.read.option("multiLine", str(multiline).lower())
    if schema is not None:
        reader = reader.schema(schema)
    paths = [path] if isinstance(path, str) else list(path)
    return reader.json(paths)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON write (TAKjsonwrite :1079) — JSON-lines output."""
    df.write.mode(mode).json(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """XML read (TAKxmlread :978): the reference extracts rows at an XPath
    row tag (thorxmlread.cpp); Spark 4's built-in XML source uses rowTag.
    Gated: raises a clear error if the XML source is unavailable."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    try:
        return reader.load(path)
    except Exception as e:  # pragma: no cover - depends on Spark build
        raise RuntimeError(f"XML source unavailable in this Spark build: {e}") from e


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    compression: str | None = None,
) -> None:
    """Flat-file write (TAKdiskwrite :888) → parquet, optionally
    hive-partitioned (the Spark analogue of writing part files + DFS
    registration via Dali). ``compression`` maps ECL's OUTPUT,COMPRESSED
    (the reference LZW-compresses THOR files) onto parquet codecs —
    'zstd'/'snappy'/'gzip'/'none'; default inherits the session codec."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def read_superfile(spark: SparkSession, paths: Sequence[str]) -> DataFrame:
    """Superfile read (IDistributedSuperFile::addSubFile,
    dali/base/dadfs.hpp:493-497): a logical union-of-files container —
    multi-path parquet read; schemas are unioned by name."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)
