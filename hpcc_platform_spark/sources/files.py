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


# ---------------------------------------------------------------------------
# Reference-exact CSV stream splitter
# ---------------------------------------------------------------------------

_CSV_NONE, _CSV_WS, _CSV_SEP, _CSV_TERM, _CSV_QUOTE, _CSV_ESC = range(6)


def _csv_matcher(quotes, seps, terms, escapes, preserve_ws):
    """Token classifier mirroring CSVSplitter::init's action lists
    (common/thorhelper/csvsplitter.cpp:175-196): quotes, separators,
    terminators, escapes, then whitespace unless NOTRIM. Longest match
    wins within a class; classes are checked in registration order."""
    classes = [
        (_CSV_QUOTE, quotes), (_CSV_SEP, seps), (_CSV_TERM, terms),
        (_CSV_ESC, escapes),
    ]
    if not preserve_ws:
        classes.append((_CSV_WS, [" ", "\t"]))

    def match(text, i):
        best = (_CSV_NONE, 0)
        for kind, toks in classes:
            for t in toks:
                if t and text.startswith(t, i) and len(t) > best[1]:
                    best = (kind, len(t))
        return best

    return match


def ecl_csv_split(
    text,
    quotes=('"',),
    seps=(",",),
    terms=("\n", "\r\n"),
    escapes=(),
    preserve_ws=False,
    max_cols=None,
):
    """Split a CSV byte stream into records of fields — a faithful port
    of CSVSplitter::splitLine + setFieldRange
    (common/thorhelper/csvsplitter.cpp:333-398, :197-305): a quote
    opens only at field start; a matching quote followed by a doubled
    quote stays literal; after a close, trailing content appends to the
    field; terminators inside quotes do NOT end the record; leading and
    trailing whitespace trims outside quotes unless NOTRIM; escapes
    protect the next token. csvoptions.ecl pins the corner cases."""
    match = _csv_matcher(
        list(quotes), list(seps), list(terms), list(escapes), preserve_ws
    )
    rows, fields = [], []
    n = len(text)
    i = 0
    first_good = last_good = 0
    quote_open = False
    open_tok = None  # the exact quote token that opened the region:
    # CSVSplitter::splitLine only closes on the SAME quote (quote ==
    # match); a different configured quote char inside is literal
    quote_to_strip = False
    saw_escape = False

    def emit_field():
        nonlocal first_good, last_good, quote_to_strip, saw_escape
        raw = text[first_good:last_good]
        if quote_to_strip or saw_escape:
            out = []
            j = 0
            while j < len(raw):
                k, ln = match(raw, j)
                if k == _CSV_ESC and j + ln < len(raw):
                    _k2, ln2 = match(raw, j + ln)
                    if ln2 == 0:
                        ln2 = 1
                    out.append(raw[j + ln : j + ln + ln2])
                    j += ln + ln2
                    continue
                if k == _CSV_QUOTE and quote_to_strip:
                    _k2, ln2 = match(raw, j + ln)
                    if _k2 == _CSV_QUOTE:
                        out.append(raw[j : j + ln])
                        j += ln + ln2
                        continue
                out.append(raw[j])
                j += 1
            raw = "".join(out)
        fields.append(raw)
        quote_to_strip = False
        saw_escape = False

    while i < n:
        kind, mlen = match(text, i)
        if kind == _CSV_NONE:
            i += 1
            last_good = i
            continue
        if kind == _CSV_WS:
            if quote_open:
                last_good = i + mlen
            elif i == first_good:
                first_good = last_good = i + mlen
            i += mlen
            continue
        if kind == _CSV_SEP:
            if not quote_open and (
                max_cols is None or len(fields) < max_cols
            ):
                emit_field()
                first_good = i + mlen
            last_good = i + mlen
            i += mlen
            continue
        if kind == _CSV_TERM:
            if not quote_open:
                emit_field()
                rows.append(fields)
                fields = []
                first_good = last_good = i + mlen
            else:
                last_good = i + mlen
            i += mlen
            continue
        if kind == _CSV_QUOTE:
            if not quote_open:
                if i == first_good:
                    quote_open = True
                    open_tok = text[i : i + mlen]
                    first_good = i + mlen
                last_good = i + mlen
            elif text[i : i + mlen] != open_tok:
                # a DIFFERENT quote token inside an open region is
                # ordinary content (splitLine: quote == match only)
                last_good = i + mlen
            else:
                k2, ln2 = match(text, i + mlen)
                if k2 == _CSV_QUOTE and text.startswith(
                    open_tok, i + mlen
                ):
                    quote_to_strip = True
                    mlen += ln2
                    last_good = i + mlen
                else:
                    quote_open = False
                    open_tok = None
            i += mlen
            continue
        if kind == _CSV_ESC:
            saw_escape = True
            last_good = i + mlen
            if last_good == n:
                i += mlen
                continue
            i += mlen
            k2, ln2 = match(text, i)
            if k2 == _CSV_NONE:
                ln2 = 1
            last_good = i + ln2
            i += ln2
            continue
    if first_good != last_good or fields:
        emit_field()
        rows.append(fields)
    return rows
