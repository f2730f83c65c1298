"""Fixed-width flat files — the reference's native THOR record layout.

Reference: ECL flat (THOR) files are fixed-length binary records with no
delimiters; the record width comes from the RECORD definition
(rtl/include/eclhelper.hpp IOutputMetaData::getRecordSize, fixed-size fast
path; disk read thorlcr/activities/diskread/). This module implements the
text analog: every line is one record, every field occupies a declared
byte range — substring slicing on read, pad/format on write.

Spark-first: reads lower to ``spark.read.text`` + JVM ``substring`` +
casts — fully codegen, filter/limit pushdown intact; a 100 TB fixed-width
read is a plain text scan with per-field slicing fused into the scan
projection. Writes format with ``rpad``/``lpad`` + ``concat`` and emit via
the text sink.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FixedField:
    """One field of a fixed-width layout: name, byte width, logical type
    ('string' | 'int' | 'long' | 'double' | 'date')."""

    name: str
    width: int
    ftype: str = "string"


class FixedLayout:
    """Ordered fixed-width record layout (the RECORD definition analog)."""

    def __init__(self, fields: Sequence[FixedField | tuple]):
        self.fields = [
            f if isinstance(f, FixedField) else FixedField(*f) for f in fields
        ]
        self.record_width = sum(f.width for f in self.fields)

    def _read_cols(self, line: F.Column) -> list[F.Column]:
        cols, pos = [], 1
        for f in self.fields:
            raw = F.substring(line, pos, f.width)
            pos += f.width
            if f.ftype == "string":
                c = F.rtrim(raw)
            elif f.ftype in ("int", "long"):
                # try_cast: a blank (NULL-written) field reads back as NULL
                # instead of an ANSI cast error.
                c = F.trim(raw).try_cast(f.ftype)
            elif f.ftype == "double":
                c = F.trim(raw).try_cast("double")
            elif f.ftype == "date":
                c = F.try_to_date(F.trim(raw), "yyyyMMdd")
            else:
                raise ValueError(f"unknown fixed-width type {f.ftype!r}")
            cols.append(c.alias(f.name))
        return cols

    def _write_col(self, df: DataFrame) -> F.Column:
        parts = []
        for f in self.fields:
            c = F.col(f.name)
            blank = F.lit(" " * f.width)
            def overflow_error(rendered: F.Column) -> F.Column:
                return F.raise_error(
                    F.concat(
                        F.lit(
                            f"fixed-width overflow: field {f.name!r} "
                            f"(width {f.width}) cannot hold value "
                        ),
                        rendered,
                    )
                )

            if f.ftype == "string":
                # String overflow truncates to width — the reference's
                # fixed-layout assignment semantics (rtlconst.hpp STRINGn).
                s = F.substring(F.rpad(F.coalesce(c, F.lit("")), f.width, " "), 1, f.width)
            elif f.ftype in ("int", "long"):
                # Zero-padded right-aligned digits (sortable, reversible).
                # Sign goes BEFORE the zero padding so '-42' in width 6 is
                # '-00042', not the unparseable '00-42'. Magnitude computed
                # in decimal(20,0): wide enough that abs(INT_MIN/LONG_MIN)
                # cannot hit ANSI ARITHMETIC_OVERFLOW.
                digits = F.abs(c.cast("decimal(20,0)")).cast("string")
                neg = c < 0
                # A truncated number reads back as a DIFFERENT valid number
                # (worse than any failure): numeric overflow raises.
                fits = F.length(digits) <= F.when(neg, F.lit(f.width - 1)).otherwise(
                    F.lit(f.width)
                )
                padded = F.when(
                    neg, F.concat(F.lit("-"), F.lpad(digits, f.width - 1, "0"))
                ).otherwise(F.lpad(digits, f.width, "0"))
                s = F.when(c.isNull(), blank).otherwise(
                    F.when(fits, padded).otherwise(overflow_error(c.cast("string")))
                )
            elif f.ftype == "double":
                # %.4f has no thousands grouping, so the value survives a
                # cast('double') on read (format_number inserts commas).
                rendered = F.format_string("%.4f", c)
                s = F.when(c.isNull(), blank).otherwise(
                    F.when(
                        F.length(rendered) <= f.width,
                        F.lpad(rendered, f.width, " "),
                    ).otherwise(overflow_error(rendered))
                )
            elif f.ftype == "date":
                if f.width < 8:
                    raise ValueError(
                        f"date field {f.name!r} needs width >= 8 (yyyyMMdd), got {f.width}"
                    )
                s = F.when(c.isNull(), blank).otherwise(
                    F.rpad(F.date_format(c, "yyyyMMdd"), f.width, " ")
                )
            else:
                raise ValueError(f"unknown fixed-width type {f.ftype!r}")
            parts.append(s)
        return F.concat(*parts)


def write_fixed_width(df: DataFrame, path: str, layout: FixedLayout) -> None:
    """Flat-file write in the declared fixed layout (TAKdiskwrite :888 for
    fixed records)."""
    df.select(layout._write_col(df).alias("value")).write.mode("overwrite").text(path)


def read_fixed_width(
    spark: SparkSession, path: str, layout: FixedLayout
) -> DataFrame:
    """Flat-file read (TAKdiskread :957, fixed-size record fast path):
    text scan + per-field substring/casts fused into the scan projection."""
    lines = spark.read.text(path)
    return lines.select(*layout._read_cols(F.col("value")))
