"""Std.Date codecs (ecllibrary/std/Date.ecl in the reference).

The reference stores dates as plain integers: Date_t = UNSIGNED4 holding
YYYYMMDD (Date.ecl:23), Time_t = UNSIGNED3 holding HHMMSS (:39). These
codecs convert between the int encodings and Spark's DateType/Timestamp so
pipelines that persist ECL-style ints interoperate with native date logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_to_int(col: Column | str) -> Column:
    """DateType → YYYYMMDD int (Std.Date Date_t encoding)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def int_to_date(col: Column | str) -> Column:
    """YYYYMMDD int → DateType (Std.Date FromGregorianYMD, Date.ecl:247)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.make_date(
        (c / 10000).cast("int"), ((c % 10000) / 100).cast("int"), (c % 100).cast("int")
    )


def time_to_int(col: Column | str) -> Column:
    """TimestampType → HHMMSS int (Std.Date Time_t encoding, Date.ecl:39)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.hour(c) * 10000 + F.minute(c) * 100 + F.second(c)).cast("int")
