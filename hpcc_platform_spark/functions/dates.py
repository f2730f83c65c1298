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


def is_leap_year(year_col: Column | str) -> Column:
    """Std.Date.IsLeapYear (Date.ecl:220) — Gregorian rule."""
    y = F.col(year_col) if isinstance(year_col, str) else year_col
    return (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))


def day_of_year(col: Column | str) -> Column:
    """Std.Date.DayOfYear (Date.ecl:337) — 1-based ordinal day."""
    c = F.col(col) if isinstance(col, str) else col
    return F.dayofyear(c).cast("int")


def days_between(from_col: Column | str, to_col: Column | str) -> Column:
    """Std.Date.DaysBetween (Date.ecl:551) — signed whole days."""
    f = F.col(from_col) if isinstance(from_col, str) else from_col
    t = F.col(to_col) if isinstance(to_col, str) else to_col
    return F.datediff(t.cast("date"), f.cast("date")).cast("int")


def months_between_ecl(from_col: Column | str, to_col: Column | str) -> Column:
    """Std.Date.MonthsBetween (Date.ecl:523): whole calendar months,
    truncated toward zero (NOT Spark's fractional months_between)."""
    f = F.col(from_col) if isinstance(from_col, str) else from_col
    t = F.col(to_col) if isinstance(to_col, str) else to_col
    raw = (F.year(t) - F.year(f)) * 12 + (F.month(t) - F.month(f))
    # Back off one month when the day-of-month hasn't been reached yet.
    adj = F.when(
        (raw > 0) & (F.dayofmonth(t) < F.dayofmonth(f)), raw - 1
    ).when((raw < 0) & (F.dayofmonth(t) > F.dayofmonth(f)), raw + 1).otherwise(raw)
    return adj.cast("int")


def adjust_date(
    col: Column | str,
    years: int = 0,
    months: int = 0,
    days: int = 0,
) -> Column:
    """Std.Date.AdjustDate (Date.ecl:962): calendar-aware add of
    year/month/day deltas (month overflow clamps like the reference's
    underlying mktime normalization handled by add_months)."""
    c = F.col(col) if isinstance(col, str) else col
    out = c.cast("date")
    if years or months:
        out = F.add_months(out, years * 12 + months)
    if days:
        out = F.date_add(out, days)
    return out
