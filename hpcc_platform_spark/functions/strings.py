"""Std.Str surface (ecllibrary/std/Str.ecl in the reference) — wrappers for
the entries that need glue beyond a 1:1 F.* rename (the full mapping table
is SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_spaces(col: Column | str) -> Column:
    """Std.Str.CleanSpaces (Str.ecl:225): collapse runs of whitespace to a
    single space and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def split_words(col: Column | str) -> Column:
    """Std.Str.SplitWords (Str.ecl:288): whitespace-split, no empties."""
    return F.filter(F.split(_c(col), r"\s+"), lambda w: w != "")


def find_replace(col: Column | str, target: str, replacement: str) -> Column:
    """Std.Str.FindReplace (Str.ecl:205) — literal (non-regex) replace."""
    return F.replace(_c(col), F.lit(target), F.lit(replacement))


def edit_distance(a: Column | str, b: Column | str) -> Column:
    """Std.Str.EditDistance (Str.ecl:313) → levenshtein."""
    return F.levenshtein(_c(a), _c(b))


def wild_match(col: Column | str, pattern: str, nocase: bool = False) -> Column:
    """Std.Str.WildMatch (Str.ecl:75): '*'/'?' glob → LIKE '%'/'_'.

    Glob metachars translate; LIKE specials in the pattern are escaped.
    """
    like = (
        pattern.replace("\\", "\\\\")
        .replace("%", "\\%")
        .replace("_", "\\_")
        .replace("*", "%")
        .replace("?", "_")
    )
    c = _c(col)
    if nocase:
        return F.upper(c).like(like.upper())
    return c.like(like)
