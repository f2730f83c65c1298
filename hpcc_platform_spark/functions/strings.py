"""Std.Str surface (ecllibrary/std/Str.ecl in the reference) — wrappers for
the entries that need glue beyond a 1:1 F.* rename (the full mapping table
is SURVEY.md §2.9).
"""

from __future__ import annotations

import re

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


def count_words(col: Column | str, sep: str = " ") -> Column:
    """Std.Str.CountWords (Str.ecl:277) — word count under a separator,
    blanks not counted."""
    return F.size(F.filter(F.split(_c(col), re.escape(sep)), lambda w: w != "")).cast(
        "int"
    )


def get_nth_word(col: Column | str, n: int) -> Column:
    """Std.Str.GetNthWord (Str.ecl:348) — 1-based nth word ('' past end)."""
    words = F.filter(F.split(_c(col), r"\s+"), lambda w: w != "")
    return F.coalesce(F.element_at(words, n), F.lit(""))


def starts_with(col: Column | str, prefix: str) -> Column:
    """Std.Str.StartsWith (Str.ecl:236)."""
    return F.startswith(_c(col), F.lit(prefix))


def ends_with(col: Column | str, suffix: str) -> Column:
    """Std.Str.EndsWith (Str.ecl companion of :236)."""
    return F.endswith(_c(col), F.lit(suffix))


def filter_chars(col: Column | str, keep: str) -> Column:
    """Std.Str.Filter — keep only the characters in ``keep`` (the
    reference's StringFilter, plugins/stringlib)."""
    return F.regexp_replace(_c(col), f"[^{re.escape(keep)}]", "")


def repeat_str(col: Column | str, n: int) -> Column:
    """Std.Str.Repeat — concatenate n copies."""
    return F.repeat(_c(col), n)
