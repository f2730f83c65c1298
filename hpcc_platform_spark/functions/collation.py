"""Locale-aware Unicode collation (reference Std.Uni / unicodelib).

Re-expresses the ICU surface of ``plugins/unicodelib/unicodelib.cpp``
(UnicodeLocaleCompareAtStrength, UnicodeCompareAtStrength,
UnicodeLocaleCompareIgnoreCase — ``ecllibrary/std/Uni.ecl:193-243``) on
Spark 4's native collated string types: ``F.collate`` attaches an ICU
collation to a string column, after which ordinary comparisons, sorts,
joins and aggregations are collation-aware *inside the JVM* — no UDF, no
sort-key materialization, whole-stage codegen retained. Both Spark and
DuckDB bind the same ICU rules, so collated results are cross-engine
oracle-checkable (verified in tests).

ICU strength mapping (Std.Uni strength 1-5 → Spark collation specifier):
primary (1) ignores case + accents → ``_CI_AI``; secondary (2) considers
accents, ignores case → ``_CI``; tertiary (3+) is the full locale
collation. Strengths 4/5 (punctuation-variant handling) collapse to
tertiary — the reference's own docs call them out as rarely used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def collation_name(locale: str = "UNICODE", strength: int = 3) -> str:
    """Spark collation specifier for an ICU locale + Std.Uni strength."""
    if strength <= 1:
        return f"{locale}_CI_AI"
    if strength == 2:
        return f"{locale}_CI"
    return locale


def collated(col: str | Column, locale: str = "UNICODE", strength: int = 3) -> Column:
    """The column under the locale's ICU collation — comparisons, ORDER BY,
    GROUP BY and joins on the result are collation-aware, JVM-side."""
    return F.collate(F.col(col) if isinstance(col, str) else col,
                     collation_name(locale, strength))


def compare_at_strength(
    a: str | Column,
    b: str | Column,
    strength: int = 3,
    locale: str = "UNICODE",
) -> Column:
    """Std.Uni.CompareAtStrength / LocaleCompareAtStrength
    (unicodelib.cpp UnicodeLocaleCompareAtStrength): -1/0/1 ordering of two
    unicode strings under the locale at the given ICU strength."""
    ca = collated(a, locale, strength)
    cb = collated(b, locale, strength)
    return (
        F.when(ca < cb, F.lit(-1)).when(ca > cb, F.lit(1)).otherwise(F.lit(0))
    ).cast("int")


def locale_compare_ignore_case(
    a: str | Column, b: str | Column, locale: str = "UNICODE"
) -> Column:
    """Std.Uni.LocaleCompareIgnoreCase (Uni.ecl:225) — secondary strength."""
    return compare_at_strength(a, b, strength=2, locale=locale)


def collated_sort(
    df: DataFrame,
    col: str | Column,
    locale: str = "UNICODE",
    strength: int = 3,
    *tiebreak: str | Column,
) -> DataFrame:
    """Locale-collated global SORT: range-partitioned on the collated key
    (Spark's RangePartitioner compares under the collation), so it scales
    exactly like any other global sort — no sort-key UDF column."""
    return df.orderBy(collated(col, locale, strength), *tiebreak)


# --- EBCDIC collation (type_ebcdic rtlconst.hpp:79) -------------------------
# The reference compares EBCDIC STRINGn fields under EBCDIC code-point
# order (codec tables in rtl/eclrtl; CCSID 037). We build the sort key by
# translating each printable-ASCII char to the Unicode codepoint equal to
# its CP037 byte — UTF-8 and Spark/DuckDB string comparison both preserve
# codepoint order, so ordinary ORDER BY on the key IS the EBCDIC
# collation (lowercase < uppercase < digits, space below all of them).
_ASCII_PRINTABLE = "".join(chr(i) for i in range(0x20, 0x7F))
_EBCDIC_IMAGE = "".join(
    chr(c.encode("cp037")[0]) for c in _ASCII_PRINTABLE
)


def ebcdic_sort_key(col: str | Column) -> Column:
    """EBCDIC (CCSID 037) collation sort key for an ASCII string column.
    JVM-side translate, no UDF; ORDER BY the result to sort in EBCDIC
    order exactly as the reference compares EBCDIC records."""
    return F.translate(
        F.col(col) if isinstance(col, str) else col,
        _ASCII_PRINTABLE,
        _EBCDIC_IMAGE,
    )


def ebcdic_translate_sql(expr: str) -> str:
    """The equivalent ANSI/DuckDB SQL expression for ebcdic_sort_key —
    translate() over the same CP037 mapping, for oracle parity."""
    frm = _ASCII_PRINTABLE.replace("'", "''")
    to = _EBCDIC_IMAGE.replace("'", "''")
    return f"translate({expr}, '{frm}', '{to}')"
