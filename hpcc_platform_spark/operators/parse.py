"""PARSE — pattern matching over text fields (SURVEY.md §2.10).

Reference: ECL PARSE (TAKparse :934; ops no_parse/no_pat_*
ecl/hql/hqlexpr.hpp:496-560) matches a PATTERN/RULE algebra over text and
emits one row per match. The reference ships two engines: a regex-NFA
(common/thorhelper/thorrparse.cpp) and a Tomita GLR parser
(thortparse.cpp, codegen hqltomita.cpp).

Spark-first translation, two tiers:
1. The PATTERN algebra (literal / charset / seq / or / repeat / opt /
   named captures — the no_pat_* constructors) compiles to a single Python
   regex executed by an Arrow-batched ``mapInPandas`` scanner emitting one
   row per match with named captures and positions. This covers the
   regex-NFA engine's reach (the overwhelming majority of PARSE uses).
2. Full context-free RULE grammars (Tomita GLR) are out of scope for this
   tier — the extension point is the same mapInPandas contract with a GLR
   library in place of ``re``.

Everything is map-only: the scanner runs inside the scan stage, parallel
over partitions, no shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame


# --- PATTERN algebra (no_pat_* constructors) -------------------------------


@dataclass(frozen=True)
class Pattern:
    """Compiled-to-regex pattern node (ECL PATTERN)."""

    rx: str

    def __add__(self, other: "Pattern") -> "Pattern":  # seq (no_pat_follow)
        return Pattern(f"{self.rx}{other.rx}")

    def __or__(self, other: "Pattern") -> "Pattern":  # alt (no_pat_or)
        return Pattern(f"(?:{self.rx}|{other.rx})")


def pat_literal(s: str) -> Pattern:
    """PATTERN('text') — literal (no_pat_const)."""
    return Pattern(re.escape(s))


def pat_regex(rx: str) -> Pattern:
    """PATTERN('regex') — raw pattern passthrough."""
    return Pattern(f"(?:{rx})")


def pat_charset(chars: str, negate: bool = False) -> Pattern:
    """PATTERN(['a'..'z']) — character class (no_pat_set)."""
    return Pattern(f"[{'^' if negate else ''}{chars}]")


def pat_repeat(p: Pattern, lo: int = 0, hi: int | None = None) -> Pattern:
    """REPEAT(p, lo, hi) (no_pat_repeat); hi=None → unbounded."""
    return Pattern(f"(?:{p.rx}){{{lo},{'' if hi is None else hi}}}")


def pat_opt(p: Pattern) -> Pattern:
    """OPT(p) (no_pat_opt)."""
    return Pattern(f"(?:{p.rx})?")


def pat_capture(p: Pattern, name: str) -> Pattern:
    """name := p — named MATCHTEXT capture (no_pat_instance)."""
    return Pattern(f"(?P<{name}>{p.rx})")


TOKEN = pat_regex(r"\S+")
WORD = pat_regex(r"[A-Za-z]+")
NUMBER = pat_regex(r"\d+(?:\.\d+)?")
WS = pat_regex(r"\s+")


# --- the PARSE activity ----------------------------------------------------


def parse(
    df: DataFrame,
    text_col: str,
    pattern: Pattern,
    keep_cols: Sequence[str],
    max_matches: int | None = None,
) -> DataFrame:
    """PARSE(ds, text, pattern, TRANSFORM, SCAN) — one output row per
    (non-overlapping) match.

    Output schema: ``keep_cols`` + one string column per named capture in
    the pattern + ``match_text``, ``match_start`` (1-based char position,
    ECL MATCHPOSITION) + ``match_ord`` (1-based ordinal within the row).
    """
    capture_names = list(re.compile(pattern.rx).groupindex)
    out_schema = ", ".join(
        [*(f"{c} {_spark_type_of(df, c)}" for c in keep_cols)]
        + [f"{n} string" for n in capture_names]
        + ["match_text string", "match_start int", "match_ord int"]
    )
    rx_src = pattern.rx
    keep = list(keep_cols)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rx = re.compile(rx_src)
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                text = getattr(rec, text_col) or ""
                for ord_, m in enumerate(rx.finditer(text), start=1):
                    if max_matches and ord_ > max_matches:
                        break
                    rows.append(
                        tuple(getattr(rec, c) for c in keep)
                        + tuple(m.group(n) for n in capture_names)
                        + (m.group(0), m.start() + 1, ord_)
                    )
            cols = (
                keep
                + capture_names
                + ["match_text", "match_start", "match_ord"]
            )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(scan, schema=out_schema)


def _spark_type_of(df: DataFrame, col: str) -> str:
    return df.schema[col].dataType.simpleString()
