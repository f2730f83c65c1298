"""Unicode functions (SURVEY.md §2.9): Std.Uni — normalization, accent
stripping, case folding.

Reference: ecllibrary/std/Uni.ecl (46 exports), plugins/unicodelib/ (ICU).

Spark has no built-in Unicode normalization, so these are Arrow-batched
pandas UDFs over Python's stdlib ``unicodedata`` — the one place in the
scalar library where the reference's ICU plugin maps to the Python slow
path. Collation-aware sorts (Spark 4 collations) cover the ordering half of
Uni; these cover the transform half.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (Uni.CleanAccents sibling; ICU unorm)."""
    return s.map(lambda x: None if x is None else unicodedata.normalize("NFC", x))


@pandas_udf("string")
def strip_accents(s: pd.Series) -> pd.Series:
    """Remove combining marks: NFD-decompose then drop Mn category — the
    classic accent fold (Ã©tÃ© → ete)."""

    def _strip(x: str | None) -> str | None:
        if x is None:
            return None
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", x)
            if unicodedata.category(ch) != "Mn"
        )

    return s.map(_strip)


@pandas_udf("string")
def casefold(s: pd.Series) -> pd.Series:
    """Full Unicode case folding (stricter than lower: ÃŸ → ss)."""
    return s.map(lambda x: None if x is None else x.casefold())
