"""Phonetic keys (SURVEY.md §2.9: Std.Metaphone, plugins/dmetaphone in the
reference).

Two tiers, matching the reference's plugin shape:
- ``soundex_key`` — Spark's built-in soundex (JVM, codegen'd): the fast
  default for phonetic blocking at 100 TB.
- ``metaphone_key`` — a simplified metaphone (consonant-class canonical
  form) as a vectorized expression chain; captures the blocking behavior
  (similar-sounding names collide) without the full dmetaphone rule table,
  which would slot in here as a Pandas UDF if exactness to the plugin is
  ever required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def soundex_key(col: Column | str) -> Column:
    """Std soundex over the alphabetic characters of the input."""
    c = F.col(col) if isinstance(col, str) else col
    return F.soundex(F.regexp_replace(c, "[^A-Za-z]", ""))


def metaphone_key(col: Column | str, max_len: int = 8) -> Column:
    """Simplified metaphone: uppercase → drop non-alpha → apply the core
    metaphone consonant mappings → drop non-initial vowels → collapse runs.

    Deterministic, vectorized (regexp chain, no UDF). Not the full
    dmetaphone rule table — a documented simplification.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.upper(F.regexp_replace(c, "[^A-Za-z]", ""))
    # Core digraph/consonant mappings (subset of metaphone's rules).
    s = F.regexp_replace(s, "PH", "F")
    s = F.regexp_replace(s, "GH", "H")
    s = F.regexp_replace(s, "CK", "K")
    s = F.regexp_replace(s, "SCH", "SK")
    s = F.regexp_replace(s, "TH", "0")
    s = F.regexp_replace(s, "SH", "X")
    s = F.regexp_replace(s, "C([IEY])", "S$1")
    s = F.regexp_replace(s, "C", "K")
    s = F.regexp_replace(s, "Q", "K")
    s = F.regexp_replace(s, "X", "KS")
    s = F.regexp_replace(s, "Z", "S")
    s = F.regexp_replace(s, "W|Y", "")
    # Keep the first character; drop vowels elsewhere; collapse repeats.
    head = F.substring(s, 1, 1)
    tail = F.regexp_replace(F.substring(s, 2, 1_000_000), "[AEIOU]", "")
    joined = F.concat(head, tail)
    collapsed = F.regexp_replace(joined, r"(.)\1+", "$1")
    return F.substring(collapsed, 1, max_len)
