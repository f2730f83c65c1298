"""Smart-stepping text-search coverage (SURVEY.md §2.3 n-way stepped joins,
§4.3 item 4) — AND / LEFT ONLY / M-of-N / proximity / phrase over the
inverted word index built from documents."""

from __future__ import annotations

from hpcc_platform_spark.operators.textsearch import (
    build_inverted_index,
    search_and,
    search_and_left,
    search_m_of_n,
    search_phrase,
    search_proximity,
)
from hpcc_platform_spark.queries.registry import query, tables

_WORDS_CTE = """
    WITH words AS (
      SELECT doc_id AS doc,
             unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS word,
             CAST(unnest(range(1, len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) + 1)) AS INT) AS wpos
      FROM documents
    )
"""


def _index(spark, sf_dir):
    (docs,) = tables(spark, sf_dir, "documents")
    return build_inverted_index(docs)


@query(
    "textsearch_and",
    oracle=_WORDS_CTE
    + """
    SELECT doc FROM words WHERE word IN ('spark', 'join', 'sort')
    GROUP BY doc HAVING COUNT(DISTINCT word) = 3
    """,
    category="textsearch",
)
def textsearch_and(spark, sf_dir):
    """Stepped AND (thorstep2.cpp conjunction): docs containing all of
    {spark, join, sort}."""
    return search_and(_index(spark, sf_dir), ["spark", "join", "sort"])


@query(
    "textsearch_left_only",
    oracle=_WORDS_CTE
    + """
    SELECT DISTINCT doc FROM words WHERE word = 'spark'
    AND doc NOT IN (SELECT doc FROM words WHERE word IN ('slow', 'error'))
    """,
    category="textsearch",
)
def textsearch_left_only(spark, sf_dir):
    """Stepped LEFT ONLY (MJFleftonly): 'spark' docs excluding any that
    mention 'slow' or 'error'."""
    return search_and_left(_index(spark, sf_dir), "spark", ["slow", "error"])


@query(
    "textsearch_m_of_n",
    oracle=_WORDS_CTE
    + """
    SELECT doc, CAST(COUNT(DISTINCT word) AS INT) AS n_matched
    FROM words WHERE word IN ('hash', 'merge', 'filter', 'window')
    GROUP BY doc HAVING COUNT(DISTINCT word) >= 3
    """,
    category="textsearch",
)
def textsearch_m_of_n(spark, sf_dir):
    """M-of-N stepping (MJFmofn eclhelper.hpp:2806): ≥3 of 4 terms."""
    return search_m_of_n(
        _index(spark, sf_dir), ["hash", "merge", "filter", "window"], 3
    )


@query(
    "textsearch_proximity",
    oracle=_WORDS_CTE
    + """
    SELECT a.doc, COUNT(*) AS n_pairs,
           CAST(MIN(ABS(a.wpos - b.wpos)) AS INT) AS min_distance
    FROM (SELECT doc, wpos FROM words WHERE word = 'spark') a
    JOIN (SELECT doc, wpos FROM words WHERE word = 'join') b
      ON a.doc = b.doc AND ABS(a.wpos - b.wpos) <= 5
    GROUP BY a.doc
    """,
    category="textsearch",
)
def textsearch_proximity(spark, sf_dir):
    """PROXIMITY stepping (Roxie ccdserver.cpp proximity join): 'spark'
    within 5 words of 'join'."""
    return search_proximity(_index(spark, sf_dir), "spark", "join", 5)


@query(
    "textsearch_phrase",
    oracle=_WORDS_CTE
    + """
    SELECT a.doc, COUNT(*) AS n_occurrences
    FROM (SELECT doc, wpos FROM words WHERE word = 'the') a
    JOIN (SELECT doc, wpos FROM words WHERE word = 'batch') b
      ON a.doc = b.doc AND b.wpos = a.wpos + 1
    GROUP BY a.doc
    """,
    category="textsearch",
)
def textsearch_phrase(spark, sf_dir):
    """Exact phrase 'the batch' — consecutive-position conjunction."""
    return search_phrase(_index(spark, sf_dir), ["the", "batch"])
