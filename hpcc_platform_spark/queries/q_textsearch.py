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
from hpcc_platform_spark.sources.inline import inline_dataset

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


# --- batch-query engine (operators/tsquery.py) ---------------------------
# The TextSearch.ecl stage algebra on a driver-built broadcast index over
# a deterministic 5% document sample (doc_id % 20 = 0) — sampled so no
# query's match count approaches the engine's MAX_RESULTS cap (10,000)
# at any test SF. One output row per matched word position per query.

_BATCH_QUERIES = [
    '"spark"',
    'AND("spark", "join")',
    'OR("sort", "merge")',
    'ANDNOT("hash", "slow")',
]

_BATCH_WORDS_CTE = """
    WITH words AS (
      SELECT doc_id AS doc,
             lower(unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))) AS word,
             CAST(unnest(range(1, len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) + 1)) AS BIGINT) AS wpos
      FROM documents WHERE doc_id % 20 = 0
    )
"""


@query(
    "textsearch_batch",
    oracle=_BATCH_WORDS_CTE
    + """
    SELECT '"spark"' AS query, doc, wpos FROM words WHERE word = 'spark'
    UNION ALL
    SELECT 'AND("spark", "join")', doc, wpos FROM words
    WHERE word IN ('spark', 'join')
      AND doc IN (SELECT doc FROM words WHERE word = 'spark')
      AND doc IN (SELECT doc FROM words WHERE word = 'join')
    UNION ALL
    SELECT 'OR("sort", "merge")', doc, wpos FROM words
    WHERE word IN ('sort', 'merge')
    UNION ALL
    SELECT 'ANDNOT("hash", "slow")', doc, wpos FROM words
    WHERE word = 'hash'
      AND doc NOT IN (SELECT doc FROM words WHERE word = 'slow')
    """,
    category="textsearch",
)
def textsearch_batch(spark, sf_dir):
    """The TextSearch BATCH-QUERY engine (TextSearch.ecl parseQuery +
    SearchExecutor, operators/tsquery.py): a query table fans out via
    mapInPandas with the word index broadcast — the Spark shape of
    Roxie's one-agent-per-query model. Flat (query, doc, wpos) output
    so DuckDB recomputes the stage algebra in SQL. Driver-built index
    is cap-guarded; the large-corpus path is operators/textsearch.py."""
    from pyspark.sql import functions as F

    from hpcc_platform_spark.operators.tsquery import batch_execute_df

    (docs,) = tables(spark, sf_dir, "documents")
    sample = docs.where(F.col("doc_id") % 20 == 0)
    if sample.count() > 100_000:
        raise RuntimeError(
            "textsearch_batch index sample exceeds 100k docs — the "
            "broadcast-index batch engine is for small indexes; use "
            "operators/textsearch.py plans for large corpora"
        )

    # Executor-side index build (r16 verdict ask #6): tokenization and
    # flag computation run distributed in a mapInPandas pass (the same
    # Python str semantics the driver loop used, so entries are
    # byte-identical); the sort rides the executors too (orderBy on the
    # 6-component engine key), and only the FINISHED packed index rows
    # come back for the broadcast — gathering the index to ship to every
    # task is the broadcast build itself, exactly like Spark's own
    # broadcast-hash-join build side.
    def _tokenize(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = [w for w in (text or "").split() if w]
                for i, w in enumerate(toks, start=1):
                    flags = (
                        2 if any(c.isupper() for c in w) else 0
                    ) + (1 if any(c.islower() for c in w) else 0)
                    recs.append(
                        (
                            1, w.lower().ljust(20), (1 << 48) | int(doc_id), 0,
                            i, 1, flags, w.ljust(20), 0,
                        )
                    )
            yield pd.DataFrame(
                recs, columns=[f"c{j}" for j in range(9)],
            ) if recs else pd.DataFrame(
                {f"c{j}": [] for j in range(9)}
            )

    idx_schema = (
        "c0 long, c1 string, c2 long, c3 long, c4 long, c5 long, "
        "c6 long, c7 string, c8 long"
    )
    index = [
        tuple(r)
        for r in sample.select("doc_id", "text")
        .mapInPandas(_tokenize, idx_schema)
        .orderBy("c0", "c1", "c2", "c3", "c4", "c5")
        .collect()
    ]
    qdf = inline_dataset(
        spark, [(q,) for q in _BATCH_QUERIES], "query string"
    )
    out = batch_execute_df(qdf, tuple(index))
    return out.select(
        F.col("query"),
        F.explode("result").alias("m"),
    ).select(
        "query",
        F.col("m.subdoc").cast("long").alias("doc"),
        F.col("m.wpos").cast("long").alias("wpos"),
    )
