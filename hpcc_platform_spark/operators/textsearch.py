"""Smart-stepping n-way merge-join combinators — boolean text search
(SURVEY.md §2.3 n-way/stepped joins; §4.3 item 4).

Reference ground truth: the smart-stepping engine in
common/thorhelper/thorstep.cpp/.hpp:26-80 and thorstep2.cpp, surfaced as
merge-join flags MJFinner..MJFmofn (rtl/include/eclhelper.hpp:2799-2807)
and Roxie's And/AndLeft/MofN/Proximity classes (roxie/ccd/
ccdserver.cpp:17854-18026). There, k sorted index streams advance each
other via seek/skip (IKeyCursor::lookupSkip, system/jhtree/jhtree.hpp:56).

Spark-first translation: the streams are rows of an inverted index table
``(word, doc, wpos)``; the conjunction/M-of-N/proximity semantics become
aggregation and self-join plans. The seek-limited *physical* behavior the
reference hand-implements is supplied by Catalyst instead: the term filter
pushes into the scan (only matching words are read), and the per-doc
aggregation is a partial/final hash agg — no custom iterator protocol
needed. Build the index with ``build_inverted_index`` (sorted/partitioned
by word so term probes prune files, mirroring the reference's
ts.ecl-built word index).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents into the reference's textSearchIndex shape
    {word, doc, wpos} (testing/regress/ecl/setup/ts.ecl:57): one row per
    word occurrence, 1-based positions.

    At scale, persist with ``build_index(..., keyed=['word'])`` so each
    term lookup prunes to its word range — the parquet analogue of the
    reference's sorted B+tree word key.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(toks).alias("pos0", "word"),
    ).select("word", "doc", (F.col("pos0") + 1).cast("int").alias("wpos"))


def search_and(index: DataFrame, terms: Sequence[str]) -> DataFrame:
    """AND conjunction (MJFinner; Roxie CRoxieServerMergeJoinActivity 'And').

    Docs containing ALL terms. One scan filtered to the term set (pushed
    down), then a per-doc distinct-term count — partial aggregation makes
    this one shuffle of |matching postings|, never a k-way join.
    """
    n = len(set(terms))
    return (
        index.where(F.col("word").isin(*terms))
        .groupBy("doc")
        .agg(F.count_distinct("word").alias("__nt__"))
        .where(F.col("__nt__") == n)
        .select("doc")
    )


def search_and_left(
    index: DataFrame, left_term: str, exclude_terms: Sequence[str]
) -> DataFrame:
    """LEFT ONLY stepping (MJFleftonly): docs with ``left_term`` and NONE of
    ``exclude_terms`` — an anti-join between posting lists."""
    has = index.where(F.col("word") == left_term).select("doc").distinct()
    nots = index.where(F.col("word").isin(*exclude_terms)).select("doc").distinct()
    return has.join(nots, "doc", "left_anti")


def search_m_of_n(index: DataFrame, terms: Sequence[str], m: int) -> DataFrame:
    """M-of-N (MJFmofn, eclhelper.hpp:2806): docs matching at least m of the
    n terms, reporting how many matched."""
    return (
        index.where(F.col("word").isin(*terms))
        .groupBy("doc")
        .agg(F.count_distinct("word").alias("n_matched"))
        .where(F.col("n_matched") >= m)
        .select("doc", F.col("n_matched").cast("int").alias("n_matched"))
    )


def search_proximity(
    index: DataFrame, term_a: str, term_b: str, max_distance: int
) -> DataFrame:
    """PROXIMITY (Roxie CRoxieServerProximityJoinActivity): docs where the
    two terms occur within ``max_distance`` word positions.

    Equality prefix on doc + bounded inequality on position — shuffles only
    on doc (the range residual evaluates inside the join), the same
    range-join shape as JFslidingmatch.
    """
    a = index.where(F.col("word") == term_a).select(
        "doc", F.col("wpos").alias("pos_a")
    )
    b = index.where(F.col("word") == term_b).select(
        F.col("doc").alias("doc_b"), F.col("wpos").alias("pos_b")
    )
    pairs = a.join(
        b,
        (a.doc == b.doc_b)
        & (F.abs(F.col("pos_a") - F.col("pos_b")) <= max_distance),
    )
    return (
        pairs.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min(F.abs(F.col("pos_a") - F.col("pos_b"))).cast("int").alias("min_distance"),
        )
    )


def search_phrase(index: DataFrame, phrase_terms: Sequence[str]) -> DataFrame:
    """Exact phrase: terms at strictly consecutive positions — the
    degenerate proximity chain (distance == 1, ordered). Returns (doc,
    n_occurrences)."""
    if not phrase_terms:
        raise ValueError("empty phrase")
    first = index.where(F.col("word") == phrase_terms[0]).select(
        "doc", F.col("wpos").alias("p0")
    )
    cur = first
    for i, term in enumerate(phrase_terms[1:], start=1):
        nxt = index.where(F.col("word") == term).select(
            F.col("doc").alias(f"d{i}"), F.col("wpos").alias(f"p{i}")
        )
        cur = cur.join(
            nxt,
            (F.col("doc") == F.col(f"d{i}"))
            & (F.col(f"p{i}") == F.col("p0") + i),
        ).drop(f"d{i}")
    return cur.groupBy("doc").agg(F.count(F.lit(1)).alias("n_occurrences"))


def published_search(
    spark: SparkSession, index: DataFrame
) -> "dict[str, object]":
    """Roxie-style 'published query' surface (devdoc/roxie.md:16-37): the
    index is cached once; each entry point is a parameterized function over
    the cached plan — the Spark analogue of a compiled query DLL with
    activity factories reused across requests."""
    cached = index.persist()
    return {
        "and": lambda terms: search_and(cached, terms),
        "m_of_n": lambda terms, m: search_m_of_n(cached, terms, m),
        "proximity": lambda a, b, d: search_proximity(cached, a, b, d),
        "phrase": lambda terms: search_phrase(cached, terms),
        "release": lambda: cached.unpersist(),
    }
