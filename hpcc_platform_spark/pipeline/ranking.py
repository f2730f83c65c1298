"""Lexical relevance ranking: TF-IDF / BM25 over the documents table.

The reference's text-search side is index-driven boolean retrieval
(smart-stepping n-way merge joins, common/thorhelper/thorstep.cpp;
inverted text index fixtures testing/regress/ecl/setup/ts.ecl:33-60).
This module adds the *scored* retrieval layer a training-data /search
pipeline needs on top of that: corpus statistics (tf, df, dl, avgdl)
as plain key-shuffle aggregations, and Okapi BM25 scoring as pure
column arithmetic — all JVM-side, no UDFs.

Scale posture (100 TB): the statistics are one explode + two key
shuffles (doc_id and term). For single-query search, terms are filtered
immediately after the explode so the term shuffle carries only the
query's vocabulary; document length is computed map-only with
size(filter(split)) — never an explode. The only global values (N,
avgdl) are a 1-row aggregate broadcast back. Skew axis: stopword-like
terms concentrate on few reducers in the full-index build — salt the
(term) groupBy via operators.skew.salted_agg when building a full
corpus index rather than searching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

_WS = r"\s+"


def _token_array(text_col: str):
    """Whitespace tokens, empty strings dropped — matches the repo-wide
    tokenizer convention (textstats.token_count)."""
    return F.filter(F.split(F.col(text_col), _WS), lambda w: w != "")


def doc_lengths(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token count, map-only (no explode/shuffle)."""
    return docs.select(
        F.col(id_col),
        F.size(_token_array(text_col)).cast("double").alias("dl"),
    )


def term_frequencies(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     terms: list[str] | None = None) -> DataFrame:
    """(doc, term) -> tf. If `terms` is given, the explode output is
    filtered before the groupBy so the shuffle carries only those terms."""
    toks = docs.select(
        F.col(id_col), F.explode(_token_array(text_col)).alias("term")
    )
    if terms is not None:
        toks = toks.where(F.col("term").isin(*terms))
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )


def bm25_search(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under Okapi BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the standard
    non-negative variant).

    Plan shape: one doc-length map pass; one term-filtered explode →
    (doc,term) groupBy; df derived from that (already distinct) frame;
    N/avgdl as a broadcast 1-row aggregate; score arithmetic fully
    JVM-side; TakeOrderedAndProject for the top-k. Returns
    (doc_id, bm25) with the score rounded to 4 decimals (ties broken
    by doc_id ascending).
    """
    dl = doc_lengths(docs, text_col, id_col)
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = term_frequencies(docs, text_col, id_col, terms=terms)
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1.0) / norm
    scored = (
        tf.join(broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def tfidf_vectors(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Full (doc, term) -> tf-idf index build: smooth idf
    ln((1+N)/(1+df)) + 1 (sklearn's convention). Two key shuffles; for
    stopword-heavy corpora salt the term groupBy (see module docstring)."""
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    n_docs = tf.select(id_col).distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    return (
        tf.join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.round(F.col("tf") * idf, 4).alias("tfidf"),
        )
    )
