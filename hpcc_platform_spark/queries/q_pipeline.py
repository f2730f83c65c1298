"""LLM-data-pipeline operator coverage: dedup, similarity search, text
analysis over the documents/embeddings tables (BASELINE.json north star —
first-class components alongside the reference's own surface).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.pipeline.dedup import exact_dedup_docs
from hpcc_platform_spark.pipeline.similarity import brute_force_topk
from hpcc_platform_spark.pipeline.textstats import quality_features, token_count
from hpcc_platform_spark.queries.registry import query, tables


@query(
    "doc_exact_dedup",
    oracle="""
    WITH hashed AS (
      SELECT doc_id, md5(text) AS text_hash FROM documents
    ), ranked AS (
      SELECT doc_id, text_hash,
             row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY text_hash) AS n_copies
      FROM hashed
    )
    SELECT doc_id, text_hash, n_copies FROM ranked WHERE rn = 1
    """,
    category="pipeline",
)
def doc_exact_dedup(spark, sf_dir):
    """Exact dedup: content-hash groupBy, keep lowest doc_id per hash,
    report the duplicate count. The hash-shuffle pattern scales linearly —
    the 100 TB default before near-dup passes."""
    (docs,) = tables(spark, sf_dir, "documents")
    return exact_dedup_docs(docs, text_col="text", id_col="doc_id")


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS INT) AS n_tokens,
           n_chars
    FROM documents
    """,
    category="pipeline",
)
def token_count_q(spark, sf_dir):
    """Token counting (whitespace tokenizer) — JVM-side split/filter/size,
    no UDF."""
    (docs,) = tables(spark, sf_dir, "documents")
    return token_count(docs, text_col="text").select("doc_id", "n_tokens", "n_chars")


@query(
    "text_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, length(text) AS text_len,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(ws) AS INT) AS n_tokens,
           ROUND(text_len / NULLIF(len(ws), 0), 4) AS mean_token_len,
           CAST(len(list_distinct(ws)) AS INT) AS n_unique_tokens,
           ROUND(len(list_distinct(ws)) / NULLIF(len(ws), 0), 4) AS unique_ratio
    FROM toks
    """,
    category="pipeline",
)
def text_quality(spark, sf_dir):
    """Quality scoring: token count, mean token length, type/token ratio —
    the standard cheap filters before expensive pipeline stages."""
    (docs,) = tables(spark, sf_dir, "documents")
    return quality_features(docs, text_col="text").select(
        "doc_id", "lang", "n_tokens", "mean_token_len", "n_unique_tokens", "unique_ratio"
    )


@query(
    "ann_bruteforce",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS cos_sim
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC, e.vec_id
    LIMIT 10
    """,
    category="pipeline",
)
def ann_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k over the embedding column — the exact
    baseline for ANN; TakeOrderedAndProject keeps it one pass, no global
    sort. The LSH-bucketed scale path lives in pipeline.similarity."""
    (emb,) = tables(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return brute_force_topk(
        emb.where(F.col("vec_id") != 0), list(qvec), k=10, id_col="vec_id"
    )
