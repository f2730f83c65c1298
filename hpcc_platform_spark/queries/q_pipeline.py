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


@query(
    "word_jaccard_pairs",
    oracle="""
    WITH sets AS (
      SELECT doc_id, list_distinct(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS ws
      FROM documents WHERE doc_id < 60
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.ws, b.ws)) /
                 (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))), 4) AS jaccard
    FROM sets a JOIN sets b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.ws, b.ws)) /
          (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.2
    """,
    category="pipeline",
)
def word_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup (n=1 word sets): all-pairs over a bounded
    slice with the similarity threshold — the exact-verification stage of
    the dedup pipeline (candidates come from LSH at scale; the bounded
    slice keeps the oracle's quadratic join honest at test SF)."""
    (docs,) = tables(spark, sf_dir, "documents")
    sets_df = docs.where(F.col("doc_id") < 60).select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", r"\s+"), lambda w: w != "")
        ).alias("ws"),
    )
    a = sets_df.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = (F.size("ws_a") + F.size("ws_b")).cast("double") - inter
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= 0.2)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


@query("minhash_lsh", oracle=None, category="pipeline")
def minhash_lsh_q(spark, sf_dir):
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join).

    No cross-engine oracle (xxhash64 is Spark-specific — the reference's
    HASH64 is likewise engine-specific); correctness is pinned by
    tests/test_pipeline.py: injected near-duplicates must surface with
    jaccard_est ≈ their true overlap, and the estimate must correlate with
    exact word-set Jaccard."""
    from hpcc_platform_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        docs.where(F.col("doc_id") < 200), num_hashes=32, shingle_k=2
    )
    return minhash_lsh_candidates(
        sigs, bands=8, rows_per_band=4, jaccard_threshold=0.4
    )


@query("simhash_docs", oracle=None, category="pipeline")
def simhash_docs(spark, sf_dir):
    """SimHash fingerprints (64-bit, token-hash sign aggregation).

    Rows-only here (engine-specific hash); tests assert identical docs →
    identical simhash and near-dups → small hamming distance."""
    from hpcc_platform_spark.pipeline.dedup import simhash64

    (docs,) = tables(spark, sf_dir, "documents")
    return simhash64(docs.where(F.col("doc_id") < 200))


@query("language_id", oracle=None, category="pipeline")
def language_id_q(spark, sf_dir):
    """Stopword-ratio language ID over documents (rows-only: the heuristic
    is engine-internal; tests pin behavior on constructed texts)."""
    from hpcc_platform_spark.pipeline.textstats import language_id

    (docs,) = tables(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang", "lang_pred", "lang_score")
