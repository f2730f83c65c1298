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
from hpcc_platform_spark.sources.inline import inline_dataset


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
    category="dedup_pipeline",
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
    category="textstats",
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
    category="textstats",
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
    category="similarity",
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
    category="dedup_pipeline",
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


@query("minhash_lsh", oracle=None, category="dedup_pipeline", driver_visible=False)
def minhash_lsh_q(spark, sf_dir):
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join).

    Pytest-only (driver_visible=False): xxhash64 is Spark-specific — the
    reference's HASH64 is likewise engine-specific — so the driver could
    only ever record ``no_oracle`` here. The oracle-checked portable
    sibling ``minhash_lsh_portable`` covers the operator in the driver
    window; this variant's correctness is pinned by tests/test_pipeline.py:
    injected near-duplicates must surface with jaccard_est ≈ their true
    overlap, and the estimate must correlate with exact word-set Jaccard."""
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


@query("simhash_docs", oracle=None, category="dedup_pipeline", driver_visible=False)
def simhash_docs(spark, sf_dir):
    """SimHash fingerprints (64-bit, token-hash sign aggregation).

    Pytest-only (driver_visible=False): engine-specific xxhash64 output —
    the oracle-checked ``simhash_portable`` covers the operator in the
    driver window. Tests assert identical docs → identical simhash and
    near-dups → small hamming distance."""
    from hpcc_platform_spark.pipeline.dedup import simhash64

    (docs,) = tables(spark, sf_dir, "documents")
    return simhash64(docs.where(F.col("doc_id") < 200))


_LANG_STOP_SQL = None  # built below from textstats.STOPWORDS


def _language_id_oracle() -> str:
    from hpcc_platform_spark.pipeline.textstats import STOPWORDS

    score_cols = ",\n           ".join(
        f"len(list_filter(ws, w -> list_contains({stop}, w))) / NULLIF(len(ws), 0) AS s_{lang}"
        for lang, stop in STOPWORDS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in STOPWORDS) + ")"
    # Tie-break must match Spark's array_max over (score, lang) structs:
    # max score, then alphabetically-last language among ties.
    pick = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'"
        for lang in sorted(STOPWORDS, reverse=True)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, lang,
             list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''), w -> lower(w)) AS ws
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
           {score_cols}
      FROM t
    ), b AS (
      SELECT *, {best} AS best FROM s
    )
    SELECT doc_id, lang,
           CASE WHEN best > 0 THEN (CASE {pick} END) ELSE 'und' END AS lang_pred,
           ROUND(COALESCE(best, 0), 4) AS lang_score
    FROM b
    """


@query("language_id", oracle=_language_id_oracle(), category="textstats")
def language_id_q(spark, sf_dir):
    """Stopword-ratio language ID (argmax of per-language stopword hit
    fraction, ties alphabetically-last, zero-score → 'und') — map-only
    array intersections; the oracle replicates the scoring closed-form."""
    from hpcc_platform_spark.pipeline.textstats import language_id

    (docs,) = tables(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang", "lang_pred", "lang_score")


# Deterministic LSH hyperplanes / IVF probe vector, shared verbatim by the
# Spark plan and the oracle SQL (Rademacher ±1 entries, fixed seeds).
import random as _random

_rng = _random.Random(42)
_PLANES = [[1.0 if _rng.random() < 0.5 else -1.0 for _ in range(64)] for _ in range(6)]
_qrng = _random.Random(7)
_QVEC = [round(_qrng.uniform(-1, 1), 3) for _ in range(64)]

_BUCKET_SQL = " || ".join(
    f"(CASE WHEN list_dot_product(v, {p}::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
    for p in _PLANES
)


@query(
    "embedding_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    b AS (SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e)
    SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
           ROUND(list_dot_product(a.v,b2.v) /
                 (sqrt(list_dot_product(a.v,a.v)) * sqrt(list_dot_product(b2.v,b2.v))), 4) AS cos_sim
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE list_dot_product(a.v,b2.v) /
          (sqrt(list_dot_product(a.v,a.v)) * sqrt(list_dot_product(b2.v,b2.v))) >= 0.35
    """,
    category="similarity",
)
def embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup: candidates from a 6-bit random-hyperplane
    sign bucket (equi-join key shuffle — never the n² pair space), exact
    cosine >= 0.35 on candidates only. The oracle replicates bucket +
    cosine bit-for-bit from the shared hyperplane literals."""
    from hpcc_platform_spark.pipeline.similarity import embedding_near_dup_pairs

    (emb,) = tables(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, _PLANES, threshold=0.35)


@query(
    "ann_ivf",
    oracle=f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 50 = 0),
    q AS (SELECT {_QVEC}::DOUBLE[] AS qv),
    assign AS (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
               list_dot_product(e.v,c.cv) /
               (sqrt(list_dot_product(e.v,e.v)) * sqrt(list_dot_product(c.cv,c.cv))) DESC, c.cid) AS rn
      FROM e CROSS JOIN c
    ),
    probes AS (
      SELECT cid FROM c, q
      ORDER BY list_dot_product(cv,qv) /
               (sqrt(list_dot_product(cv,cv)) * sqrt(list_dot_product(qv,qv))) DESC, cid
      LIMIT 2
    )
    SELECT a.vec_id,
           ROUND(list_dot_product(a.v,q.qv) /
                 (sqrt(list_dot_product(a.v,a.v)) * sqrt(list_dot_product(q.qv,q.qv))), 4) AS cos_sim
    FROM assign a, q WHERE a.rn = 1 AND a.cid IN (SELECT cid FROM probes)
    ORDER BY list_dot_product(a.v,q.qv) /
             (sqrt(list_dot_product(a.v,a.v)) * sqrt(list_dot_product(q.qv,q.qv))) DESC, a.vec_id
    LIMIT 10
    """,
    category="similarity",
)
def ann_ivf(spark, sf_dir):
    """IVF approximate nearest neighbor: deterministic centroids (every
    50th id), broadcast-join assignment to nearest centroid, probe the 2
    cells nearest the query, exact re-rank inside. The scale path prunes
    (C-nprobe)/C of the corpus before any distance math; the oracle
    replicates centroid choice, assignment tie-break, and probe order."""
    from hpcc_platform_spark.pipeline.similarity import ivf_topk

    (emb,) = tables(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _QVEC, k=10, centroid_stride=50, nprobe=2)


@query(
    "minhash_lsh_portable",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS words
      FROM documents WHERE doc_id < 200
    ), sh AS (
      SELECT doc_id, CASE WHEN len(words) >= 2
        THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1])
        ELSE [array_to_string(words, ' ')] END AS shingles
      FROM toks
    ), sigs AS (
      SELECT doc_id,
             list_transform(range(0, 16), h ->
               list_min(list_transform(shingles, s -> md5(h::VARCHAR || ':' || s)))) AS signature
      FROM sh
    ), bands AS (
      SELECT doc_id, b, md5(array_to_string(signature[b*4+1 : b*4+4], ',')) AS bucket
      FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS b) bb
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           (len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) / 16.0) AS jaccard_est
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.id_a
    JOIN sigs sb ON sb.doc_id = c.id_b
    WHERE (len(list_filter(range(1, 17), i -> sa.signature[i] = sb.signature[i])) / 16.0) >= 0.4
    """,
    category="dedup_pipeline",
)
def minhash_lsh_portable(spark, sf_dir):
    """MinHash+LSH with the portable md5 hash family (hash_i = md5(i:shingle),
    min over 2-word shingles; 4 bands × 4 rows; candidates from band-bucket
    equi-join; Jaccard estimated from signature agreement). Same pipeline
    shape as the xxhash64 production variant — this one is engine-portable
    so DuckDB verifies every stage end-to-end."""
    from hpcc_platform_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        docs.where(F.col("doc_id") < 200),
        num_hashes=16,
        shingle_k=2,
        hash_mode="md5",
    )
    return minhash_lsh_candidates(
        sigs, bands=4, rows_per_band=4, jaccard_threshold=0.4
    )


@query(
    "doc_fingerprint",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(text)-7, 1)+1), i -> md5(text[i:i+7])) AS grams
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           unnest(list_distinct(list_transform(range(1, greatest(len(grams)-3, 1)+1),
                                               i -> list_min(grams[i:i+3])))) AS fingerprint
    FROM g
    """,
    category="dedup_pipeline",
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting by winnowing (rolling md5 over char 8-grams,
    min per 4-gram window, distinct) — any shared substring of length 11
    yields a shared fingerprint; matching is then a fingerprint equi-join.
    Map-only signature stage; portable hash → full oracle verification."""
    from hpcc_platform_spark.pipeline.dedup import winnow_fingerprints

    (docs,) = tables(spark, sf_dir, "documents")
    return winnow_fingerprints(
        docs.where(F.col("doc_id") < 100), gram_len=8, window=4
    )


@query(
    "multimodal_features",
    oracle="""
    WITH m AS (
      SELECT i AS media_id,
             (['image','audio','video'])[CAST(i % 3 AS INT) + 1] AS kind,
             32 + (i % 5) * 16 AS n
      FROM range(0, 200) t(i)
    ), hexed AS (
      SELECT media_id, kind, n,
             list_aggregate(list_transform(range(0, n),
                 j -> lpad(lower(hex((media_id*7 + j*13) % 256)), 2, '0')),
                 'string_agg', '') AS hexstr
      FROM m
    )
    SELECT media_id, kind, CAST(n AS INT) AS n_bytes,
           md5(hexstr) AS content_hash,
           ROUND(CAST(n % 251 AS DOUBLE), 4) AS f0
    FROM hexed
    """,
    category="multimodal",
)
def multimodal_features(spark, sf_dir):
    """Multimodal plumbing: opaque binary media column + typed metadata →
    mapInPandas feature extraction (Arrow-batched, re-chunked so MB-sized
    blobs never blow an Arrow batch). Decode is a deterministic fake (no
    codec libs in-container); schema/partitioning/batch shape are real —
    which makes every metadata column exactly computable, so the oracle
    replays the byte synthesis + md5-of-hex fingerprint + first feature in
    pure SQL."""
    from hpcc_platform_spark.pipeline.multimodal import (
        extract_features,
        fake_media_table,
    )

    media = fake_media_table(spark, n=200).repartition(8, "media_id")
    return extract_features(media, batch_rows=64).select(
        "media_id", "kind", "n_bytes", "content_hash",
        F.round(F.element_at("feature", 1).cast("double"), 4).alias("f0"),
    )


@query(
    "bpe_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS INT) AS n_ws_tokens
    FROM documents
    """,
    category="textstats",
)
def bpe_token_count(spark, sf_dir):
    """BPE-style token counting: a GPT-ish pre-tokenizer regex (letter
    runs | digit runs | single punctuation) alongside the whitespace count
    — the cheap token-budget estimator before real BPE. JVM-side
    regexp_extract_all, map-only."""
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(
            F.expr(r"regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)")
        ).cast("int").alias("n_bpe_tokens"),
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).cast("int").alias(
            "n_ws_tokens"
        ),
    )


@query(
    "pipeline_compose_clean",
    oracle="""
    WITH lang AS (
      SELECT doc_id, text,
             list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''), w -> lower(w)) AS ws
      FROM documents
    ), scored AS (
      SELECT doc_id, text, len(ws) AS n_tokens,
             len(list_filter(ws, w -> list_contains(['the','a','of','and','to','in','is','that','it','for'], w)))
               / NULLIF(len(ws), 0) AS en_score
      FROM lang
    ), kept AS (
      SELECT doc_id, text, n_tokens FROM scored
      WHERE en_score >= 0.08 AND n_tokens BETWEEN 10 AND 5000
    ), ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM kept
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens FROM ranked WHERE rn = 1
    """,
    category="textstats",
)
def pipeline_compose_clean(spark, sf_dir):
    """The composed cleaning pipeline a training-data run actually executes:
    English-score filter → length/quality bounds → exact dedup keep-first —
    one DAG, all map-side until the single dedup shuffle. Each stage is the
    already-tested operator; this query proves they compose."""
    (docs,) = tables(spark, sf_dir, "documents")
    from pyspark.sql import Window

    ws = F.transform(
        F.filter(F.split("text", r"\s+"), lambda w: w != ""), F.lower
    )
    en_stop = F.lit(["the","a","of","and","to","in","is","that","it","for"])
    scored = docs.select(
        "doc_id", "text",
        F.size(ws).alias("n_tokens"),
        (
            F.size(F.filter(ws, lambda w: F.array_contains(en_stop, w))).cast("double")
            / F.nullif(F.size(ws).cast("double"), F.lit(0.0))
        ).alias("en_score"),
    )
    kept = scored.where(
        (F.col("en_score") >= 0.08) & F.col("n_tokens").between(10, 5000)
    )
    w = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("n_tokens").cast("int").alias("n_tokens"))
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
      SELECT i AS media_id, 32 + (i % 5) * 16 AS n
      FROM range(0, 120) t(i) WHERE i % 3 = 2
    )
    SELECT media_id, CAST(fi.frame_idx AS INT) AS frame_idx,
           md5(list_aggregate(list_transform(
               range(fi.frame_idx*16, fi.frame_idx*16+16),
               k -> lpad(lower(hex((media_id*7 + k*13) % 256)), 2, '0')),
               'string_agg', '')) AS frame_hash,
           16 AS n_frame_bytes
    FROM vids, LATERAL (SELECT unnest(range(0, n // 16, 2)) AS frame_idx) fi
    """,
    category="multimodal",
)
def multimodal_frame_sample(spark, sf_dir):
    """Video frame sampling (multimodal fan-out: one media row → k frame
    rows via mapInPandas). Decode is a deterministic fake; ordinals,
    per-frame md5-of-hex fingerprints and the 1→k batch shape are the
    verified surface — the oracle replays the 16-byte frame slicing in SQL.
    Raw frame bytes stay in the engine (binary doesn't hash-compare across
    engines); the projection exposes hash + length instead."""
    from hpcc_platform_spark.pipeline.multimodal import fake_media_table, frame_sample

    media = fake_media_table(spark, n=120).repartition(8, "media_id")
    return frame_sample(media, every_n=2, max_frames=4).select(
        "media_id",
        "frame_idx",
        "frame_hash",
        F.length("frame_bytes").cast("int").alias("n_frame_bytes"),
    )


@query(
    "simhash_portable",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''), w -> md5(w)) AS hs
      FROM documents WHERE doc_id < 200
    ), votes AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_sum(list_transform(hs, h ->
                 (((strpos('0123456789abcdef', h[CAST(i // 4 AS INT) + 1 : CAST(i // 4 AS INT) + 1]) - 1)
                   // CAST(POWER(2, i % 4) AS INT)) % 2) * 2 - 1))) AS v
      FROM toks
    )
    SELECT doc_id,
           CAST(list_sum(list_transform(range(0, 16), i ->
             CASE WHEN v[CAST(i AS INT) + 1] > 0 THEN CAST(POWER(2, i) AS INT) ELSE 0 END)) AS INT) AS simhash16
    FROM votes
    """,
    category="dedup_pipeline",
)
def simhash_portable(spark, sf_dir):
    """SimHash with the portable md5-nibble hash (16-bit): per-token hash,
    ±1 majority vote per bit, sign → fingerprint — the oracle replicates
    every vote bit-for-bit, proving the SimHash construction end-to-end
    (the production simhash64 is the same shape over xxhash64)."""
    from hpcc_platform_spark.pipeline.dedup import simhash16_portable

    (docs,) = tables(spark, sf_dir, "documents")
    return simhash16_portable(docs.where(F.col("doc_id") < 200))


def _trigram_profile_values() -> str:
    from hpcc_platform_spark.pipeline.textstats import TRIGRAM_PROFILES

    rows = []
    for lang, prof in TRIGRAM_PROFILES.items():
        for g, lp in prof.items():
            g_sql = g.replace("'", "''")
            rows.append(f"('{lang}', '{g_sql}', {lp!r})")
    return ", ".join(rows)


@query(
    "language_id_ngram",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 200
    ), tri AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(length(text)-2, 0)+1),
                                   i -> lower(text[i:i+2]))) AS g,
             greatest(length(text)-2, 0) AS n_tri
      FROM docs
    ), prof(lang, g, lp) AS (
      SELECT * FROM (VALUES {{PROFILE_VALUES}}) v
    ), langs(lang) AS (SELECT DISTINCT lang FROM prof),
    scores AS (
      SELECT t.doc_id, l.lang,
             ROUND(SUM(COALESCE(p.lp, -12.0)) / MAX(t.n_tri), 4) AS score
      FROM tri t CROSS JOIN langs l
      LEFT JOIN prof p ON p.lang = l.lang AND p.g = t.g
      GROUP BY t.doc_id, l.lang
    ), best AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang DESC) AS rn
      FROM scores
    )
    SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred,
           b.score AS lang_score
    FROM docs d LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
    """.replace("{PROFILE_VALUES}", _trigram_profile_values()),
    category="textstats",
)
def language_id_ngram_q(spark, sf_dir):
    """Character-trigram language ID (Cavnar-Trenkle profile scoring) —
    the production-shaped upgrade over the stopword heuristic: mean
    trigram log-probability under per-language profiles baked as shared
    literals into plan AND oracle. JVM-side transform/aggregate fold —
    map-only at 100 TB. Argmax ties break on language code (struct max ≡
    the oracle's ORDER BY score DESC, lang DESC)."""
    from hpcc_platform_spark.pipeline.textstats import language_id_ngram

    (docs,) = tables(spark, sf_dir, "documents")
    return language_id_ngram(docs.where(F.col("doc_id") < 200)).select(
        "doc_id", "lang_pred", "lang_score"
    )


@query(
    "containment_pairs",
    oracle="""
    WITH sets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS ws
      FROM documents WHERE doc_id < 80
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.ws, b.ws)) / CAST(len(a.ws) AS DOUBLE), 4) AS containment
    FROM sets a JOIN sets b ON a.doc_id <> b.doc_id
    WHERE len(list_intersect(a.ws, b.ws)) / CAST(len(a.ws) AS DOUBLE) >= 0.6
    """,
    category="dedup_pipeline",
)
def containment_pairs_q(spark, sf_dir):
    """Asymmetric containment near-dup (|A∩B|/|A| over word sets): the
    excerpt/boilerplate detector symmetric Jaccard misses. Computed via the
    inverted-index self-join (containment_pairs_exact) — exhaustive recall
    with key shuffles only, no cartesian; tests/test_pipeline.py asserts the
    physical plan has no BNLJ/CartesianProduct node. The oracle's quadratic
    join is fine at its bounded slice."""
    from hpcc_platform_spark.pipeline.dedup import containment_pairs_exact

    (docs,) = tables(spark, sf_dir, "documents")
    return containment_pairs_exact(
        docs.where(F.col("doc_id") < 80), threshold=0.6
    )


@query(
    "boilerplate_removal",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 120
    ),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(ws[(i*10+1):(i*10+10)], ' ') AS segment
      FROM toks, UNNEST(range(CAST(ceil(len(ws)/10.0) AS BIGINT))) AS t(i)
      WHERE array_to_string(ws[(i*10+1):(i*10+10)], ' ') <> ''
    ),
    freq AS (SELECT segment, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY segment),
    kept AS (SELECT s.doc_id, s.seg_idx, s.segment
             FROM segs s JOIN freq f USING(segment) WHERE f.df <= 1),
    rebuilt AS (
      SELECT doc_id, string_agg(segment, ' ' ORDER BY seg_idx) AS text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, COALESCE(r.text, '') AS text
    FROM toks t LEFT JOIN rebuilt r USING(doc_id)
    """,
    category="cleaning",
)
def boilerplate_removal_q(spark, sf_dir):
    """C4-style boilerplate removal: segments (10-word windows here — the
    corpus has no newlines; web text would pass delim='\\n') appearing in
    more than one document are dropped corpus-wide, and documents are
    reassembled in order. Shape: groupBy(segment) doc-frequency + verdict
    join + ordered re-agg — key shuffles only."""
    from hpcc_platform_spark.pipeline.cleaning import remove_boilerplate_segments

    (docs,) = tables(spark, sf_dir, "documents")
    return remove_boilerplate_segments(
        docs.where(F.col("doc_id") < 120), max_doc_freq=1, words_per_segment=10
    )


@query(
    "repetition_scores",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 150
    ),
    base AS (
      SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS d, ws FROM toks
    ),
    bg AS (
      SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
      FROM base, UNNEST(range(1, len(ws))) AS t(i)
      WHERE len(ws) >= 2
    ),
    per AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
    agg AS (SELECT doc_id, MAX(c) AS top, SUM(c) AS tot FROM per GROUP BY doc_id)
    SELECT b.doc_id,
           ROUND(1.0 - CAST(b.d AS DOUBLE) / b.n, 4) AS dup_word_ratio,
           COALESCE(ROUND(CAST(a.top AS DOUBLE) / a.tot, 4), 0.0) AS top_bigram_frac
    FROM base b LEFT JOIN agg a USING(doc_id)
    """,
    category="cleaning",
)
def repetition_scores_q(spark, sf_dir):
    """Within-document repetition signals (Gopher/MassiveText quality
    filters): duplicate-unigram ratio + most-frequent-bigram share. One
    key shuffle (doc, bigram) with map-side partial aggregation."""
    from hpcc_platform_spark.pipeline.cleaning import repetition_scores

    (docs,) = tables(spark, sf_dir, "documents")
    return repetition_scores(docs.where(F.col("doc_id") < 150))


# Inline fixture: the testdata corpus is synthetic words with no PII, so
# the redaction query runs on a fixed set of adversarial strings with the
# expected outputs pinned as a VALUES oracle (same technique as
# phonetic_soundex / the scheduler).
_PII_CASES = [
    (1, "contact me at john.doe@example.com now",
        "contact me at <EMAIL> now", True),
    (2, "server at 192.168.1.100 port 8080",
        "server at <IP> port 8080", True),
    (3, "call (555) 123-4567 or +1 555-987-6543 today",
        "call <PHONE> or <PHONE> today", True),
    (4, "ssn 123-45-6789 leaked with ip 10.0.0.1",
        "ssn <SSN> leaked with ip <IP>", True),
    (5, "totally clean text stays intact", "totally clean text stays intact", False),
    (6, "a.b@c.io mailed 8.8.8.8", "<EMAIL> mailed <IP>", True),
]

_PII_ORACLE = "SELECT * FROM (VALUES " + ", ".join(
    f"({i}, '{t}', '{r}', {str(f).upper()})" for i, t, r, f in _PII_CASES
) + ") AS t(id, original, text, pii_found)"


@query("pii_redact", oracle=_PII_ORACLE, category="cleaning")
def pii_redact_q(spark, sf_dir):
    """PII redaction (email/IPv4/phone/SSN regexp_replace chains, map-only
    codegen) over pinned adversarial cases; expected redactions inlined as
    the oracle."""
    from hpcc_platform_spark.pipeline.cleaning import pii_redact

    df = inline_dataset(
        spark, [(i, t) for i, t, _, _ in _PII_CASES], "id int, text string"
    )
    return pii_redact(df).select(
        "id", F.col("text").alias("redacted"), "pii_found"
    ).join(
        inline_dataset(
            spark, [(i, t) for i, t, _, _ in _PII_CASES], "id int, original string"
        ),
        "id",
    ).select("id", "original", F.col("redacted").alias("text"), "pii_found")


@query(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE sets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS ws
      FROM documents WHERE doc_id < 60
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ws, b.ws)) /
            (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.2
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id, MIN(comp) AS canonical_id FROM reach GROUP BY id
    """,
    category="dedup_pipeline",
)
def dedup_clusters_q(spark, sf_dir):
    """Cluster formation over near-dup pairs (min-label-propagation
    connected components): every paired doc labeled with its component's
    min id as canonical — the keep/drop decision step after LSH +
    verification. Oracle computes the same components via a recursive
    transitive-closure CTE on the identical candidate set."""
    from hpcc_platform_spark.pipeline.dedup import dedup_clusters

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
    cand = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where((inter / union) >= 0.2)
        .select("id_a", "id_b")
    )
    return dedup_clusters(cand)


@query(
    "multimodal_audio_features",
    oracle="""
    WITH m AS (
      SELECT i AS media_id, 800 + (i % 5) * 160 AS ns FROM range(0, 60) t(i)
    ),
    s AS (
      SELECT media_id, ns,
             CAST((media_id * 31 + j * 17) % 2003 - 1001 AS DOUBLE) AS v
      FROM m, UNNEST(range(0, ns)) u(j)
    )
    SELECT media_id, TRUE AS decoded, CAST(ns AS INT) AS n_frames,
           8000 AS framerate, CAST(ns / 8 AS INT) AS duration_ms,
           ROUND(sqrt(SUM(v * v) / ns), 4) AS rms
    FROM s GROUP BY media_id, ns
    """,
    category="multimodal",
)
def multimodal_audio_features_q(spark, sf_dir):
    """REAL audio decode (stdlib wave — no external codec needed): WAV
    container parse + PCM RMS over deterministic synthesized audio whose
    sample formula the oracle replays in SQL. Integer PCM keeps the
    sum-of-squares exact in doubles, so the RMS hash-matches across
    engines. The degraded path (corrupt blobs -> decoded=false) is pinned
    in tests/test_pipeline.py."""
    from hpcc_platform_spark.pipeline.multimodal import (
        audio_features,
        synth_wav_table,
    )

    return audio_features(synth_wav_table(spark, 60).repartition(8, "media_id"))


# Registered just below with the SAME oracle as dedup_clusters (same
# candidate pairs, same (id, canonical_id) contract).
from hpcc_platform_spark.queries.registry import REGISTRY as _REG0  # noqa: E402


@query(
    "dedup_clusters_star",
    oracle=_REG0["dedup_clusters"].oracle,
    category="dedup_pipeline",
)
def dedup_clusters_star_q(spark, sf_dir):
    """Log-round connected components (large-star/small-star, Kiveris et
    al. SoCC'14) over the SAME candidate pairs as dedup_clusters — the
    adversarial-chain scale path; identical (id, canonical_id) contract,
    so the identical recursive-CTE oracle verifies it."""
    from hpcc_platform_spark.pipeline.dedup import dedup_clusters_star

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
    cand = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where((inter / union) >= 0.2)
        .select("id_a", "id_b")
    )
    return dedup_clusters_star(cand)


@query(
    "multimodal_image_features",
    oracle="""
    WITH m AS (
      SELECT i AS media_id, 8 + (i % 4) * 4 AS w, 8 + (i % 3) * 4 AS h
      FROM range(0, 60) t(i)
    ),
    px AS (
      SELECT media_id, w, h,
             CAST((media_id * 7 + x * 3 + y * 5) % 256 AS DOUBLE) AS r,
             CAST((media_id * 11 + x * 2 + y * 7) % 256 AS DOUBLE) AS g,
             CAST((media_id * 13 + x * 5 + y * 2) % 256 AS DOUBLE) AS b
      FROM m, UNNEST(range(0, w)) ux(x), UNNEST(range(0, h)) uy(y)
    )
    SELECT media_id, TRUE AS decoded,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           ROUND(AVG(r), 4) AS avg_r, ROUND(AVG(g), 4) AS avg_g,
           ROUND(AVG(b), 4) AS avg_b
    FROM px GROUP BY media_id, w, h
    """,
    category="multimodal",
)
def multimodal_image_features_q(spark, sf_dir):
    """REAL image decode with NO external library (stdlib zlib PNG codec —
    container parse, scanline-filter reconstruction, per-channel means)
    over deterministic synthesized PNGs whose pixel formula the oracle
    replays in SQL. Integer pixel sums keep the averages exact in doubles,
    so the channel means hash-match across engines. The degraded path
    (corrupt blobs -> decoded=false) and filter types 1-4 are pinned in
    tests/test_pipeline.py. Mirrors multimodal_audio_features' stdlib-wave
    approach (reference treats media as opaque blobs + plugin decoders)."""
    from hpcc_platform_spark.pipeline.multimodal import (
        image_features,
        synth_png_table,
    )

    return image_features(synth_png_table(spark, 60).repartition(8, "media_id"))


@query(
    "multimodal_video_frames",
    oracle="""
    WITH m AS (
      SELECT i AS media_id, 8 + (i % 3) * 4 AS w, 8 + (i % 2) * 4 AS h,
             2 + (i % 4) AS nf
      FROM range(0, 40) t(i)
    ),
    fr AS (  -- every 2nd frame, capped at 4 (matches the query's sampling)
      SELECT media_id, w, h, CAST(j AS INT) AS frame_idx
      FROM m, UNNEST(range(0, nf)) u(j)
      WHERE j % 2 = 0 AND j / 2 < 4
    ),
    px AS (
      SELECT media_id, frame_idx, w, h,
             CAST((media_id * 7 + frame_idx * 11 + x * 3 + y * 5) % 256 AS DOUBLE) AS yv
      FROM fr, UNNEST(range(0, w)) ux(x), UNNEST(range(0, h)) uy(y)
    )
    SELECT media_id, frame_idx, TRUE AS decoded,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           ROUND(AVG(yv), 4) AS avg_y
    FROM px GROUP BY media_id, frame_idx, w, h
    """,
    category="multimodal",
)
def multimodal_video_frames_q(spark, sf_dir):
    """REAL video decode with NO dependency: Y4M (YUV4MPEG2, ffmpeg's
    uncompressed interchange container) parsed by hand — header, FRAME
    markers, C420/C444 plane arithmetic — and every-2nd-frame sampling
    emits mean luma per frame. The oracle replays the synthetic luma
    formula in SQL; integer pixel sums keep the averages exact. Completes
    the zero-dependency decoder trio (wave audio, zlib PNG, Y4M video);
    the corrupt-blob degraded path is pinned in tests/test_pipeline.py."""
    from hpcc_platform_spark.pipeline.multimodal import (
        synth_y4m_table,
        video_frame_features,
    )

    return video_frame_features(
        synth_y4m_table(spark, 40).repartition(8, "media_id"),
        every_n=2,
        max_frames=4,
    )


# The persisted/partitioned IVF form has the same stride-centroid +
# tie-break semantics as ann_ivf, so the identical oracle applies.
from hpcc_platform_spark.queries.registry import REGISTRY as _REG  # noqa: E402


@query(
    "ann_ivf_partitioned",
    oracle=_REG["ann_ivf"].oracle,
    category="similarity",
)
def ann_ivf_partitioned_q(spark, sf_dir):
    """IVF with the index MATERIALIZED the way 100 TB demands: nearest-
    centroid assignments written partitionBy(cid), centroids in an
    underscore sidecar — a probe then reads ONLY the nprobe matching
    partitions (cid IN (...) lands in the scan's PartitionFilters,
    plan-asserted in tests) before any distance math. Same semantics as
    ann_ivf, so the same oracle verifies the probed results."""
    import os

    from hpcc_platform_spark.pipeline.similarity import (
        ivf_index_build,
        ivf_index_probe,
    )

    (emb,) = tables(spark, sf_dir, "embeddings")
    path = os.path.join(
        "/tmp/hpcc_platform_spark_scratch",
        f"ivf_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    ivf_index_build(emb, path, centroid_stride=50)
    return ivf_index_probe(spark, path, _QVEC, k=10, nprobe=2)


@query(
    "pipeline_compose_neardup",
    oracle="""
    WITH RECURSIVE sets AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS ws
      FROM documents WHERE doc_id < 80
    ),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sets a JOIN sets b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.ws, b.ws)) /
            (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws))) >= 0.3
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS canonical_id FROM reach GROUP BY id)
    SELECT s.doc_id,
           COALESCE(c.canonical_id, s.doc_id) AS canonical_id,
           CAST(COALESCE(c.canonical_id, s.doc_id) = s.doc_id AS BOOLEAN) AS keep
    FROM sets s LEFT JOIN comp c ON c.id = s.doc_id
    """,
    category="dedup_pipeline",
)
def pipeline_compose_neardup_q(spark, sf_dir):
    """The composed near-dup pipeline end-to-end: candidate pairs (exact
    word-set Jaccard >= 0.3 on the bounded slice; LSH generates these at
    scale) -> connected components -> canonical per cluster -> keep/drop
    verdict for EVERY document (unpaired docs keep themselves). One DAG
    from raw text to the keep-list a training-data run consumes; each
    stage is the already-tested operator — this query proves they
    compose."""
    from hpcc_platform_spark.pipeline.dedup import dedup_clusters

    (docs,) = tables(spark, sf_dir, "documents")
    sliced = docs.where(F.col("doc_id") < 80)
    sets_df = sliced.select(
        "doc_id",
        F.array_distinct(
            F.filter(F.split("text", r"\s+"), lambda w: w != "")
        ).alias("ws"),
    )
    a = sets_df.select(F.col("doc_id").alias("id_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col("doc_id").alias("id_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = (F.size("ws_a") + F.size("ws_b")).cast("double") - inter
    cand = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where((inter / union) >= 0.3)
        .select("id_a", "id_b")
    )
    clusters = dedup_clusters(cand).withColumnRenamed("id", "doc_id")
    return (
        sliced.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("canonical_id", "doc_id").alias("canonical_id"),
            (F.coalesce("canonical_id", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


@query(
    "bm25_keyword_search",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS dl FROM base),
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             SUM(dl) / COUNT(*) AS avgdl
      FROM dl
    ),
    toks AS (SELECT doc_id, unnest(ws) AS term FROM base),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks WHERE term IN ('merge', 'scan', 'hash')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term)
    SELECT t.doc_id,
           ROUND(SUM(
             ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
             * t.tf * (1.2 + 1) /
             (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
           ), 4) AS bm25
    FROM tf t
    JOIN dfreq d USING (term)
    JOIN dl l USING (doc_id), stats s
    GROUP BY t.doc_id
    ORDER BY bm25 DESC, t.doc_id
    LIMIT 15
    """,
    category="textstats",
)
def bm25_keyword_search_q(spark, sf_dir):
    """Okapi BM25 top-k keyword search: the scored-retrieval layer over
    the reference's boolean text-search semantics (thorstep.cpp n-way
    merge joins retrieve; this ranks). Doc lengths are map-only
    size(filter(split)); the explode is term-filtered before its shuffle;
    N/avgdl broadcast back from a 1-row aggregate."""
    from hpcc_platform_spark.pipeline.ranking import bm25_search

    (docs,) = tables(spark, sf_dir, "documents")
    return bm25_search(docs, ["merge", "scan", "hash"], k=15)


@query(
    "tfidf_top_terms",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    toks AS (SELECT doc_id, unnest(ws) AS term FROM base),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tf)
    SELECT t.doc_id, t.term,
           ROUND(t.tf * (ln((1 + n.n_docs) / (1 + d.df)) + 1), 4) AS tfidf
    FROM tf t JOIN dfreq d USING (term), n
    WHERE t.doc_id < 40
    """,
    category="textstats",
)
def tfidf_top_terms_q(spark, sf_dir):
    """Full tf-idf index build (smooth idf, sklearn convention),
    restricted to a doc_id slice so the oracle frame stays small. The
    build is two key shuffles (doc_id+term, then term); the df and N
    sides come back as broadcasts."""
    from hpcc_platform_spark.pipeline.ranking import tfidf_vectors

    (docs,) = tables(spark, sf_dir, "documents")
    return tfidf_vectors(docs).where(F.col("doc_id") < 40)


@query(
    "doc_chunking",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    nn AS (SELECT doc_id, ws, len(ws) AS n FROM base WHERE len(ws) > 0),
    starts AS (
      SELECT doc_id, ws, n, unnest(generate_series(0, n - 1, 40)) AS start
      FROM nn
    )
    SELECT doc_id,
           CAST(start / 40 AS BIGINT) AS chunk_index,
           CAST(len(ws[start + 1 : least(start + 50, n)]) AS INT)
             AS n_chunk_tokens,
           array_to_string(ws[start + 1 : least(start + 50, n)], ' ')
             AS chunk_text
    FROM starts
    """,
    category="textstats",
)
def doc_chunking_q(spark, sf_dir):
    """Overlapping token-window chunking (50-token windows, stride 40):
    the training-data packing pass. Map-only — split, sequence() of
    window starts, explode, slice; zero shuffles."""
    from hpcc_platform_spark.pipeline.chunking import chunk_documents

    (docs,) = tables(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_size=50, stride=40)


@query(
    "corpus_bigrams",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    nn AS (SELECT doc_id, ws, len(ws) AS n FROM base WHERE len(ws) > 1),
    grams AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS bigram
      FROM nn, unnest(generate_series(1, n - 1)) AS t(i)
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM grams GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    category="textstats",
)
def corpus_bigrams_q(spark, sf_dir):
    """Corpus-wide bigram frequency (top 20, count-then-lexical order):
    adjacent-token pairs via zip_with over two shifted slices of the
    token array (map-side), then a single key shuffle for the count and
    TakeOrderedAndProject for the top-k."""
    (docs,) = tables(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda w: w != "")
    # >=2-tokens guard on RAW text + tokenize once (the change-#19
    # pattern: a size(ws)>1 guard predicate-pushes below the projection
    # re-inlining the tokenizer into the scan filter).
    base = (
        docs.where(F.col("text").rlike(r"\S\s+\S"))
        .select(ws.alias("ws"))
        .select("ws", F.size("ws").alias("n"))
    )
    grams = F.zip_with(
        F.slice(F.col("ws"), 1, F.col("n") - 1),
        F.slice(F.col("ws"), 2, F.col("n") - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        base.select(F.explode(grams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


_URL_CASES = [
    (0, "see https://Example.com/page and http://example.com/other for info"),
    (1, "dup https://example.com/page https://example.com/page twice"),
    (2, "ports http://host.io:8080/x?q=1 and bare https://host.io"),
    (3, "punct (https://en.wiki.org/wiki/A_(b)) tail https://t.co/xYz, done"),
    (4, "no urls here just words"),
    (5, "quoted \"https://q.example.net/path\" and <https://angle.example.net/>"),
    (6, "sub https://a.b.cdn.example.org/asset.js end"),
]


def _url_values_sql() -> str:
    return ", ".join(
        "({}, '{}')".format(i, t.replace("'", "''")) for i, t in _URL_CASES
    )


@query(
    "url_domain_stats",
    oracle=f"""
    WITH docs(doc_id, text) AS (VALUES {_url_values_sql()}),
    urls AS (
      SELECT doc_id,
             unnest(regexp_extract_all(text,
               'https?://[^\\s"''<>)\\]]+')) AS url
      FROM docs
    ),
    hosted AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, 'https?://([^/\\s:?#]+)', 1)) AS domain
      FROM urls
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hosted GROUP BY domain
    """,
    category="cleaning",
)
def url_domain_stats_q(spark, sf_dir):
    """URL extraction + per-domain stats (the allow/deny-list input of
    corpus prep): regexp_extract_all → explode → host normalize →
    domain groupBy, all JVM-side, over pinned adversarial cases (ports,
    trailing punctuation, quoting, case-folding hosts)."""
    from hpcc_platform_spark.pipeline.cleaning import domain_stats

    docs = inline_dataset(spark, _URL_CASES, "doc_id int, text string")
    return domain_stats(docs)


@query(
    "sequence_packing",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    nn AS (SELECT doc_id, ws, len(ws) AS n FROM base WHERE len(ws) > 0),
    starts AS (
      SELECT doc_id, ws, n, unnest(generate_series(0, n - 1, 40)) AS start
      FROM nn
    ),
    chunks AS (
      SELECT doc_id,
             CAST(start / 40 AS BIGINT) AS chunk_index,
             CAST(len(ws[start + 1 : least(start + 50, n)]) AS INT) AS toks
      FROM starts
    ),
    packed AS (
      SELECT doc_id, chunk_index, toks,
             CAST(FLOOR((SUM(toks) OVER (ORDER BY doc_id, chunk_index
                    ROWS UNBOUNDED PRECEDING) - toks) / 200.0) AS BIGINT)
               AS bin_id
      FROM chunks
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM packed GROUP BY bin_id
    """,
    category="textstats",
)
def sequence_packing_q(spark, sf_dir):
    """Sequence packing for training batches: chunk (50/40), then
    offset-bucket chunks into 200-token bins with ONE window cumsum —
    deterministic, SQL-expressible packing (per-bin chunk/token totals
    returned). The unpartitioned window is the test form; partition_col
    gives the keyed 100 TB form."""
    from hpcc_platform_spark.pipeline.chunking import chunk_documents, pack_sequences

    (docs,) = tables(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_size=50, stride=40)
    packed = pack_sequences(chunks, budget=200)
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("n_tokens"),
    )


@query(
    "hash_split_train_val_test",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('exp1' || CAST(doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) % 100 AS bucket
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    category="textstats",
)
def hash_split_q(spark, sf_dir):
    """Deterministic train/val/test split by content hash (md5 bucket of
    salt||key): same key → same split across runs, engines, and
    partitionings — the content-addressed generalization of the
    reference's deterministic ENTH/SAMPLE (eclhelper.hpp:899/:913).
    Map-only; the oracle recomputes the identical bucket formula."""
    from hpcc_platform_spark.pipeline.sampling import hash_split

    (docs,) = tables(spark, sf_dir, "documents")
    return hash_split(
        docs.where(F.col("doc_id") < 100).select("doc_id"),
        "doc_id",
        {"train": 80, "val": 10, "test": 10},
        salt="exp1",
    ).select("doc_id", "split")


@query(
    "semantic_dedup",
    oracle=f"""
    WITH RECURSIVE e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    b AS (SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e),
    cand AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE list_dot_product(a.v,b2.v) /
            (sqrt(list_dot_product(a.v,a.v)) * sqrt(list_dot_product(b2.v,b2.v)))
            >= 0.35
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION SELECT id_b, id_a FROM cand
    ),
    verts AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, comp) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e2.dst, r.comp FROM reach r JOIN edges e2 ON e2.src = r.id
    ),
    comp AS (SELECT id, MIN(comp) AS canonical_id FROM reach GROUP BY id)
    SELECT e.vec_id,
           COALESCE(c.canonical_id, e.vec_id) AS canonical_id,
           COALESCE(c.canonical_id, e.vec_id) = e.vec_id AS keep
    FROM e LEFT JOIN comp c ON c.id = e.vec_id
    """,
    category="similarity",
)
def semantic_dedup_q(spark, sf_dir):
    """Semantic (embedding-space) dedup, SemDeDup-style: LSH sign-bucket
    candidate pairs → exact-cosine verification → connected components →
    keep only each cluster's canonical (min-id) member. Pure composition
    of the shipped stages (embedding_near_dup_pairs + dedup_clusters) —
    bucket equi-join, key-shuffle label propagation, one left join to
    mark survivors; never an n² pair space."""
    from hpcc_platform_spark.pipeline.dedup import dedup_clusters
    from hpcc_platform_spark.pipeline.similarity import embedding_near_dup_pairs

    (emb,) = tables(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, _PLANES, threshold=0.35)
    comp = dedup_clusters(pairs)  # (id, canonical_id)
    return (
        emb.select("vec_id")
        .join(comp, F.col("id") == F.col("vec_id"), "left_outer")
        .select(
            "vec_id",
            F.coalesce(F.col("canonical_id"), F.col("vec_id")).alias("canonical_id"),
            (
                F.coalesce(F.col("canonical_id"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("keep"),
        )
    )


@query(
    "bigram_lm_quality",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents
    ),
    nn AS (SELECT doc_id, ws, len(ws) AS n FROM base WHERE len(ws) > 1),
    grams AS (
      SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
      FROM nn, unnest(generate_series(1, n - 1)) AS t(i)
    ),
    big_c AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c12
      FROM grams GROUP BY w1, w2
    ),
    uni_c AS (
      SELECT w1, CAST(COUNT(*) AS DOUBLE) AS c1 FROM grams GROUP BY w1
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(ln(b.c12 / u.c1)), 4) AS mean_logp,
           ROUND(exp(-AVG(ln(b.c12 / u.c1))), 4) AS perplexity
    FROM grams g
    JOIN big_c b ON b.w1 = g.w1 AND b.w2 = g.w2
    JOIN uni_c u ON u.w1 = g.w1
    GROUP BY g.doc_id
    """,
    category="textstats",
)
def bigram_lm_quality_q(spark, sf_dir):
    """Corpus bigram-LM quality scoring: per-document mean log P(w2|w1)
    and perplexity under the corpus's own MLE bigram model — the cheap
    LM filter that flags garbled text before model-based scoring. Map-only
    gram extraction; key shuffles only (see pipeline.textstats)."""
    from hpcc_platform_spark.pipeline.textstats import bigram_lm_scores

    (docs,) = tables(spark, sf_dir, "documents")
    return bigram_lm_scores(docs)


@query(
    "multimodal_jpeg_metadata",
    oracle="""
    WITH meta(media_id, w, h, comp, prog) AS (VALUES
      (0, 64, 48, 3, false), (1, 128, 96, 3, true), (2, 16, 16, 1, false),
      (3, 320, 200, 3, false), (4, 8, 1024, 1, true)
    )
    SELECT media_id,
           CASE WHEN media_id = 5 THEN false ELSE true END AS parsed,
           CASE WHEN media_id = 5 THEN NULL ELSE w END AS width,
           CASE WHEN media_id = 5 THEN NULL ELSE h END AS height,
           CASE WHEN media_id = 5 THEN NULL ELSE comp END AS components,
           CASE WHEN media_id = 5 THEN NULL ELSE prog END AS progressive
    FROM meta
    UNION ALL
    SELECT 5, false, NULL, NULL, NULL, NULL
    """,
    category="multimodal",
)
def multimodal_jpeg_metadata_q(spark, sf_dir):
    """JPEG metadata extraction — REAL marker walk to SOF (width/height/
    components/progressive) with per-row corrupt-blob degradation; the
    fixture blobs are structurally valid JPEG prefixes built in-test and
    the oracle pins the expected metadata values."""
    from hpcc_platform_spark.pipeline.multimodal import (
        jpeg_metadata,
        synth_jpeg_header,
    )

    specs = [(0, 64, 48, 3, False), (1, 128, 96, 3, True), (2, 16, 16, 1, False),
             (3, 320, 200, 3, False), (4, 8, 1024, 1, True)]
    rows = [(i, bytearray(synth_jpeg_header(w, h, c, p))) for i, w, h, c, p in specs]
    rows.append((5, bytearray(b"corrupt not a jpeg")))
    df = inline_dataset(spark, rows, "media_id long, data binary")
    return jpeg_metadata(df)
