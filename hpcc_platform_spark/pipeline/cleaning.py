"""Corpus cleaning for LLM training data: boilerplate segment removal,
within-document repetition signals, PII redaction.

These are the C4/RefinedWeb/Gopher-style cleanup passes that run between
dedup and tokenization. No reference analogue (the reference stops at
generic string functions); they're first-class here per the LLM-pipeline
brief, built the same way as the dedup family: JVM expressions in the hot
path, key shuffles only, no Python row loops.

Scale shapes:
- boilerplate removal is explode -> groupBy(segment hash) -> join back ->
  re-aggregate: two key shuffles over the segment stream, the same
  cardinality class as the MinHash band join.
- repetition scores are explode -> groupBy(doc, gram): one key shuffle,
  partial aggregation map-side.
- PII redaction is map-only regexp_replace chains (whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_docs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str | None = None,
    words_per_segment: int = 10,
) -> DataFrame:
    """Split documents into ordered segments: by ``delim`` (newline for
    web-scrape text) or, when the corpus has no structural delimiter (the
    testdata documents are single-line), fixed ``words_per_segment`` token
    windows. Output: (id, seg_idx, segment) — the unit stream every
    segment-level pass consumes."""
    if delim is not None:
        segs = F.split(F.col(text_col), delim, -1)
        staged = df
    else:
        # Bind the tokenization once (it is consumed by both the segment
        # count and every slice — see textstats.py for the inlining trap).
        staged = df.withColumn(
            "__wseg__",
            F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != ""),
        )
        words = F.col("__wseg__")
        n_seg = F.ceil(F.size(words) / F.lit(words_per_segment)).cast("int")
        segs = F.transform(
            F.sequence(F.lit(0), F.greatest(n_seg - 1, F.lit(0))),
            lambda i: F.concat_ws(
                " ", F.slice(words, i * words_per_segment + 1, words_per_segment)
            ),
        )
    pos = F.posexplode(segs)
    return staged.select(F.col(id_col), pos.alias("seg_idx", "segment")).where(
        F.col("segment") != ""
    )


def remove_boilerplate_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 1,
    delim: str | None = None,
    words_per_segment: int = 10,
) -> DataFrame:
    """C4-style boilerplate removal: drop every segment that appears in
    more than ``max_doc_freq`` distinct documents (nav bars, cookie
    banners, license footers), then reassemble the remaining segments in
    their original order.

    Shape at 100 TB: segment doc-frequency is a groupBy on the segment
    (hash) — one shuffle over the segment stream; the verdict join is
    another key shuffle; reassembly is groupBy(doc) with sort_array over
    (seg_idx, segment) structs. Never quadratic, no Python.

    Output: (id, text) with the cleaned text (documents whose every
    segment was boilerplate keep an empty string — downstream length
    filters handle them, mirroring C4's pipeline order)."""
    segs = segment_docs(df, text_col, id_col, delim, words_per_segment)
    seg_df = segs.groupBy("segment").agg(
        F.countDistinct(id_col).alias("__seg_docs__")
    )
    kept = segs.join(seg_df, "segment").where(
        F.col("__seg_docs__") <= max_doc_freq
    )
    joiner = " " if delim is None else delim
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("seg_idx", "segment"))),
                lambda s: s["segment"],
            ),
            joiner,
        ).alias("__clean__")
    )
    # Left join keeps documents whose every segment was boilerplate (empty
    # text) so row counts stay stable for downstream audits — one join,
    # not a union + anti-join pair.
    return (
        df.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col), F.coalesce(F.col("__clean__"), F.lit("")).alias(text_col)
        )
    )


def repetition_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition signals (Gopher/MassiveText quality
    filters): duplicate-unigram ratio (1 - distinct/total) and the
    fraction of all word bigrams taken by the single most frequent bigram.
    High values mean looping/boilerplate text that poisons training.

    One key shuffle: explode bigrams, groupBy (doc, bigram), then a
    per-doc max/sum — partial aggregation keeps the map side light."""
    # Tokenize once (the free-expression form inlined three copies here).
    base = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "").alias("__ws__"),
    ).select(
        F.col(id_col),
        F.size("__ws__").alias("__n__"),
        F.size(F.array_distinct("__ws__")).alias("__d__"),
        F.col("__ws__"),
    )
    bigrams = base.select(
        F.col(id_col),
        F.col("__n__"),
        F.col("__d__"),
        F.explode(
            F.when(
                F.size("__ws__") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws__") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("__ws__", i), F.element_at("__ws__", i + 1)
                    ),
                ),
            ).otherwise(F.array(F.lit("")))
        ).alias("__bg__"),
    )
    per_bigram = bigrams.groupBy(id_col, "__n__", "__d__", "__bg__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    return per_bigram.groupBy(id_col, "__n__", "__d__").agg(
        F.max("__c__").alias("__top__"), F.sum("__c__").alias("__tot__")
    ).select(
        F.col(id_col),
        F.round(
            1.0 - F.col("__d__").cast("double") / F.col("__n__").cast("double"), 4
        ).alias("dup_word_ratio"),
        F.round(
            F.when(F.col("__n__") >= 2, F.col("__top__").cast("double") / F.col("__tot__").cast("double"))
            .otherwise(F.lit(0.0)),
            4,
        ).alias("top_bigram_frac"),
    )


# Patterns kept to the regex intersection both Spark (Java) and common SQL
# engines (RE2) support: character classes, bounded repeats, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    # No leading \b: "(555) ..." has no word boundary before the paren.
    ("phone", r"(?:\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
]


def pii_redact(
    df: DataFrame, text_col: str = "text", patterns=None
) -> DataFrame:
    """PII redaction: chained regexp_replace for emails, IPv4 addresses,
    phone numbers, and SSN-shaped strings. Map-only, whole-stage codegen —
    the order matters (SSN before phone would also work; email first so
    user@host never half-matches as a phone). Returns df with ``text_col``
    replaced and a ``pii_found`` flag (pre-redaction match indicator)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    c = F.col(text_col)
    found = F.lit(False)
    for _, rx, _tok in pats:
        found = found | (c.rlike(rx))
    red = c
    for _, rx, tok in pats:
        red = F.regexp_replace(red, rx, tok)
    return df.withColumn("pii_found", found).withColumn(text_col, red)


# --- URL extraction ---------------------------------------------------------
# Corpus-prep pass: pull URLs out of document text, normalize to the
# registrable host, and aggregate per-domain stats (the standard input to
# domain allow/deny filtering before training). Pattern kept to plain
# character classes so Java regex (Spark) and RE2-style engines (oracle)
# agree byte-for-byte.
_URL_RX = r"https?://[^\s\"'<>)\]]+"
_HOST_RX = r"https?://([^/\s:?#]+)"


def extract_urls(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """One row per URL occurrence: (id, url, domain). Map-only —
    regexp_extract_all + explode, host lowered for normalization."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(_URL_RX), 0)
        ).alias("url"),
    ).withColumn(
        "domain", F.lower(F.regexp_extract(F.col("url"), _HOST_RX, 1))
    )


def domain_stats(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-domain corpus stats: occurrences and distinct documents. One
    key shuffle on the (small) domain key after the map-side explode."""
    urls = extract_urls(df, text_col, id_col)
    return urls.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct(id_col).alias("n_docs"),
    )
