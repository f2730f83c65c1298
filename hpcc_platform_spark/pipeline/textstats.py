"""Text analysis: token counting, quality features, language ID.

All JVM-side split/filter/array ops — no Python UDFs; these run in the scan
stage at 100 TB (map-only, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = lambda c: F.filter(F.split(F.col(c), r"\s+"), lambda w: w != "")  # noqa: E731

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Deterministic + embedded (no model files); real pipelines swap in fastText.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
    "it": ["il", "la", "che", "e", "un", "una", "per", "non", "sono", "con"],
}


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count per row (adds ``n_tokens``)."""
    return df.withColumn("n_tokens", F.size(_TOKENS(text_col)).cast("int"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Cheap quality features: token count, mean token length (chars per
    token), distinct-token count, type/token ratio. NULL-safe on empty
    docs (ratios null, not NaN)."""
    ws = _TOKENS(text_col)
    n = F.size(ws)
    n_uniq = F.size(F.array_distinct(ws))
    return (
        df.withColumn("n_tokens", n.cast("int"))
        .withColumn(
            "mean_token_len",
            F.round(
                F.length(text_col) / F.nullif(n.cast("double"), F.lit(0.0)), 4
            ),
        )
        .withColumn("n_unique_tokens", n_uniq.cast("int"))
        .withColumn(
            "unique_ratio",
            F.round(
                n_uniq.cast("double") / F.nullif(n.cast("double"), F.lit(0.0)), 4
            ),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: score each language by the fraction of
    tokens in its stopword list; argmax wins (ties → 'und').

    Expressed as array intersections per language — map-only. A real
    deployment swaps in a fastText/CLD3 Pandas UDF with the same output
    contract (adds ``lang_pred``, ``lang_score``).
    """
    ws = F.transform(_TOKENS(text_col), F.lower)
    n = F.size(ws).cast("double")
    def stop_match(stop_list: list[str]):
        # Closure factory: a 2-param/default-arg lambda would be bound by
        # PySpark as (element, array_index) and corrupt the capture.
        lits = F.array(*[F.lit(s) for s in stop_list])
        return lambda w: F.array_contains(lits, w)

    scores = F.array(
        *[
            F.struct(
                (
                    F.size(F.filter(ws, stop_match(stop))).cast("double")
                    / F.nullif(n, F.lit(0.0))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, stop in STOPWORDS.items()
        ]
    )
    best = F.array_max(scores)
    return df.withColumn(
        "lang_pred",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
    ).withColumn("lang_score", F.round(F.coalesce(best["score"], F.lit(0.0)), 4))
