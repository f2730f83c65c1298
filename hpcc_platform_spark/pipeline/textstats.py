"""Text analysis: token counting, quality features, language ID.

All JVM-side split/filter/array ops — no Python UDFs; these run in the scan
stage at 100 TB (map-only, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TOKENS = lambda c: F.filter(F.split(F.col(c), r"\s+"), lambda w: w != "")  # noqa: E731


def _grams_persist(grams: DataFrame) -> DataFrame:
    """Dataset-level CSE for the bigram stream: three consumers (bigram
    counts, unigram counts, the per-doc score join) would each re-run
    tokenize + zip_with + explode over the corpus otherwise."""
    from hpcc_platform_spark.plans.persist import auto_persist

    return auto_persist(grams)

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
    # Bind the tokenization once: as a free expression it would be inlined
    # into every consumer below (size / mean / distinct / ratio), and the
    # interpreted higher-order-function eval re-runs each copy per row.
    # CollapseProject keeps the boundary for non-cheap multiply-referenced
    # aliases, so the split+filter runs once per row.
    df = df.withColumn("__ws__", _TOKENS(text_col)).withColumn(
        "__nu__", F.size(F.array_distinct(F.col("__ws__")))
    )
    n = F.size(F.col("__ws__"))
    n_uniq = F.col("__nu__")
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
        .drop("__ws__", "__nu__")
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language ID: score each language by the fraction of
    tokens in its stopword list; argmax wins (ties → 'und').

    Expressed as array intersections per language — map-only. A real
    deployment swaps in a fastText/CLD3 Pandas UDF with the same output
    contract (adds ``lang_pred``, ``lang_score``).
    """
    # Bind tokenization and the argmax struct as real columns: as free
    # expressions they are textually inlined per consumer (5 language
    # scores × (filter + size) + 2 output columns × the whole 5-way argmax),
    # and interpreted HOF eval re-runs every copy per row. CollapseProject
    # keeps projection boundaries for non-cheap multiply-referenced aliases.
    df = df.withColumn("__ws__", F.transform(_TOKENS(text_col), F.lower))
    ws = F.col("__ws__")
    n = F.size(ws).cast("double")
    def stop_match(stop_list: list[str]):
        # Closure factory: a 2-param/default-arg lambda would be bound by
        # PySpark as (element, array_index) and corrupt the capture.
        lits = F.lit(list(stop_list))  # one py4j call, not one per word
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
    best = F.col("__best__")
    return (
        df.withColumn("__best__", F.array_max(scores))
        .withColumn(
            "lang_pred",
            F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")),
        )
        .withColumn("lang_score", F.round(F.coalesce(best["score"], F.lit(0.0)), 4))
        .drop("__ws__", "__best__")
    )


# -- character-trigram language ID (the production-shaped path) -------------
#
# Per-language trigram log-probability profiles derived at import time from
# small embedded seed corpora (deterministic, no model files) — the classic
# Cavnar-Trenkle n-gram profile method. Both the Spark plan and the DuckDB
# oracle consume the SAME literal profiles (shared-literal pattern), so the
# classifier is fully oracle-checkable. A real deployment regenerates the
# profiles from real corpora (or swaps in fastText) behind the same API.

_SEED_CORPORA = {
    "en": "the quick brown fox jumps over the lazy dog and this is a test of "
          "the language identification system which should work on english "
          "text with common words that appear in everyday writing for people",
    "de": "der schnelle braune fuchs springt über den faulen hund und dies "
          "ist ein test des systems zur spracherkennung das auf deutschen "
          "texten mit häufigen wörtern funktionieren sollte für die menschen",
    "fr": "le renard brun rapide saute par dessus le chien paresseux et ceci "
          "est un test du système d'identification de la langue qui devrait "
          "fonctionner sur des textes français avec des mots courants pour les",
    "es": "el rápido zorro marrón salta sobre el perro perezoso y esta es una "
          "prueba del sistema de identificación de idiomas que debería "
          "funcionar en textos españoles con palabras comunes para la gente",
    "it": "la rapida volpe marrone salta sopra il cane pigro e questo è un "
          "test del sistema di identificazione della lingua che dovrebbe "
          "funzionare su testi italiani con parole comuni per le persone",
}
_PROFILE_K = 64
_UNSEEN_LOGP = -12.0


def _trigram_profiles() -> dict[str, dict[str, float]]:
    import math
    from collections import Counter

    out = {}
    for lang, corpus in _SEED_CORPORA.items():
        text = corpus.lower()
        grams = Counter(text[i : i + 3] for i in range(len(text) - 2))
        total = sum(grams.values())
        top = grams.most_common(_PROFILE_K)
        out[lang] = {g: round(math.log((c + 1) / (total + 1000)), 6) for g, c in top}
    return out


TRIGRAM_PROFILES = _trigram_profiles()


def language_id_ngram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-trigram language ID (Cavnar-Trenkle profile scoring):
    mean log-probability of the document's trigrams under each language
    profile; argmax wins, empty/too-short docs → 'und'.

    Fully JVM-side: trigram extraction is transform(sequence(...)) over
    the string, scoring is an ``aggregate`` fold against literal maps —
    map-only at any scale, no Python, no shuffle."""
    # CASE guard: Spark's sequence(1, stop) counts DOWN when stop < 1, so a
    # too-short string must short-circuit to an empty array.
    # Bound as a real column (see language_id): as a free expression the
    # extraction is inlined into every aggregate fold AND each fold's
    # denominator — ~2 copies per language per output column, all re-run
    # per row by the interpreted HOF eval.
    tri_expr = F.expr(
        f"CASE WHEN length({text_col}) >= 3 THEN"
        f" transform(sequence(1, length({text_col}) - 2),"
        f" i -> lower(substr({text_col}, i, 3)))"
        f" ELSE array() END"
    )
    df = df.withColumn("__tri__", tri_expr)
    tri = F.col("__tri__")
    n = F.size(tri)

    def lang_score(profile: dict[str, float]):
        pairs = [x for g, lp in profile.items() for x in (F.lit(g), F.lit(lp))]
        m = F.create_map(*pairs)
        # nullif guard: __best__ is now computed unconditionally (bound
        # column), so an empty doc must yield NULL, not ANSI divide-by-zero
        # (the n>=1 output guard below makes the NULL unused).
        return F.aggregate(
            tri,
            F.lit(0.0),
            lambda acc, t: acc + F.coalesce(m[t], F.lit(_UNSEEN_LOGP)),
        ) / F.nullif(n.cast("double"), F.lit(0.0))

    scored = F.array(
        *[
            F.struct(
                F.round(lang_score(prof), 4).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, prof in TRIGRAM_PROFILES.items()
        ]
    )
    best = F.col("__best__")
    return (
        df.withColumn("__n_tri__", n)
        .withColumn("__best__", F.array_max(scored))
        .withColumn(
            "lang_pred",
            F.when(F.col("__n_tri__") >= 1, best["lang"]).otherwise(F.lit("und")),
        )
        .withColumn(
            "lang_score",
            F.when(F.col("__n_tri__") >= 1, best["score"]).otherwise(F.lit(None).cast("double")),
        )
        .drop("__n_tri__", "__tri__", "__best__")
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """N-gram language-model quality scoring: train a corpus bigram MLE
    (P(w2|w1) = c(w1,w2)/c(w1)) and score each document by the mean log
    probability of its bigrams — low scores flag atypical/garbled text,
    the classic cheap LM filter before expensive model-based scoring.

    All-JVM: bigrams from zip_with over shifted slices (map-only), then
    key shuffles only (bigram counts, unigram counts, count joins back
    on the gram keys, per-doc mean) — no broadcast hints: the gram
    tables grow with vocabulary², so AQE decides at runtime (they
    broadcast at test scale, shuffle at corpus scale).
    Scoring the training corpus itself means every bigram has count ≥ 1 —
    no smoothing needed, no -inf. Returns (id, n_bigrams, mean_logp,
    perplexity), floats rounded to 4."""
    ws = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    # The >=2-tokens guard as a RAW-TEXT regex (two non-ws runs separated
    # by whitespace): a `where(size(ws) > 1)` gets predicate-pushed below
    # the tokenizing projection with the alias re-inlined, so the filter
    # itself would re-tokenize every row at the scan.
    base = (
        docs.where(F.col(text_col).rlike(r"\S\s+\S"))
        .select(F.col(id_col), ws.alias("ws"))  # tokenize once, not per use
        .select(id_col, "ws", F.size("ws").alias("n"))
    )
    grams = _grams_persist(base.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("ws"), 1, F.col("n") - 1),
                F.slice(F.col("ws"), 2, F.col("n") - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("g"),
    ).select(id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")))
    big_c = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("c12")
    )
    uni_c = grams.groupBy(F.col("w1").alias("u1")).agg(
        F.count(F.lit(1)).cast("double").alias("c1")
    )
    logp = F.log(F.col("c12") / F.col("c1"))
    return (
        grams.join(big_c, ["w1", "w2"])
        .join(uni_c, F.col("u1") == F.col("w1"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("mean_logp"),
            F.round(F.exp(-F.avg(logp)), 4).alias("perplexity"),
        )
    )
