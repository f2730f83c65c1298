"""Data profiling (SURVEY.md §2.9): Std.DataPatterns — Profile, Benford.

Reference: ecllibrary/std/DataPatterns/Profile.ecl (fill rate, cardinality,
popular text patterns, numeric stats), Benford.ecl (first-digit law);
DISTRIBUTION (TAKdistribution :916, rtl/eclrtl/rtldistr.cpp) is the
engine-level sibling in operators.aggregate.

All profiling is one pass of groupBy/agg per request — partial aggregation
map-side, a single shuffle on the (field, value-class) key; nothing here is
driver-side row iteration, so profiles run at full input scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def benford_first_digit(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law first-significant-digit profile of a positive numeric
    column: observed count + frequency per digit 1-9 alongside the expected
    log10(1 + 1/d) frequency. The digit extraction is numeric
    (x / 10^floor(log10 x)) — identical across engines, no string-format
    dependence."""
    x = F.col(col)
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("int")
    counts = (
        df.where(x > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Total via broadcast scalar join (not an empty-partition window —
    # keeps every plan in the repo free of SinglePartition exchanges).
    total = counts.agg(F.sum("n").alias("__total__"))
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.round(F.col("n") / F.col("__total__"), 4).alias("observed_freq"),
        F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 4).alias(
            "expected_freq"
        ),
    )


def text_pattern(col: str) -> F.Column:
    """DataPatterns popular-pattern transform: uppercase→A, lowercase→a,
    digit→9, everything else kept — 'Clerk#000000036' → 'Aaaaa#999999999'."""
    c = F.regexp_replace(F.col(col), "[A-Z]", "A")
    c = F.regexp_replace(c, "[a-z]", "a")
    return F.regexp_replace(c, "[0-9]", "9")


def best_record_structure(df: DataFrame, cols: list[str]) -> DataFrame:
    """DataPatterns BestRecordStructure: recommend the tightest ECL-style
    type per (string) field from observed values — fixed STRINGn when all
    lengths equal, UNSIGNEDn/INTEGERn when all-numeric, else variable
    STRING. One aggregate pass over a tall frame."""
    tall = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("field"), F.col(c).cast("string").alias("value")
        )
        tall = part if tall is None else tall.unionAll(part)
    stats = tall.groupBy("field").agg(
        F.min(F.length("value")).alias("min_len"),
        F.max(F.length("value")).alias("max_len"),
        F.min(F.col("value").rlike("^[0-9]+$").cast("int")).alias("all_digits"),
        F.min(F.col("value").rlike("^-?[0-9]+$").cast("int")).alias("all_ints"),
    )
    return stats.select(
        "field",
        F.when(F.col("all_digits") == 1, F.concat(F.lit("UNSIGNED"), F.ceil(F.col("max_len") / 2).cast("string")))
        .when(F.col("all_ints") == 1, F.concat(F.lit("INTEGER"), F.ceil((F.col("max_len") + 1) / 2).cast("string")))
        .when(F.col("min_len") == F.col("max_len"), F.concat(F.lit("STRING"), F.col("max_len").cast("string")))
        .otherwise(F.lit("STRING"))
        .alias("best_type"),
        "min_len",
        "max_len",
    )


def profile(df: DataFrame, cols: list[str], top_patterns: int = 3) -> DataFrame:
    """Per-field profile: fill count/rate, cardinality, min/max (as
    strings), most popular text pattern. One groupBy per field over a
    single unioned tall frame — (field, pattern) keyed, partial-agg
    friendly."""
    n_total = df.count()
    tall = None
    for c in cols:
        part = df.select(
            F.lit(c).alias("field"),
            F.col(c).cast("string").alias("value"),
            text_pattern(c).alias("pattern"),
        )
        tall = part if tall is None else tall.unionAll(part)
    per_field = tall.groupBy("field").agg(
        F.count("value").alias("fill_count"),
        F.round(F.count("value") / F.lit(float(n_total)), 4).alias("fill_rate"),
        F.countDistinct("value").alias("cardinality"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    pat_counts = tall.where(F.col("pattern").isNotNull()).groupBy("field", "pattern").agg(
        F.count(F.lit(1)).alias("pn")
    )
    from pyspark.sql.window import Window

    top_pat = (
        pat_counts.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("field").orderBy(F.desc("pn"), "pattern")
            ),
        )
        .where(F.col("rn") == 1)
        .select("field", F.col("pattern").alias("top_pattern"), F.col("pn").alias("top_pattern_n"))
    )
    return per_field.join(top_pat, "field", "left")
