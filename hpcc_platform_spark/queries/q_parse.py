"""PARSE / text-tokenization coverage (SURVEY.md §2.10).

The reference's PARSE (TAKparse :934) spans a regex-NFA engine
(common/thorhelper/thorrparse.cpp) and a Tomita GLR parser
(thortparse.cpp). The regex/tokenize subset lowers to split +
explode — fully JVM-side; grammar parsing is a later-round mapInPandas
UDTF (see operators roadmap).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hpcc_platform_spark.queries.registry import query, tables


@query(
    "parse_tokenize",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS word
      FROM documents
    )
    SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM words GROUP BY word
    """,
    category="parse",
)
def parse_tokenize(spark, sf_dir):
    """PARSE tokenize-and-match (TAKparse :934, regex engine subset): split
    documents into words, one row per match, aggregate term frequencies —
    the inverted-index build of the reference's ts.ecl text-search setup."""
    (docs,) = tables(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda w: w != "")
        ).alias("word"),
    )
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


@query(
    "parse_extract_positions",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, unnest(ws) AS word,
           CAST(unnest(range(1, len(ws) + 1)) AS INT) AS wpos
    FROM toks
    """,
    category="parse",
)
def parse_extract_positions(spark, sf_dir):
    """PARSE with position capture — word + 1-based word position per doc
    (the {word, doc, wpos} shape of the reference's textSearchIndex,
    testing/regress/ecl/setup/ts.ecl:57)."""
    (docs,) = tables(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") < 50).select(
        "doc_id",
        F.posexplode(F.filter(F.split("text", r"\s+"), lambda w: w != "")).alias(
            "pos0", "word"
        ),
    ).select("doc_id", "word", (F.col("pos0") + 1).cast("int").alias("wpos"))


@query(
    "parse_pattern_scan",
    oracle="""
    WITH ms AS (
      SELECT doc_id, regexp_extract_all(text, 'b[a-z]+') AS m
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, unnest(m) AS match_text,
           CAST(unnest(range(1, len(m) + 1)) AS INT) AS match_ord
    FROM ms
    """,
    category="parse",
)
def parse_pattern_scan(spark, sf_dir):
    """PARSE with the PATTERN algebra (no_pat_* constructors → regex-NFA
    engine): scan for words starting with 'b', one row per match with its
    ordinal — the Arrow-batched mapInPandas scanner."""
    from hpcc_platform_spark.operators.parse import (
        parse,
        pat_charset,
        pat_regex,
        pat_repeat,
    )

    (docs,) = tables(spark, sf_dir, "documents")
    pattern = pat_regex("b") + pat_repeat(pat_charset("a-z"), 1)
    return parse(
        docs.where(F.col("doc_id") < 100), "text", pattern, keep_cols=["doc_id"]
    ).select("doc_id", "match_text", "match_ord")


@query(
    "parse_rule_grammar",
    oracle="""
    SELECT l_orderkey, l_linenumber, TRUE AS parse_ok,
           CAST((l_partkey + l_linenumber) * l_suppkey AS DOUBLE) AS value
    FROM lineitem WHERE l_orderkey <= 200
    """,
    category="parse",
)
def parse_rule_grammar(spark, sf_dir):
    """PARSE with a full RULE grammar (TAKparse :934 tier 2 — the Tomita
    GLR engine, thortparse.cpp): expression text is parsed by an Earley CFG
    (left-recursive arithmetic with precedence/parens) whose semantic
    actions compute the value — the oracle recomputes it arithmetically
    from the source columns, proving the parse end-to-end."""
    from hpcc_platform_spark.operators.grammar import arithmetic_grammar, parse_grammar

    (li,) = tables(spark, sf_dir, "lineitem")
    with_text = li.where(F.col("l_orderkey") <= 200).select(
        "l_orderkey",
        "l_linenumber",
        F.concat(
            F.lit("("), F.col("l_partkey").cast("string"),
            F.lit(" + "), F.col("l_linenumber").cast("string"),
            F.lit(") * "), F.col("l_suppkey").cast("string"),
        ).alias("text"),
    )
    return parse_grammar(
        with_text, "text", arithmetic_grammar(), start="expr",
        keep_cols=["l_orderkey", "l_linenumber"],
    )


@query(
    "xml_parse_rows",
    oracle="""
    SELECT n_regionkey, CAST(n_nationkey AS INT) AS k, n_name AS name
    FROM nation
    """,
    category="parse",
)
def xml_parse_rows(spark, sf_dir):
    """XML PARSE (TAKxmlparse :939, common/thorhelper/thorxmlread.cpp row
    xpath extraction): an XML text field containing repeated <n> elements is
    exploded into one output row per element. Round-trip construction: the
    per-region document is built from the nation table (order-stable via
    array_sort), then from_xml + explode recovers exactly the source rows —
    the oracle states that identity. At scale the parse is per-row and
    embarrassingly parallel; no shuffle beyond the doc-building groupBy."""
    (nation,) = tables(spark, sf_dir, "nation")
    frag = F.concat(
        F.lit("<n><k>"), F.col("n_nationkey").cast("string"),
        F.lit("</k><name>"), F.col("n_name"), F.lit("</name></n>"),
    )
    docs = (
        nation.select("n_regionkey", F.struct(F.col("n_nationkey"), frag.alias("frag")).alias("s"))
        .groupBy("n_regionkey")
        .agg(
            F.concat(
                F.lit("<doc>"),
                F.concat_ws("", F.transform(F.array_sort(F.collect_list("s")), lambda s: s["frag"])),
                F.lit("</doc>"),
            ).alias("xml")
        )
    )
    parsed = docs.select(
        "n_regionkey",
        F.from_xml("xml", "n ARRAY<STRUCT<k: INT, name: STRING>>").alias("p"),
    )
    return parsed.select("n_regionkey", F.explode("p.n").alias("r")).select(
        "n_regionkey", F.col("r.k").alias("k"), F.col("r.name").alias("name")
    )
