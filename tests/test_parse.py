"""PARSE pattern-algebra engine behavior (named captures, positions,
alternation, optionality)."""

from __future__ import annotations

from hpcc_platform_spark.operators.parse import (
    NUMBER,
    WORD,
    parse,
    pat_capture,
    pat_literal,
    pat_opt,
    pat_regex,
)


def test_parse_named_captures_and_positions(spark):
    df = spark.createDataFrame(
        [(1, "order 12 for alice, order 7 for bob")], "id int, line string"
    )
    pattern = (
        pat_literal("order ")
        + pat_capture(NUMBER, "qty")
        + pat_literal(" for ")
        + pat_capture(WORD, "who")
    )
    rows = parse(df, "line", pattern, keep_cols=["id"]).collect()
    assert [(r.qty, r.who, r.match_ord) for r in rows] == [
        ("12", "alice", 1),
        ("7", "bob", 2),
    ]
    assert rows[0].match_start == 1  # 1-based MATCHPOSITION
    assert rows[1].match_start == 21


def test_parse_alternation_and_opt(spark):
    df = spark.createDataFrame(
        [(1, "cat cats dog dogs bird")], "id int, line string"
    )
    animal = (pat_literal("cat") | pat_literal("dog")) + pat_opt(pat_literal("s"))
    rows = parse(df, "line", pat_regex(r"\b") + animal + pat_regex(r"\b"), ["id"]).collect()
    assert [r.match_text for r in rows] == ["cat", "cats", "dog", "dogs"]


def test_parse_no_matches_yields_empty(spark):
    df = spark.createDataFrame([(1, "nothing here")], "id int, line string")
    out = parse(df, "line", pat_literal("zzz"), ["id"])
    assert out.count() == 0
    assert out.columns == ["id", "match_text", "match_start", "match_ord"]
