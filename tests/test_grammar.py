"""PARSE tier 2: Earley RULE-grammar engine (the Tomita-GLR analogue)."""

from __future__ import annotations

from hpcc_platform_spark.operators.grammar import (
    Grammar,
    arithmetic_grammar,
    parse_grammar,
)


def test_arithmetic_precedence_and_parens(spark):
    g = arithmetic_grammar()
    rows = [
        (1, "2 + 3 * 4", 14.0),
        (2, "(2 + 3) * 4", 20.0),
        (3, "10 - 4 - 3", 3.0),          # left associativity
        (4, "100 / 5 / 2", 10.0),
        (5, "((1))", 1.0),
        (6, "2 +", None),                # reject: incomplete
        (7, "two plus two", None),       # reject: unlexable
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in rows], "id long, text string")
    got = {r.id: (r.parse_ok, r.value) for r in
           parse_grammar(df, "text", g, start="expr", keep_cols=["id"]).collect()}
    for i, _t, expect in rows:
        ok, val = got[i]
        assert ok == (expect is not None)
        if expect is not None:
            assert abs(val - expect) < 1e-9


def test_ambiguous_grammar_still_parses(spark):
    # S := S S | 'a' — exponentially ambiguous; GLR-class grammars must
    # still terminate and yield a derivation.
    g = Grammar()
    g.token("A", r"a")
    g.rule("S", ["S", "S"], action=lambda x, y: x + y)
    g.rule("S", ["A"], action=lambda _t: 1.0)
    df = spark.createDataFrame([(1, "a a a a a")], "id long, text string")
    row = parse_grammar(df, "text", g, start="S", keep_cols=["id"]).head()
    assert row.parse_ok and row.value == 5.0  # any derivation counts all a's


def test_left_recursion_deep_input(spark):
    g = arithmetic_grammar()
    text = " + ".join(["1"] * 60)  # 60-term left-recursive chain
    df = spark.createDataFrame([(1, text)], "id long, text string")
    row = parse_grammar(df, "text", g, start="expr", keep_cols=["id"]).head()
    assert row.parse_ok and row.value == 60.0
