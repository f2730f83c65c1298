"""PARSE tier 2 — full context-free RULE grammars (SURVEY.md §2.10).

Reference: ECL's Tomita GLR engine (common/thorhelper/thortparse.cpp,
codegen ecl/hqlcpp/hqltomita.cpp) parses RULE grammars — arbitrary CFGs,
including left recursion — over tokenized text, with productions carrying
TRANSFORMs (semantic actions).

Spark-first translation: an Earley parser (same language class as GLR:
all CFGs, cubic worst case, linear on practical grammars) executed per row
inside an Arrow-batched ``mapInPandas`` scanner — map-only, parallel over
partitions, no shuffle; the grammar object is closure-captured and compiled
once per task. Productions carry Python semantic actions in place of ECL
TRANSFORMs; terminals are regex tokens.

API shape (ECL analogue in comments):

    g = Grammar()
    g.token("NUM", r"\\d+(?:\\.\\d+)?")            # PATTERN num := ...
    g.token("PLUS", r"\\+")
    g.rule("expr", ["term", "PLUS", "expr"],     # RULE expr := term '+' expr
           action=lambda t, _p, e: t + e)
    g.rule("expr", ["term"])
    ...
    parse_grammar(df, "text", g, start="expr", keep_cols=["id"])
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class _Prod:
    lhs: str
    rhs: tuple[str, ...]
    action: object  # Callable[*child_values] -> value, or None


@dataclass
class Grammar:
    """Tokenizer + CFG productions (the RULE algebra)."""

    tokens: dict[str, str] = field(default_factory=dict)  # name -> regex
    prods: list[_Prod] = field(default_factory=list)
    skip: str = r"\s+"

    def token(self, name: str, rx: str) -> None:
        self.tokens[name] = rx
        self.__dict__.pop("_spec", None)

    def rule(self, lhs: str, rhs: Sequence[str], action=None) -> None:
        if not rhs:
            # Epsilon productions would need Aycock-Horspool handling in
            # the worklist parser (a completion at its own origin can
            # miss waiters added later). Any epsilon rule is expressible
            # by inlining the empty alternative into its consumers.
            raise ValueError(
                f"empty production for {lhs!r}: rewrite without epsilon rules"
            )
        self.prods.append(_Prod(lhs, tuple(rhs), action))
        self.__dict__.pop("_by_lhs", None)

    # -- compiled caches (per process: executors compile once per task, not
    # per row — the old per-call re.compile dominated the parse cost) -------
    def _compiled_spec(self):
        spec = self.__dict__.get("_spec")
        if spec is None:
            spec = (
                [(n, re.compile(rx)) for n, rx in self.tokens.items()],
                re.compile(self.skip),
            )
            self.__dict__["_spec"] = spec
        return spec

    def _prod_indices_by_lhs(self) -> dict[str, list[int]]:
        by = self.__dict__.get("_by_lhs")
        if by is None:
            by = {}
            for i, p in enumerate(self.prods):
                by.setdefault(p.lhs, []).append(i)
            self.__dict__["_by_lhs"] = by
        return by

    # -- lexer ---------------------------------------------------------------
    def lex(self, text: str) -> list[tuple[str, str]] | None:
        """Longest-match tokenization; None if any char can't lex."""
        spec, skip = self._compiled_spec()
        out, i, n = [], 0, len(text)
        while i < n:
            m = skip.match(text, i)
            if m and m.end() > i:
                i = m.end()
                continue
            best = None
            for name, rx in spec:
                mm = rx.match(text, i)
                if mm and (best is None or mm.end() > best[1]):
                    best = (name, mm.end())
            if best is None:
                return None
            out.append((best[0], text[i : best[1]]))
            i = best[1]
        return out


def _earley(grammar: Grammar, toks: list[tuple[str, str]], start: str):
    """Earley parse; returns the semantic value of one full derivation of
    ``start`` over all tokens, or None. Ambiguity resolved deterministically
    (first-completed derivation wins — the reference's Tomita keeps all;
    MATCHED best-parse selection picks one, as here).

    Worklist formulation: each chart item is processed exactly ONCE per
    position, and completions find their customers through a wait-index
    (origin position → awaited nonterminal → items) instead of rescanning
    the origin chart — the textbook O(n·|items|) Earley, replacing the
    earlier quadratic fix-point sweep. Correct without epsilon handling
    because ``rule()`` rejects empty productions: every completion spans
    ≥1 token, so its origin position's worklist is already drained and
    its wait-index final. Semantic values accumulate as shared cons
    chains ((parent, value) pairs) so advancing the dot is O(1), not a
    list copy — materialized into an argument list only at completion."""
    prods_by_lhs = grammar._prod_indices_by_lhs()
    P = grammar.prods
    n = len(toks)

    # item: (prod_index, dot, origin); value = cons chain (None terminated)
    seen: list[dict[tuple[int, int, int], tuple | None]] = [
        dict() for _ in range(n + 1)
    ]
    work: list[list[tuple[int, int, int]]] = [[] for _ in range(n + 1)]
    wait: list[dict[str, list]] = [dict() for _ in range(n + 1)]

    def add(k, item, chain):
        if item not in seen[k]:
            seen[k][item] = chain
            work[k].append(item)

    def materialize(chain, length):
        vals = [None] * length
        for i in range(length - 1, -1, -1):
            vals[i] = chain[1]
            chain = chain[0]
        return vals

    for i in prods_by_lhs.get(start, []):
        add(0, (i, 0, 0), None)

    for k in range(n + 1):
        wl = work[k]
        sk = seen[k]
        wk = wait[k]
        tok = toks[k] if k < n else None
        idx = 0
        while idx < len(wl):
            item = wl[idx]
            idx += 1
            pi, dot, org = item
            p = P[pi]
            if dot < len(p.rhs):
                sym = p.rhs[dot]
                if sym in prods_by_lhs:  # predict (+ register as waiter)
                    wk.setdefault(sym, []).append(item)
                    for j in prods_by_lhs[sym]:
                        add(k, (j, 0, k), None)
                elif tok is not None and tok[0] == sym:  # scan
                    add(k + 1, (pi, dot + 1, org), (sk[item], tok[1]))
            else:  # complete: notify items waiting at org for p.lhs
                vals = materialize(sk[item], len(p.rhs))
                val = (
                    p.action(*vals)
                    if p.action
                    else (vals[0] if len(vals) == 1 else vals)
                )
                so = seen[org]
                for item2 in wait[org].get(p.lhs, ()):
                    pi2, dot2, org2 = item2
                    add(k, (pi2, dot2 + 1, org2), (so[item2], val))

    for item, chain in seen[n].items():
        pi, dot, org = item
        p = P[pi]
        if p.lhs == start and dot == len(p.rhs) and org == 0:
            vals = materialize(chain, len(p.rhs))
            return p.action(*vals) if p.action else (vals[0] if len(vals) == 1 else vals)
    return None


def parse_grammar(
    df: DataFrame,
    text_col: str,
    grammar: Grammar,
    start: str,
    keep_cols: Sequence[str],
    value_type: str = "double",
) -> DataFrame:
    """PARSE(ds, text, RULE grammar): parse each row's full text with the
    CFG; emit (keep_cols..., parse_ok, value) — ``value`` is the semantic
    action result (NULL when the text doesn't derive from ``start``)."""
    keep = list(keep_cols)
    schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["parse_ok boolean", f"value {value_type}"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples(index=False):
                text = getattr(rec, text_col) or ""
                toks = grammar.lex(text)
                val = _earley(grammar, toks, start) if toks is not None else None
                rows.append(
                    tuple(getattr(rec, c) for c in keep) + (val is not None, val)
                )
            yield pd.DataFrame(rows, columns=keep + ["parse_ok", "value"])

    return df.mapInPandas(run, schema=schema)


def arithmetic_grammar() -> Grammar:
    """Demo RULE grammar: arithmetic with precedence and parentheses —
    left-recursive (expr := expr '+' term), which PEG/packrat can't
    express naturally but Earley (like the reference's Tomita) handles
    directly."""
    g = Grammar()
    g.token("NUM", r"\d+(?:\.\d+)?")
    g.token("PLUS", r"\+")
    g.token("MINUS", r"-")
    g.token("MUL", r"\*")
    g.token("DIV", r"/")
    g.token("LP", r"\(")
    g.token("RP", r"\)")
    g.rule("expr", ["expr", "PLUS", "term"], action=lambda a, _o, b: a + b)
    g.rule("expr", ["expr", "MINUS", "term"], action=lambda a, _o, b: a - b)
    g.rule("expr", ["term"])
    g.rule("term", ["term", "MUL", "factor"], action=lambda a, _o, b: a * b)
    g.rule("term", ["term", "DIV", "factor"], action=lambda a, _o, b: a / b)
    g.rule("term", ["factor"])
    g.rule("factor", ["NUM"], action=lambda t: float(t))
    g.rule("factor", ["LP", "expr", "RP"], action=lambda _l, v, _r: v)
    return g
