"""ECL front door: parse a practical subset of ECL query text and run it
as DataFrame operations.

The reference's pipeline is ECL text → expression DAG → activities
(lexer ecl/hql/hqllex.l, grammar ecl/hql/hqlgram.y ~13.5k lines,
devdoc/CodeGenerator.md:72-90). The capabilities are what this repo
re-expresses as combinators; this module adds the front of the funnel
for the everyday query shapes, so reference users can hand over ECL
text they run today:

    fast := lineitem(l_quantity < 10, l_discount > 0.05);
    byflag := TABLE(fast,
        { l_returnflag,
          total := SUM(GROUP, l_extendedprice),
          n := COUNT(GROUP) },
        l_returnflag);
    OUTPUT(SORT(byflag, -total));

Supported surface (deliberately the high-frequency core, not the whole
language): definitions (:=) — dataset, scalar (typed prefixes), RECORD
(END or brace form, field defaults, fixed-width strings), DICTIONARY,
and aggregate-of-dataset scalars; postfix record filters and positional
slices ds[n] / ds[a..b]; TABLE grouped aggregation (SUM/COUNT/MIN/MAX/
AVE over GROUP, conditional COUNT(GROUP, cond), unnamed aggregate
fields, grouped-input per-group form), JOIN with LEFT./RIGHT. equality
+ residual conditions and LEFT/RIGHT/FULL OUTER / LEFT ONLY / LOOKUP /
ALL options, SORT (with -field descending and RECORD whole-row keys),
DEDUP (adjacent LEFT/RIGHT/KEEP(n) over tracked order; ALL/HASH
keep-first), CHOOSEN (n|ALL, start, GROUPED), TOPN,
MERGE(a, b, SORTED(...)), dataset append ``a + b``, SAMPLE/ENTH (the
reference's exact accumulator selection) over a sorted input,
LIMIT [SKIP], DISTRIBUTE(ds, HASH(...)),
SEQUENTIAL/ORDERED/PARALLEL action lists,
GROUP + HAVING with group aggregates, DENORMALIZE(..., GROUP,
TRANSFORM(SELF.f := ROWS(RIGHT), SELF := LEFT)), scalar expressions with
arithmetic / comparisons / AND-OR-NOT / IN / BETWEEN / string+number
literals, ROUND/ABS/TRIM/LENGTH, two-argument MIN/MAX, and STD.Str.*
calls (ToUpperCase/ToLowerCase/Reverse/CleanSpaces/StartsWith/EndsWith/
Find), dataset-level COUNT/SUM/MIN/MAX/AVE, scalar dataset aggregates
inside value expressions (ds(x > AVE(ds2, y)) — evaluated once, inlined
as a broadcast literal) and EXISTS(ds). Programs are statement
sequences: typed scalar definitions (string s1 := 'one'), dataset and
DICTIONARY definitions, OUTPUTs, and bare expression actions (each
action is a numbered result, the reference's workunit shape). Inline
DATASET literals carry a hidden ordinal so positional ops (adjacent
DEDUP [LEFT|RIGHT], SAMPLE) see the literal order; DICTIONARY literals
serve IN / NOT IN membership; workflow annotations PERSIST (wired),
STORED/GLOBAL/INDEPENDENT/ONCE (placement no-ops) parse on any
definition; CATCH(expr, fallback) probes and falls back. This subset is
verified VERBATIM against reference regression files and their key
files (tests/test_reference_regress.py). Everything lowers to
the same Spark plans the combinator API produces — the parser is
front-end only; Catalyst still owns optimization. ECL is
case-insensitive: keywords and identifiers are matched
case-insensitively (identifiers resolve lowercased).

Positional operators (SAMPLE/ENTH/MERGE) need a defined order to be
deterministic on a distributed engine, so the front door tracks the sort
keys a dataset was produced with (SORT/TOPN/MERGE record them; filters
preserve them) and rejects SAMPLE/ENTH over an unordered input instead
of silently depending on partition order.

Unsupported constructs raise EclSyntaxError with the offending token
position — no silent misparses.
"""

from __future__ import annotations

import re
from collections.abc import Mapping
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class EclSyntaxError(ValueError):
    pass


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'"}


def _unquote(tok_text: str) -> str:
    """Strip quotes and interpret ECL string escapes (\n \t \r \\ \')."""
    raw = tok_text[1:-1]
    out, i = [], 0
    while i < len(raw):
        ch = raw[i]
        if ch == "\\" and i + 1 < len(raw):
            nxt = raw[i + 1]
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


_TOKEN_RX = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*(?s:.*?)\*/)
  | (?P<num>0[xX][0-9A-Fa-f]+            # hex
            |0[bB][01]+                   # binary
            |[0-9A-Fa-f]+[xX](?![0-9A-Za-z_])   # hex, x-suffix form (41x)
            |[01]+[bB](?![0-9A-Za-z_])    # binary, b-suffix form
            |\d+\.\d+[eE][-+]?\d+         # scientific
            |\d+[eE][-+]?\d+
            |\d+\.\d+[dD]?                # real / decimal (D suffix)
            |\d+[dD]?(?![0-9A-Za-z_])     # integer / decimal
            |\d+)
  | (?P<str>(?:[uU]8?|[vV]|[qQ])?'(?:[^'\\]|\\.)*')
  | (?P<op>:=|<=|>=|<>|!=|=>|<<|>>|[-+*/%(){},;=<>\[\].:])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "table", "join", "sort", "dedup", "choosen", "topn", "output",
    "group", "sum", "count", "min", "max", "ave", "round", "left",
    "right", "full", "outer", "only", "inner", "lookup", "all", "and",
    "or", "not", "in", "between", "true", "false", "distribute",
}


@dataclass
class _Tok:
    kind: str  # 'num' | 'str' | 'op' | 'ident' | 'kw'
    text: str
    pos: int


def _lex(src: str) -> list[_Tok]:
    out, i = [], 0
    while i < len(src):
        m = _TOKEN_RX.match(src, i)
        if not m:
            raise EclSyntaxError(f"cannot lex at position {i}: {src[i:i+20]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        kind = m.lastgroup
        if kind == "ident":
            low = text.lower()
            if low in _KEYWORDS:
                kind, text = "kw", low
            else:
                text = low
        out.append(_Tok(kind, text, m.start()))
    out.append(_Tok("eof", "", len(src)))
    return out


class _Parser:
    """Recursive descent over the token list; produces DataFrames (dataset
    expressions) and Columns (value expressions) directly — the AST is
    implicit in the call tree, like the reference's one-pass attribute
    binding (hqlgram.y actions build IHqlExpression nodes inline)."""

    def __init__(
        self,
        toks: list[_Tok],
        catalog: Mapping[str, DataFrame],
        persist_cache=None,
        spark=None,
    ):
        self.toks = toks
        self.i = 0
        self.env: dict[str, DataFrame] = {k.lower(): v for k, v in catalog.items()}
        self.persist_cache = persist_cache
        self._spark = spark
        # scalar definitions (string s1 := 'one';) — row-independent Columns
        self.scalars: dict[str, Column] = {}
        # DICTIONARY definitions — {keys: set[tuple], mapped: bool}
        self.dicts: dict[str, dict] = {}
        # named RECORD..END definitions — name -> [(field, type, width)]
        self.records: dict[str, list] = {}
        # SET definitions (a := [2,3,5];) — driver-side Python lists
        self.sets: dict[str, list] = {}
        # every action (OUTPUT or bare expression statement), in order —
        # the reference emits one result per action
        self.actions: list[DataFrame] = []
        # id(df) -> sort keys the frame is known to be ordered by
        # (SORT/TOPN/MERGE set it; postfix filters propagate it). Used by
        # SAMPLE/ENTH, which are only well-defined over an ordered input.
        self._order: dict[int, list[Column]] = {}
        # id(df) -> GROUP keys (GROUP sets it; HAVING consumes it).
        self._grouped: dict[int, list[str]] = {}
        # Every frame registered in _order/_grouped is pinned here so its
        # id() stays unique for the parser's lifetime — otherwise an
        # intermediate frame could be garbage-collected mid-parse and a
        # later allocation could reuse its id, spuriously inheriting a
        # stale order or group registration.
        self._pins: list[DataFrame] = []
        # Window for HAVING-condition aggregates (COUNT(GROUP) etc.).
        self._having_win = None

    # --- token helpers ---
    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> _Tok:
        t = self.next()
        if t.text != text:
            raise EclSyntaxError(f"expected {text!r} at {t.pos}, got {t.text!r}")
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.i += 1
            return True
        return False

    # --- order / group side tables ---
    def _set_order(self, df: DataFrame, keys: list[Column]) -> None:
        self._pins.append(df)
        self._order[id(df)] = keys

    def _set_grouped(self, df: DataFrame, keys: list[str]) -> None:
        self._pins.append(df)
        self._grouped[id(df)] = keys

    # --- program ---
    # ECL scalar type names (optionally digit-suffixed: string20,
    # unsigned8) allowed as definition prefixes; the engine works in
    # Spark types, so the prefix is validated-and-dropped.
    _TYPE_RX = re.compile(
        r"^(string|varstring|qstring|utf8|unicode|integer|unsigned|real|"
        r"boolean|decimal|udecimal)\d*(_\d+)?$"
    )

    def spark(self):
        if self._spark is not None:
            return self._spark
        if self.env:
            return next(iter(self.env.values())).sparkSession
        raise EclSyntaxError(
            "this program needs a SparkSession: pass spark= to run_ecl "
            "(no catalog datasets to borrow one from)"
        )

    def _dummy(self) -> DataFrame:
        return self.spark().range(1)

    def program(self) -> DataFrame:
        while self.peek().kind != "eof":
            if self.accept(";"):  # stray empty statement
                continue
            if self.peek().text == "output":
                self.next()
                self.expect("(")
                df = self._output_arg()
                while self.accept(","):
                    if self.peek().text == "{":
                        # OUTPUT(ds, {fields}) — vertical-slice projection
                        self.next()
                        names = [self.next().text]
                        while self.accept(","):
                            names.append(self.next().text)
                        self.expect("}")
                        keep = [c for c in df.columns if c == "__ord__"]
                        df = df.select(*names, *keep)
                    elif self.peek().text == "named":
                        # OUTPUT(..., NAMED('x')) — result naming; the
                        # compare is positional, parse and drop
                        self.next()
                        self.expect("(")
                        self.next()
                        self.expect(")")
                    else:
                        raise EclSyntaxError(
                            f"unsupported OUTPUT option at {self.peek().pos}"
                        )
                self.expect(")")
                self.accept(";")
                self.actions.append(self._clean(df))
            elif (
                self.peek().text in ("sequential", "ordered", "parallel")
                and self.toks[self.i + 1].text == "("
            ):
                # action-list statement: SEQUENTIAL(o1, o2, ...) — each
                # inner OUTPUT emits its result in listed order (the
                # declarative engine evaluates lazily, so the three
                # orderings coincide)
                self.next()
                self.expect("(")
                while True:
                    self.expect("output")
                    self.expect("(")
                    df = self._output_arg()
                    self.expect(")")
                    self.actions.append(self._clean(df))
                    if not self.accept(","):
                        break
                self.expect(")")
                self.accept(";")
            elif self._is_definition():
                self._definition()
            else:
                self._bare_action()
        if not self.actions:
            raise EclSyntaxError("no OUTPUT(...) or action statement in query")
        return self.actions[-1]

    def _output_arg(self) -> DataFrame:
        """The first OUTPUT argument: a dataset, a dictionary row lookup
        (OUTPUT(dict[key]) — key + value fields as one row), or a scalar
        value (one-row result)."""
        t = self.peek()
        if (
            t.kind == "ident"
            and t.text in self.dicts
            and self.toks[self.i + 1].text == "["
        ):
            mark = self.i
            d = self.dicts[self.next().text]
            self.next()
            k = self._literal()
            self.expect("]")
            if self.peek().text == ".":  # field form — scalar path below
                self.i = mark  # rewind: let value() handle dict[k].field
            else:
                entry = d["values"].get(k, {})
                row = {d["key_field"]: k}
                for name, ty in d["value_fields"]:
                    v = entry.get(name)
                    if v is None:
                        v = d["defaults"].get(name, self._type_zero(ty))
                    row[name] = v
                cols = [d["key_field"]] + [n for n, _ in d["value_fields"]]
                return self.spark().createDataFrame([tuple(row[c] for c in cols)], cols)
        # dataset grammar first (covers IF/COUNT/... dataset forms);
        # clean parse failure falls back to a scalar one-row result. If
        # the scalar read fails too, the DATASET error was the real one —
        # re-raise it so 'unknown dataset x' isn't masked by a dummy-frame
        # resolution error.
        mark = self.i
        try:
            return self.dataset()
        except EclSyntaxError as dataset_err:
            self.i = mark
            try:
                col = self.value(self._dummy())
                return self._dummy().select(
                    col.alias(f"result_{len(self.actions) + 1}")
                )
            except Exception:
                raise dataset_err from None

    def _is_definition(self) -> bool:
        t = self.toks[self.i]
        if t.kind != "ident" and t.kind != "kw":
            return False
        nxt = self.toks[self.i + 1]
        if nxt.text == ":=":
            return True
        # typed form: string s1 := ...
        return (
            self._TYPE_RX.match(t.text) is not None
            and nxt.kind == "ident"
            and self.toks[self.i + 2].text == ":="
        )

    def _definition(self) -> None:
        first = self.next()
        if self.toks[self.i].text == ":=":
            name = first
        else:
            name = self.next()  # first was a type prefix
        if name.kind != "ident":
            raise EclSyntaxError(f"expected definition name at {name.pos}")
        self.expect(":=")
        kind = "dataset"
        df = None
        if self.peek().text == "dictionary":
            self.dicts[name.text] = self._dictionary()
            kind = "dict"
        elif self.peek().text == "record":
            self.records[name.text] = self._record_end()
            kind = "record"
        elif self.peek().text == "{":
            # brace-form record definition: r := { string text; };
            self.records[name.text] = self._record_fields()
            kind = "record"
        elif self.peek().text == "[":
            # SET definition: a := [2,3,5,7]; — a driver-side list
            # (no_createset hqlexpr.hpp:562)
            self.next()
            vals: list = []
            if not self.accept("]"):
                while True:
                    vals.append(self._literal())
                    if not self.accept(","):
                        break
                self.expect("]")
            self.sets[name.text] = vals
            kind = "set"
        elif (
            self.peek().text in ("count", "sum", "min", "max", "ave", "exists")
            and self.toks[self.i + 1].text == "("
            and self._at_dataset_start(self.i + 2)
        ):
            # aggregate-of-dataset definition is a SCALAR in ECL
            # (b := COUNT(d);) — the value grammar's eager branch
            # evaluates it once and inlines a literal
            self.scalars[name.text] = self.value(self._dummy())
            kind = "scalar"
        else:
            # type-driven dataset-vs-scalar dispatch (hqlgram binds by
            # expression type): try the dataset grammar, fall back to a
            # scalar value on a clean parse failure
            mark = self.i
            try:
                df = self.dataset()
            except EclSyntaxError as dataset_err:
                self.i = mark
                try:
                    self.scalars[name.text] = self.value(self._dummy())
                except Exception:
                    raise dataset_err from None
                kind = "scalar"
        # workflow-service annotation(s): expr : PERSIST('name') |
        # STORED('x') | GLOBAL | INDEPENDENT[(few|many)] | ONCE
        # (common/workunit/workflow.cpp). PERSIST is wired to the cache;
        # the rest affect evaluation placement in the reference and are
        # correct no-ops on an engine that evaluates definitions lazily
        # exactly once per plan.
        if self.accept(":"):
            while True:
                kw = self.next()
                if kw.text == "persist":
                    self.expect("(")
                    pname = self.next()
                    if pname.kind != "str":
                        raise EclSyntaxError("PERSIST needs a quoted name")
                    self.expect(")")
                    if kind != "dataset":
                        raise EclSyntaxError("PERSIST applies to datasets")
                    if self.persist_cache is not None:
                        df = self.persist_cache.persist(df, pname.text[1:-1])
                elif kw.text in ("stored", "global", "independent", "once"):
                    if self.accept("("):  # optional args: stored name, few/many
                        depth = 1
                        while depth:
                            t = self.next()
                            if t.kind == "eof":
                                raise EclSyntaxError("unclosed annotation args")
                            depth += t.text == "(";  depth -= t.text == ")"
                else:
                    raise EclSyntaxError(
                        f"unsupported workflow service {kw.text!r} at {kw.pos}"
                    )
                if not self.accept(","):
                    break
        if kind == "dataset":
            self.env[name.text] = df
        self.expect(";")

    def _bare_action(self) -> None:
        """A bare expression statement — the reference emits it as the
        next numbered result (``Result N``)."""
        mark = self.i
        try:
            df = self.dataset()
        except EclSyntaxError as dataset_err:
            self.i = mark
            try:
                col = self.value(self._dummy())
            except Exception:
                raise dataset_err from None
            df = self._dummy().select(
                col.alias(f"result_{len(self.actions) + 1}")
            )
        self.expect(";")
        self.actions.append(self._clean(df))

    @staticmethod
    def _clean(df: DataFrame) -> DataFrame:
        """Drop internal bookkeeping columns (inline-dataset ordinals)
        from user-visible results — after using them to restore the
        positional row order the reference's key files expect."""
        if "__ord__" in df.columns:
            return df.orderBy("__ord__").drop("__ord__")
        return df

    # --- dataset expressions ---
    def dataset(self) -> DataFrame:
        t = self.peek()
        if t.text == "table":
            df = self._table()
        elif t.text == "project":
            df = self._project()
        elif t.text == "normalize":
            df = self._normalize()
        elif t.text == "join":
            df = self._join()
        elif t.text == "sort":
            df = self._sort()
        elif t.text == "dedup":
            df = self._dedup()
        elif t.text == "choosen":
            df = self._choosen()
        elif t.text == "topn":
            df = self._topn()
        elif t.text == "merge":
            df = self._merge()
        elif t.text in ("sample", "enth"):
            df = self._sample_enth()
        elif t.text == "limit":
            df = self._limit()
        elif t.text == "distribute":
            df = self._distribute()
        elif t.text == "group" and self.toks[self.i + 1].text == "(":
            df = self._group()
        elif t.text == "having":
            df = self._having()
        elif t.text == "denormalize":
            df = self._denormalize()
        elif t.text == "if":
            df = self._if_dataset()
        elif t.text == "dataset":
            df = self._inline_dataset()
        elif t.text == "nofold":
            # NOFOLD(x) — constant-folding barrier in the reference
            # (hqlfold.cpp); Catalyst owns folding here, so it is the
            # identity
            self.next()
            self.expect("(")
            df = self.dataset()
            self.expect(")")
        elif t.text in ("count", "sum", "min", "max", "ave"):
            df = self._scalar_dataset()
        elif t.text == "(":
            self.next()
            df = self.dataset()
            self.expect(")")
        elif t.kind == "ident":
            self.next()
            if t.text not in self.env:
                raise EclSyntaxError(f"unknown dataset {t.text!r} at {t.pos}")
            df = self.env[t.text]
        else:
            raise EclSyntaxError(f"expected dataset expression at {t.pos}: {t.text!r}")
        # postfix record filter(s): ds(cond, cond...) — conditions ANDed
        while self.peek().text == "(":
            self.next()
            cond = self.value(df)
            while self.accept(","):
                cond = cond & self.value(df)
            self.expect(")")
            filtered = df.where(cond)
            if id(df) in self._order:  # filters preserve order
                self._set_order(filtered, self._order[id(df)])
            df = filtered
        # positional slice: ds[a..b] / ds[a..] / ds[n] — needs an order
        while self.peek().text == "[" and self._order.get(id(df)) is not None:
            self.next()
            a = int(self.next().text)
            b = a
            if self.accept("."):
                self.expect(".")
                b = None
                if self.peek().kind == "num":
                    b = int(self.next().text)
            self.expect("]")
            order = self._order[id(df)]
            sliced = self._rn_filter(
                df, order, None, a, None if b is None else b - a + 1
            )
            self._set_order(sliced, order)
            df = sliced
        # dataset append: a + b (+ c ...) — ECL's inline FUNNEL
        # (TAKfunnel eclhelper.hpp:903); unordered concat, so any
        # tracked order is dropped.
        while self.peek().text == "+" and self._at_dataset_start(self.i + 1):
            self.next()
            rhs = self.dataset()
            df = df.unionByName(rhs)
        return df

    def _at_dataset_start(self, i: int) -> bool:
        """Does the token at ``i`` begin a dataset expression? Used to
        disambiguate dataset append ``a + b`` from arithmetic inside a
        value context (dataset() is only entered at dataset positions,
        but a defined name could shadow either way — only idents bound
        in env or dataset keywords qualify)."""
        t = self.toks[i]
        if t.text in (
            "table", "project", "normalize", "join", "sort", "dedup",
            "choosen", "topn", "merge", "sample", "enth", "limit",
            "distribute", "having", "denormalize", "dataset", "nofold",
        ):
            return True
        return t.kind == "ident" and t.text in self.env

    def _table(self) -> DataFrame:
        self.expect("table")
        self.expect("(")
        src = self.dataset()
        self.expect(",")
        self.expect("{")
        bare: list[str] = []
        aggs: list[Column] = []
        saved_flag = getattr(self, "_table_has_group_agg", False)
        self._table_has_group_agg = False
        while True:
            t = self.peek()
            if (
                t.text in ("sum", "count", "min", "max", "ave", "round")
                and self.toks[self.i + 1].text == "("
            ):
                # unnamed aggregate field: { COUNT(GROUP) } — the
                # reference generates _unnamed_... names; ours follow
                # suit (the value compare is name-independent)
                aggs.append(
                    self._field_value(src).alias(f"_unnamed_{len(aggs) + 1}")
                )
            else:
                t = self.next()
                if t.kind != "ident":
                    raise EclSyntaxError(
                        f"expected field at {t.pos}, got {t.text!r}"
                    )
                if self.accept(":="):
                    aggs.append(self._field_value(src).alias(t.text))
                else:
                    bare.append(t.text)
            if not self.accept(","):
                break
        self.expect("}")
        keys: list[str] = []
        while self.accept(","):
            k = self.next()
            if k.kind != "ident":
                raise EclSyntaxError(f"expected group key at {k.pos}")
            keys.append(k.text)
        self.expect(")")
        grouped = self._table_has_group_agg
        self._table_has_group_agg = saved_flag
        if not keys:
            if grouped:
                if bare:
                    raise EclSyntaxError("bare fields need group keys in TABLE")
                gkeys = self._grouped.get(id(src))
                if gkeys is not None:
                    # TABLE over a GROUPed input with no explicit keys:
                    # one output row PER GROUP, only the declared fields
                    # — group appearance order kept via the hidden
                    # ordinal when the input is positional
                    extra = (
                        [F.min("__ord__").alias("__ord__")]
                        if "__ord__" in src.columns
                        else []
                    )
                    return src.groupBy(*gkeys).agg(*aggs, *extra).drop(*gkeys)
                # global aggregate (no group keys)
                return src.agg(*aggs)
            # vertical-slice / project form: TABLE(ds, {a, b2 := expr})
            return src.select(*[src[b] for b in bare], *aggs)
        extra = [b for b in bare if b not in keys]
        if extra:
            raise EclSyntaxError(
                f"non-aggregate TABLE fields must be group keys: {extra}"
            )
        return src.groupBy(*keys).agg(*aggs)

    def _field_value(self, src: DataFrame) -> Column:
        """A TABLE record field: either a GROUP aggregate (sets the
        grouped-table flag) or a plain computed expression (project
        form). Backtracks on the aggregate parse — ROUND() can wrap
        either form."""
        mark = self.i
        try:
            col = self._agg_value(src)
            self._table_has_group_agg = True
            return col
        except EclSyntaxError:
            self.i = mark
            return self.value(src)

    def _agg_value(self, src: DataFrame) -> Column:
        t = self.peek()
        if t.text in ("sum", "count", "min", "max", "ave"):
            fn = self.next().text
            self.expect("(")
            self.expect("group")
            if fn == "count":
                if self.accept(","):
                    # COUNT(GROUP, cond) — conditional count (the Q12
                    # pivot-count shape); lowered to SUM(IF(cond,1,0))
                    cond = self.value(src)
                    self.expect(")")
                    return F.sum(
                        F.when(cond, F.lit(1)).otherwise(F.lit(0))
                    ).cast("long")
                self.expect(")")
                return F.count(F.lit(1))
            self.expect(",")
            e = self.value(src)
            self.expect(")")
            return {"sum": F.sum, "min": F.min, "max": F.max, "ave": F.avg}[fn](e)
        if t.text == "round":
            self.next()
            self.expect("(")
            inner = self._agg_value(src)
            self.expect(",")
            nd = self.next()
            self.expect(")")
            return F.round(inner, int(nd.text))
        raise EclSyntaxError(
            f"expected aggregate (SUM/COUNT/MIN/MAX/AVE over GROUP) at {t.pos}"
        )

    def _project(self) -> DataFrame:
        """PROJECT(ds, TRANSFORM({...} | RECORDOF(ds), SELF.f := expr,
        ..., [SELF := LEFT])) (TAKproject eclhelper.hpp:893). SELF.f
        assignments become aliased select expressions (LEFT.x and bare x
        both read the input); ``SELF := LEFT`` copies every input field
        not explicitly assigned, in input order — the everyday
        copy-then-override transform."""
        self.expect("project")
        self.expect("(")
        src = self.dataset()
        self.expect(",")
        t = self.next()
        if t.text != "transform":
            raise EclSyntaxError(f"expected TRANSFORM at {t.pos}")
        self.expect("(")
        declared: list[str] | None = None
        if self.accept("{"):
            declared = []
            while True:
                f = self.next()
                if f.kind != "ident":
                    raise EclSyntaxError(f"expected field at {f.pos}")
                declared.append(f.text)
                if not self.accept(","):
                    break
            self.expect("}")
        elif self.peek().text == "recordof":
            self.next()
            self.expect("(")
            self.dataset()  # shape comes from the input; parse and discard
            self.expect(")")
        else:
            raise EclSyntaxError(
                f"expected {{...}} or RECORDOF(ds) at {self.peek().pos}"
            )
        assigned: dict[str, Column] = {}
        copy_rest = False
        while self.accept(",") or self.accept(";"):
            if self.peek().text == ")":
                break  # trailing separator
            s = self.next()
            if s.text != "self":
                raise EclSyntaxError(f"expected SELF at {s.pos}")
            if self.accept("."):
                field = self.next().text
                self.expect(":=")
                assigned[field] = self.value(src)
            else:
                self.expect(":=")
                lk = self.next()
                if lk.text != "left":
                    raise EclSyntaxError("only SELF := LEFT is supported")
                copy_rest = True
        self.expect(")")
        self.expect(")")
        order = declared if declared is not None else list(src.columns)
        cols: list[Column] = []
        for f in order:
            if f in assigned:
                cols.append(assigned[f].alias(f))
            elif copy_rest:
                if f not in src.columns:
                    raise EclSyntaxError(
                        f"SELF := LEFT cannot supply unknown field {f!r}"
                    )
                cols.append(src[f])
            else:
                raise EclSyntaxError(
                    f"field {f!r} not assigned and no SELF := LEFT"
                )
        # fields assigned but not in the declared record are an error
        extra = [f for f in assigned if f not in order]
        if extra:
            raise EclSyntaxError(f"assigned fields not in record: {extra}")
        return src.select(*cols)

    def _normalize(self) -> DataFrame:
        """NORMALIZE(ds, LEFT.child, TRANSFORM({...}, SELF.f := ...))
        (TAKnormalizechild eclhelper.hpp:910): one output row per element
        of the child DATASET field. Lowered to explode; in the TRANSFORM,
        LEFT.x reads the parent row and RIGHT.y the child element."""
        self.expect("normalize")
        self.expect("(")
        src = self.dataset()
        self.expect(",")
        lk = self.next()
        if lk.text != "left" or not self.accept("."):
            raise EclSyntaxError(f"expected LEFT.<child field> at {lk.pos}")
        child = self.next().text
        if child not in src.columns:
            raise EclSyntaxError(f"unknown child dataset field {child!r}")
        self.expect(",")
        t = self.next()
        if t.text != "transform":
            raise EclSyntaxError(f"expected TRANSFORM at {t.pos}")
        self.expect("(")
        self.expect("{")
        declared: list[str] = []
        while True:
            f = self.next()
            if f.kind != "ident":
                raise EclSyntaxError(f"expected field at {f.pos}")
            declared.append(f.text)
            if not self.accept(","):
                break
        self.expect("}")
        exploded = src.withColumn("__child__", F.explode(F.col(child)))
        saved_right = getattr(self, "_right_struct", None)
        self._right_struct = F.col("__child__")
        try:
            assigned: dict[str, Column] = {}
            while self.accept(",") or self.accept(";"):
                if self.peek().text == ")":
                    break
                s = self.next()
                if s.text != "self":
                    raise EclSyntaxError(f"expected SELF at {s.pos}")
                self.expect(".")
                field = self.next().text
                self.expect(":=")
                assigned[field] = self.value(exploded)
        finally:
            self._right_struct = saved_right
        self.expect(")")
        self.expect(")")
        missing = [f for f in declared if f not in assigned]
        if missing:
            raise EclSyntaxError(f"NORMALIZE TRANSFORM must assign: {missing}")
        return exploded.select(*[assigned[f].alias(f) for f in declared])

    def _join(self) -> DataFrame:
        self.expect("join")
        self.expect("(")
        left = self.dataset()
        self.expect(",")
        right = self.dataset()
        self.expect(",")
        cond = self._join_cond(left, right)
        how = "inner"
        lookup = False
        use_all = False
        while self.accept(","):
            t = self.next().text
            if t in ("left", "right", "full"):
                nxt = self.next().text
                if nxt == "outer":
                    how = {"left": "left", "right": "right", "full": "full"}[t]
                elif nxt == "only":
                    how = {"left": "left_anti", "right": "right_anti"}[t]
                else:
                    raise EclSyntaxError(f"expected OUTER/ONLY after {t.upper()}")
            elif t == "inner":
                how = "inner"
            elif t == "lookup":
                lookup = True
            elif t == "all":
                use_all = True
            else:
                raise EclSyntaxError(f"unknown JOIN option {t!r}")
        self.expect(")")
        rhs = F.broadcast(right) if (lookup or use_all) else right
        if how == "right_anti":
            return right.join(
                F.broadcast(left) if lookup else left, cond, "left_anti"
            )
        return left.join(rhs, cond, how)

    def _join_cond(self, left: DataFrame, right: DataFrame) -> Column:
        cond = self._join_cmp(left, right)
        while self.peek().text == "and":
            self.next()
            cond = cond & self._join_cmp(left, right)
        return cond

    def _join_cmp(self, left: DataFrame, right: DataFrame) -> Column:
        a = self._join_side(left, right)
        op = self.next().text
        b = self._join_side(left, right)
        return _cmp(op, a, b)

    def _join_side(self, left: DataFrame, right: DataFrame) -> Column:
        t = self.next()
        if t.text == "left" and self.accept("."):
            return left[self.next().text]
        if t.text == "right" and self.accept("."):
            return right[self.next().text]
        if t.kind == "num":
            return F.lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "str":
            return F.lit(_unquote(t.text))
        raise EclSyntaxError(
            f"JOIN condition expects LEFT.f / RIGHT.f / literal at {t.pos}"
        )

    def _sort_keys(self, df: DataFrame) -> list[Column]:
        keys = []
        while True:
            if self.accept("-"):
                keys.append(df[self.next().text].desc())
            elif self.peek().text == "record":
                # SORT(ds, RECORD) — order by every field in record order
                self.next()
                keys.extend(df[c].asc() for c in df.columns if c != "__ord__")
            else:
                keys.append(df[self.next().text].asc())
            if not self.accept(","):
                break
        return keys

    def _sort(self) -> DataFrame:
        self.expect("sort")
        self.expect("(")
        df = self.dataset()
        self.expect(",")
        keys = self._sort_keys(df)
        self.expect(")")
        out = df.orderBy(*keys)
        self._set_order(out, keys)
        return out

    def _dedup(self) -> DataFrame:
        self.expect("dedup")
        self.expect("(")
        df = self.dataset()
        fields: list[str] = []
        keep_right = False
        keep_n = 1
        all_flag = False
        while self.accept(","):
            t = self.peek().text
            if t == "all":
                self.next()
                all_flag = True
                continue
            if t in ("hash", "local"):
                # HASH = strategy hint (TAKhashdedup :906), LOCAL = node
                # scope; same result set — no-ops here
                self.next()
                continue
            if t in ("left", "right") and self.toks[self.i + 1].text in (",", ")"):
                keep_right = self.next().text == "right"
                continue
            if t == "keep" and self.toks[self.i + 1].text == "(":
                # KEEP(n): first n of each adjacent run; n may be a
                # stored scalar — resolved once, driver-side
                self.next()
                self.expect("(")
                nv = self.value(self._dummy())
                self.expect(")")
                keep_n = int(self._dummy().select(nv.alias("n")).collect()[0].n)
                continue
            fields.append(self.next().text)
        self.expect(")")
        order = self._order.get(id(df))
        if order is not None and fields and all_flag:
            # DEDUP ... ALL over an ordered input: order-independent
            # match (whole dataset), first occurrence in stream order
            # survives (thhashdedup keep-first contract)
            from pyspark.sql.window import Window

            key = F.struct(*[F.col(f) for f in fields])
            w = Window.partitionBy(key).orderBy(*order)
            out = (
                df.withColumn("__pick__", F.row_number().over(w))
                .where(F.col("__pick__") == 1)
                .drop("__pick__")
            )
            self._set_order(out, order)
            return out
        if order is not None and fields:
            # Faithful adjacent semantics over a tracked order
            # (throllupslave.cpp keepLeft/keepRight): runs of equal keys
            # in stream order collapse to their first (LEFT, default) or
            # last (RIGHT) row — gaps-and-islands run ids, then one row
            # per (key, run).
            from pyspark.sql.window import Window

            key = F.struct(*[F.col(f) for f in fields])
            w_all = Window.orderBy(*order)
            w_key = Window.partitionBy(key).orderBy(*order)
            run = (
                F.row_number().over(w_all) - F.row_number().over(w_key)
            ).alias("__run__")
            within = Window.partitionBy(key, F.col("__run__")).orderBy(
                *[k.desc() for k in order] if keep_right else order
            )
            out = (
                df.withColumn("__run__", run)
                .withColumn("__pick__", F.row_number().over(within))
                .where(F.col("__pick__") <= keep_n)
                .drop("__run__", "__pick__")
            )
            self._set_order(out, order)
            return out
        if keep_right or keep_n != 1:
            raise EclSyntaxError(
                "DEDUP ... RIGHT needs an ordered input (SORT or an "
                "inline dataset): adjacency is undefined otherwise"
            )
        # Order-independent form (DEDUP...ALL semantics): which duplicate
        # survives is unspecified without a tracked order.
        return df.dropDuplicates(fields or None)

    def _choosen(self) -> DataFrame:
        """CHOOSEN(ds, n|ALL [, start] [, GROUPED]) (TAKfirstn :898):
        n records beginning at ``start`` (1-based). Plain CHOOSEN over a
        grouped input takes the first n of the whole stream and DROPS
        the grouping; the GROUPED option applies the window per group
        and keeps it (eclhelper.hpp choosen semantics; pinned by
        testing/regress/ecl/choosen.ecl). Positional forms need a
        tracked order; the bare CHOOSEN(ds, n) stays a plain limit for
        catalog datasets."""
        self.expect("choosen")
        self.expect("(")
        df = self.dataset()
        self.expect(",")
        if self.accept("all"):
            n = None
        else:
            n = int(self.next().text)
        start = 1
        grouped = False
        while self.accept(","):
            t = self.next()
            if t.text == "grouped":
                grouped = True
            elif t.kind == "num":
                start = int(t.text)
            else:
                raise EclSyntaxError(f"unknown CHOOSEN option {t.text!r}")
        self.expect(")")
        order = self._order.get(id(df))
        gkeys = self._grouped.get(id(df))
        if n is not None and start == 1 and not grouped:
            if order is None:
                return df.limit(n)
            out = self._rn_filter(df, order, None, 1, n)
            self._set_order(out, order)
            return out  # grouping deliberately dropped
        if order is None:
            raise EclSyntaxError(
                "positional CHOOSEN (start/ALL/GROUPED) needs an ordered input"
            )
        if grouped:
            if gkeys is None:
                raise EclSyntaxError("CHOOSEN ... GROUPED needs a GROUP(ds, keys) input")
            out = self._rn_filter(df, order, gkeys, start, n)
            self._set_order(out, order)
            self._set_grouped(out, gkeys)
            return out
        out = self._rn_filter(df, order, None, start, n)
        self._set_order(out, order)
        return out

    @staticmethod
    def _rn_filter(df, order, part_keys, start, n):
        """Keep rows whose (optionally per-group) 1-based position in
        ``order`` lies in [start, start+n-1] (n None = unbounded)."""
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy(*part_keys).orderBy(*order)
            if part_keys
            else Window.orderBy(*order)
        )
        out = df.withColumn("__rn__", F.row_number().over(w))
        cond = F.col("__rn__") >= start
        if n is not None:
            cond = cond & (F.col("__rn__") < start + n)
        return out.where(cond).drop("__rn__")

    def _topn(self) -> DataFrame:
        self.expect("topn")
        self.expect("(")
        df = self.dataset()
        self.expect(",")
        n = self.next()
        self.expect(",")
        keys = self._sort_keys(df)
        self.expect(")")
        out = df.orderBy(*keys).limit(int(n.text))
        self._set_order(out, keys)
        return out

    def _merge(self) -> DataFrame:
        """MERGE(a, b, ..., SORTED(keys)) (TAKmerge eclhelper.hpp:937):
        combine already-sorted inputs into one sorted stream. The merged
        row SET equals the union ordered by the keys; operators/sort.py
        merge_sorted is the streaming analogue — here the declarative
        union+orderBy lowers to the same range-exchange sort plan."""
        self.expect("merge")
        self.expect("(")
        parts = [self.dataset()]
        self.expect(",")
        while True:
            parts.append(self.dataset())
            if not self.accept(","):
                raise EclSyntaxError("MERGE needs a SORTED(keys) option")
            if self.peek().text == "sorted":
                break
        self.next()  # 'sorted'
        self.expect("(")
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        keys = self._sort_keys(df)
        self.expect(")")
        self.expect(")")
        out = df.orderBy(*keys)
        self._set_order(out, keys)
        return out

    def _sample_enth(self) -> DataFrame:
        """SAMPLE(ds, interval [, which]) / ENTH(ds, numerator
        [, denominator [, which]]) (TAKsample :899, TAKenth :913) —
        deterministic positional selection. ENTH follows the reference's
        accumulator algorithm exactly (thorlcr/activities/enth/
        thenthslave.cpp:29-58): counter starts at ((which-1) *
        gcd(num, den)) mod den, adds num per row, emits on wrap — in
        closed form row i (1-based) is emitted iff
        (init + i*num) mod den < num. Omitted denominator means the
        dataset count; denominator 0 means 1 (all rows); numerator 0
        yields nothing. Needs a tracked order (SORT result or inline
        dataset)."""
        import math

        op = self.next().text  # 'sample' | 'enth'
        self.expect("(")
        df = self.dataset()
        args: list[int] = []
        while self.accept(","):
            v = self.value(self._dummy())
            args.append(int(self._dummy().select(v.alias("a")).collect()[0].a))
        self.expect(")")
        if not args:
            raise EclSyntaxError(f"{op.upper()} needs at least one argument")
        keys = self._order.get(id(df))
        if keys is None:
            raise EclSyntaxError(
                f"{op.upper()} needs an ordered input (wrap it in "
                "SORT(...)): positional sampling over an unordered "
                "distributed dataset is nondeterministic"
            )
        from pyspark.sql.window import Window

        rn = F.row_number().over(Window.orderBy(*keys))
        if op == "sample":
            interval = args[0]
            which = args[1] if len(args) > 1 else 1
            keep = rn % interval == which % interval
        else:
            num = args[0]
            if num == 0:
                return df.limit(0)
            den = args[1] if len(args) > 1 else df.count()
            which = args[2] if len(args) > 2 else 1
            if den == 0:
                den = 1
            init = ((which - 1) * math.gcd(num, den)) % den
            keep = (F.lit(init) + rn * num) % den < num
        out = (
            df.withColumn("__keep__", keep)
            .where(F.col("__keep__"))
            .drop("__keep__")
        )
        self._set_order(out, keys)
        return out

    def _limit(self) -> DataFrame:
        """LIMIT(ds, n [, SKIP]) (TAKlimit :931 / TAKskiplimit :975):
        guard, not truncation — fail (or yield empty with SKIP) when the
        input exceeds n rows."""
        from hpcc_platform_spark.operators.limit import limit_fail, limit_skip

        self.expect("limit")
        self.expect("(")
        df = self.dataset()
        self.expect(",")
        n = int(self.next().text)
        skip = False
        if self.accept(","):
            kw = self.next()
            if kw.text != "skip":
                raise EclSyntaxError(f"unknown LIMIT option {kw.text!r}")
            skip = True
        self.expect(")")
        return limit_skip(df, n) if skip else limit_fail(df, n)

    def _distribute(self) -> DataFrame:
        """DISTRIBUTE(ds, HASH(f, ...) | f) (TAKhashdistribute :905):
        hash-partition on the keys — Spark repartition; same rows, plan
        effect only (co-locates downstream keyed work)."""
        self.expect("distribute")
        self.expect("(")
        df = self.dataset()
        self.expect(",")
        cols: list[Column] = []
        if self.peek().text in ("hash", "hash32", "hash64"):
            self.next()
            self.expect("(")
            cols.append(df[self.next().text])
            while self.accept(","):
                cols.append(df[self.next().text])
            self.expect(")")
        else:
            cols.append(df[self.next().text])
            while self.accept(","):
                cols.append(df[self.next().text])
        self.expect(")")
        return df.repartition(*cols)

    def _group(self) -> DataFrame:
        """GROUP(ds, keys) (TAKgroup :901): marks the frame as grouped for
        downstream HAVING; rows are unchanged (the combinator layer's
        carried-keys convention, operators/grouped.py)."""
        self.next()  # 'group'
        self.expect("(")
        df = self.dataset()
        keys: list[str] = []
        while self.accept(","):
            k = self.next()
            if k.kind != "ident":
                raise EclSyntaxError(f"expected group key at {k.pos}")
            keys.append(k.text)
        self.expect(")")
        if not keys:
            raise EclSyntaxError("GROUP needs at least one key")
        # Return a DISTINCT frame: registering the grouped state on the
        # input object would alias it onto every other use of that name
        # (e.g. a later TABLE over the ungrouped definition would silently
        # aggregate per group). select('*') is a zero-cost projection that
        # gives the registration its own identity.
        out = df.select("*")
        if id(df) in self._order:
            self._set_order(out, self._order[id(df)])
        self._set_grouped(out, keys)
        return out

    def _having(self) -> DataFrame:
        """HAVING(GROUP(ds, keys), cond) (TAKhavingselect :1014): keep
        whole groups whose rows satisfy cond; group aggregates in cond
        (COUNT(GROUP), SUM(GROUP, e), ...) become window aggregates over
        the group keys, so no row is lost to a pre-aggregation."""
        from pyspark.sql.window import Window

        self.expect("having")
        self.expect("(")
        df = self.dataset()
        keys = self._grouped.get(id(df))
        if keys is None:
            raise EclSyntaxError("HAVING needs a GROUP(ds, keys) input")
        self.expect(",")
        saved = self._having_win
        self._having_win = Window.partitionBy(*keys)
        try:
            cond = self.value(df)
        finally:
            self._having_win = saved
        self.expect(")")
        out = (
            df.withColumn("__having__", cond)
            .where(F.col("__having__"))
            .drop("__having__")
        )
        self._set_grouped(out, keys)  # result is still grouped
        return out

    def _denormalize(self) -> DataFrame:
        """DENORMALIZE(parent, child, LEFT.k = RIGHT.k [AND ...], GROUP,
        TRANSFORM(SELF.f := ROWS(RIGHT) [, SELF := LEFT]))
        (TAKdenormalizegroup eclhelper.hpp:1068): fold each parent's
        matching child rows into a nested child-dataset field. Lowered
        to a child-side collect_list(struct) pre-aggregation + LEFT
        join — childless parents keep a NULL child list (matches the
        SQL LEFT JOIN + list() lowering the oracle uses)."""
        self.expect("denormalize")
        self.expect("(")
        parent = self.dataset()
        self.expect(",")
        child = self.dataset()
        self.expect(",")
        # equality key chain LEFT.a = RIGHT.b [AND ...]
        pairs: list[tuple[str, str]] = []
        while True:
            lk = self.next()
            if lk.text != "left" or not self.accept("."):
                raise EclSyntaxError(f"expected LEFT.<key> at {lk.pos}")
            lfield = self.next().text
            self.expect("=")
            rk = self.next()
            if rk.text != "right" or not self.accept("."):
                raise EclSyntaxError(f"expected RIGHT.<key> at {rk.pos}")
            pairs.append((lfield, self.next().text))
            if self.peek().text != "and":
                break
            self.next()
        self.expect(",")
        g = self.next()
        if g.text != "group":
            raise EclSyntaxError("only the GROUP form of DENORMALIZE is supported")
        self.expect(",")
        t = self.next()
        if t.text != "transform":
            raise EclSyntaxError(f"expected TRANSFORM at {t.pos}")
        self.expect("(")
        s = self.next()
        if s.text != "self" or not self.accept("."):
            raise EclSyntaxError("DENORMALIZE TRANSFORM starts with SELF.<field> :=")
        nested_field = self.next().text
        self.expect(":=")
        r = self.next()
        if r.text != "rows":
            raise EclSyntaxError("expected ROWS(RIGHT)")
        self.expect("(")
        rr = self.next()
        if rr.text != "right":
            raise EclSyntaxError("expected ROWS(RIGHT)")
        self.expect(")")
        if self.accept(",") or self.accept(";"):
            s2 = self.next()
            if s2.text != "self":
                raise EclSyntaxError("expected SELF := LEFT")
            self.expect(":=")
            l2 = self.next()
            if l2.text != "left":
                raise EclSyntaxError("expected SELF := LEFT")
        self.expect(")")
        self.expect(")")
        rkeys = [rk for _, rk in pairs]
        nested = child.groupBy(*rkeys).agg(
            F.collect_list(
                F.struct(*[c for c in child.columns if c not in rkeys])
            ).alias(nested_field)
        )
        cond = None
        for lf, rf in pairs:
            c = parent[lf] == nested[rf]
            cond = c if cond is None else cond & c
        return parent.join(nested, cond, "left").select(
            *[parent[c] for c in parent.columns], nested[nested_field]
        )

    def _literal(self):
        """One literal token (string/number/bool) as a Python value."""
        t = self.next()
        if t.kind == "str":
            return _unquote(t.text)
        if t.kind == "num":
            return float(t.text) if "." in t.text else int(t.text)
        if t.text == "true":
            return True
        if t.text == "false":
            return False
        if t.text == "-" and self.peek().kind == "num":
            n = self.next()
            return -(float(n.text) if "." in n.text else int(n.text))
        raise EclSyntaxError(f"expected literal at {t.pos}, got {t.text!r}")

    _SPARK_TYPE = {
        "string": "string", "varstring": "string", "qstring": "string",
        "utf8": "string", "unicode": "string", "integer": "long",
        "unsigned": "long", "real": "double", "decimal": "double",
        "udecimal": "double", "boolean": "boolean",
    }

    def _one_field(self) -> tuple[str, str, int | None]:
        """``type name`` → (name, spark_type, fixed_width|None). A digit
        suffix on a string type (string20) is its FIXED width — values
        pad with trailing spaces, exactly as the reference stores and
        prints them (rtlField string semantics)."""
        ty = self.next()
        m = self._TYPE_RX.match(ty.text)
        if not m:
            raise EclSyntaxError(f"expected field type at {ty.pos}, got {ty.text!r}")
        nm = self.next()
        if nm.kind != "ident":
            raise EclSyntaxError(f"expected field name at {nm.pos}")
        width = None
        base = m.group(1)
        digits = ty.text[len(base):]
        if base in ("string", "qstring", "varstring") and digits.isdigit():
            width = int(digits)
        default = None
        if self.accept(":="):  # field default: integer2 age := 25
            default = self._literal()
        return nm.text, self._SPARK_TYPE[base], width, default

    def _record_fields(self) -> list[tuple[str, str, int | None]]:
        """{ type name, type name, ... } or a named RECORD reference →
        [(name, spark_type, width)]."""
        if self.peek().kind == "ident" and self.peek().text in self.records:
            return self.records[self.next().text]
        self.expect("{")
        # {recname} — braces around a named record reference
        if (
            self.peek().kind == "ident"
            and self.peek().text in self.records
            and self.toks[self.i + 1].text == "}"
        ):
            fields = self.records[self.next().text]
            self.expect("}")
            return fields
        fields: list[tuple] = []
        while True:
            fields.append(self._one_field())
            if not (self.accept(",") or self.accept(";")):
                break
            if self.peek().text == "}":  # trailing separator
                break
        self.expect("}")
        return fields

    def _record_end(self) -> list[tuple[str, str, int | None]]:
        """RECORD type name; ... END — the named-record definition form
        (hqlgram.y record productions)."""
        self.expect("record")
        fields: list[tuple[str, str, int | None]] = []
        while self.peek().text != "end":
            fields.append(self._one_field())
            if not (self.accept(";") or self.accept(",")):
                break
        self.expect("end")
        return fields

    def _inline_dataset(self) -> DataFrame:
        """DATASET([{v, v}, ...], { type name, ... }) — inline table
        (TAKinlinetable eclhelper.hpp:1034). Rows carry a hidden ordinal
        so positional semantics downstream (adjacent DEDUP, SAMPLE) see
        the literal order; user-visible results drop it."""
        self.expect("dataset")
        self.expect("(")
        self.expect("[")
        rows: list[tuple] = []
        if not self.accept("]"):
            while True:
                if self.accept("{"):
                    vals = [self._literal()]
                    while self.accept(","):
                        vals.append(self._literal())
                    self.expect("}")
                    rows.append(tuple(vals))
                else:
                    # scalar-row form: DATASET([1,2,3], {integer x})
                    rows.append((self._literal(),))
                if not self.accept(","):
                    break
            self.expect("]")
        self.expect(",")
        fields = self._record_fields()
        self.expect(")")
        schema = ", ".join(f"{n} {t}" for n, t, _, _ in fields) + ", __ord__ long"
        for r in rows:
            if len(r) > len(fields):
                raise EclSyntaxError(
                    f"inline row has {len(r)} values for {len(fields)} fields"
                )
            missing = fields[len(r):]
            if any(d is None for _, _, _, d in missing):
                raise EclSyntaxError(
                    f"inline row has {len(r)} values for {len(fields)} fields "
                    "(omitted fields need declared defaults)"
                )

        def coerce(v, ty, width):
            if ty == "double" and isinstance(v, int):
                return float(v)
            if width is not None and isinstance(v, str):
                return v.ljust(width)  # fixed-width string: pad, as stored
            return v

        data = [
            tuple(
                coerce(v, ty, w)
                for v, (_, ty, w, _) in zip(
                    tuple(r) + tuple(d for _, _, _, d in fields[len(r):]),
                    fields,
                )
            )
            + (i,)
            for i, r in enumerate(rows)
        ]
        df = self.spark().createDataFrame(data, schema)
        self._set_order(df, [F.col("__ord__")])
        return df

    def _dict_record(self):
        """DICTIONARY record: { [type] key [, ...] => [type] value
        { DEFAULT('x') } [, ...] } — returns (key_fields, value_fields,
        defaults) where fields are (name, spark_type|None)."""
        self.expect("{")
        key_fields: list[tuple[str, str | None]] = []
        value_fields: list[tuple[str, str | None]] = []
        defaults: dict[str, object] = {}
        side = key_fields
        while True:
            t = self.next()
            ty = None
            if (
                self._TYPE_RX.match(t.text)
                and self.peek().kind == "ident"
            ):
                ty = self._SPARK_TYPE[self._TYPE_RX.match(t.text).group(1)]
                t = self.next()
            if t.kind != "ident":
                raise EclSyntaxError(f"expected field name at {t.pos}")
            name = t.text
            side.append((name, ty))
            # field attribute block: { DEFAULT('x') } — the miss value
            if self.accept("{"):
                while not self.accept("}"):
                    a = self.next()
                    if a.text == "default":
                        self.expect("(")
                        defaults[name] = self._literal()
                        self.expect(")")
                    elif a.kind == "eof":
                        raise EclSyntaxError("unclosed field attributes")
            if self.accept("=>"):
                side = value_fields
                continue
            if not self.accept(","):
                break
        self.expect("}")
        return key_fields, value_fields, defaults

    @staticmethod
    def _type_zero(ty: str | None):
        """The reference's empty value for a missed lookup without an
        explicit DEFAULT (rtlField defaults): '' / 0 / false."""
        return {"long": 0, "double": 0.0, "boolean": False}.get(ty or "string", "")

    def _dictionary(self) -> dict:
        """DICTIONARY([{k [=> v]}, ...] | ds, { record }) (type_dictionary
        hqlexpr.hpp:73): parsed to a driver-side key set + value map
        (single-field keys) — the broadcast-map lookup shape the
        combinator layer uses (queries/q_nested.py dictionary_lookup).
        First entry wins on duplicate keys, matching the reference's
        load order. Supports DEFAULT('x') miss values and building from
        a (small) dataset expression."""
        self.expect("dictionary")
        self.expect("(")
        entries: list[tuple] = []  # (key, [value literals...])
        src_df = None
        if self.accept("["):
            if not self.accept("]"):
                while True:
                    self.expect("{")
                    k = self._literal()
                    vals = []
                    if self.accept("=>"):
                        vals.append(self._literal())
                        while self.accept(","):
                            vals.append(self._literal())
                    self.expect("}")
                    entries.append((k, vals))
                    if not self.accept(","):
                        break
                self.expect("]")
        else:
            src_df = self.dataset()
        self.expect(",")
        key_fields, value_fields, defaults = self._dict_record()
        self.expect(")")
        if len(key_fields) != 1:
            raise EclSyntaxError("only single-field dictionary keys are supported")
        if src_df is not None:
            kcol = key_fields[0][0]
            vcols = [n for n, _ in value_fields]
            entries = [
                (row[kcol], [row[c] for c in vcols])
                for row in src_df.select(kcol, *vcols).collect()
            ]
        keys: list = []
        values: dict = {}
        for k, vals in entries:
            if k in values:
                continue  # first entry wins
            keys.append(k)
            values[k] = {
                name: (vals[j] if j < len(vals) else None)
                for j, (name, _) in enumerate(value_fields)
            }
        return {
            "keys": keys,
            "values": values,
            "key_field": key_fields[0][0],
            "value_fields": value_fields,
            "defaults": defaults,
        }

    def _if_dataset(self) -> DataFrame:
        """IF(cond, ds1 [, ds2]) at dataset position (TAKif
        eclhelper.hpp:914): pick a dataset on a row-independent scalar
        condition. The condition may use literals, EXISTS(ds) and scalar
        dataset aggregates (no bare columns — there is no row to read
        them from); it is evaluated once, driver-side, exactly as the
        reference's conditional activity resolves before the chosen
        branch runs. The else branch defaults to the then-branch's
        empty frame."""
        self.expect("if")
        self.expect("(")
        dummy = self._dummy()
        cond = self.value(dummy)
        self.expect(",")

        def branch():
            # a branch may be a dataset OR an OUTPUT action (the chosen
            # branch's output becomes this statement's result)
            if self.accept("output"):
                self.expect("(")
                b = self._output_arg()
                self.expect(")")
                return b
            return self.dataset()

        then_df = branch()
        else_df = None
        if self.accept(","):
            else_df = branch()
        self.expect(")")
        truth = bool(dummy.select(cond.alias("c")).collect()[0].c)
        if truth:
            return then_df
        return else_df if else_df is not None else then_df.limit(0)

    def _scalar_dataset(self) -> DataFrame:
        fn = self.next().text  # count | sum | min | max | ave
        self.expect("(")
        df = self.dataset()
        if fn == "count":
            self.expect(")")
            return df.agg(F.count(F.lit(1)).alias("cnt"))
        self.expect(",")
        e = self.value(df)
        self.expect(")")
        agg = {"sum": F.sum, "min": F.min, "max": F.max, "ave": F.avg}[fn]
        alias = {"sum": "total", "min": "minval", "max": "maxval", "ave": "aveval"}[fn]
        return df.agg(agg(e).alias(alias))

    # --- value expressions (filters, computed fields) ---
    def value(self, df: DataFrame) -> Column:
        return self._or(df)

    def _or(self, df) -> Column:
        c = self._and(df)
        while self.peek().text == "or":
            self.next()
            c = c | self._and(df)
        return c

    def _and(self, df) -> Column:
        c = self._not(df)
        while self.peek().text == "and":
            self.next()
            c = c & self._not(df)
        return c

    def _not(self, df) -> Column:
        if self.peek().text == "not":
            self.next()
            return ~self._not(df)
        return self._cmp(df)

    def _cmp(self, df) -> Column:
        a = self._addsub(df)
        t = self.peek().text
        if t in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.next()
            return _cmp(t, a, self._addsub(df))
        negate = False
        if t == "not" and self.toks[self.i + 1].text == "in":
            # postfix NOT IN (x NOT IN set/dictionary)
            self.next()
            t = "in"
            negate = True
        if t == "in":
            self.next()
            if self.peek().kind == "ident" and self.peek().text in self.sets:
                vals = self.sets[self.next().text]
                m = a.isin(*vals) if vals else F.lit(False)
                return ~m if negate else m
            if self.peek().kind == "ident" and self.peek().text in self.dicts:
                d = self.dicts[self.next().text]
                # empty dictionary: isin() with no args is invalid — and
                # nothing is a member of the empty set
                m = a.isin(*d["keys"]) if d["keys"] else F.lit(False)
                return ~m if negate else m
            self.expect("[")
            items = [self._addsub(df)]
            while self.accept(","):
                items.append(self._addsub(df))
            self.expect("]")
            m = a.isin(*items)
            return ~m if negate else m
        if t == "between":
            self.next()
            lo = self._addsub(df)
            self.expect("and")
            hi = self._addsub(df)
            return (a >= lo) & (a <= hi)
        return a

    def _addsub(self, df) -> Column:
        c = self._muldiv(df)
        while self.peek().text in ("+", "-"):
            op = self.next().text
            rhs = self._muldiv(df)
            c = c + rhs if op == "+" else c - rhs
        return c

    def _muldiv(self, df) -> Column:
        c = self._unary(df)
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            rhs = self._unary(df)
            c = c * rhs if op == "*" else (c / rhs if op == "/" else c % rhs)
        return c

    def _unary(self, df) -> Column:
        if self.accept("-"):
            return -self._unary(df)
        return self._atom(df)

    def _atom(self, df) -> Column:
        t = self.next()
        if t.kind == "num":
            return F.lit(float(t.text) if "." in t.text else int(t.text))
        if t.kind == "str":
            return F.lit(_unquote(t.text))
        if t.text == "true":
            return F.lit(True)
        if t.text == "false":
            return F.lit(False)
        if t.text == "round":
            self.expect("(")
            inner = self.value(df)
            self.expect(",")
            nd = self.next()
            self.expect(")")
            return F.round(inner, int(nd.text))
        if t.text == "if":
            self.expect("(")
            cond = self.value(df)
            self.expect(",")
            then = self.value(df)
            self.expect(",")
            els = self.value(df)
            self.expect(")")
            return F.when(cond, then).otherwise(els)
        if t.text == "abs":
            self.expect("(")
            inner = self.value(df)
            self.expect(")")
            return F.abs(inner)
        if t.text in ("sum", "count", "min", "max", "ave") and (
            self._having_win is not None and self.peek().text == "("
            and self.toks[self.i + 1].text == "group"
        ):
            # HAVING-condition group aggregate: COUNT(GROUP) / SUM(GROUP, e)
            # — windowed over the GROUP keys so rows survive intact.
            self.expect("(")
            self.expect("group")
            if t.text == "count":
                self.expect(")")
                return F.count(F.lit(1)).over(self._having_win)
            self.expect(",")
            e = self.value(df)
            self.expect(")")
            agg = {"sum": F.sum, "min": F.min, "max": F.max, "ave": F.avg}[t.text]
            return agg(e).over(self._having_win)
        if t.text in ("sum", "count", "min", "max", "ave") and (
            self.peek().text == "(" and self._at_dataset_start(self.i + 1)
        ):
            # scalar dataset aggregate inside a value expression:
            # ds(x > AVE(ds2, y)) — ECL evaluates the global aggregate
            # once and compares rows against it. Evaluated eagerly
            # (one action) and inlined as a literal, the same
            # broadcast-scalar plan the combinator layer uses
            # (workload_idle_rich_customers Q22 shape).
            self.next()
            inner = self.dataset()
            if t.text == "count":
                self.expect(")")
                val = inner.count()
            else:
                self.expect(",")
                e = self.value(inner)
                self.expect(")")
                agg = {
                    "sum": F.sum, "min": F.min, "max": F.max, "ave": F.avg
                }[t.text]
                val = inner.agg(agg(e)).collect()[0][0]
            return F.lit(val)
        if (
            t.text in ("exists", "count")
            and self.peek().text == "("
            and self.toks[self.i + 1].kind == "ident"
            and self.toks[self.i + 1].text in self.dicts
            and self.toks[self.i + 2].text == ")"
        ):
            # EXISTS(dict) / COUNT(dict) — driver-side dictionary
            self.next()
            d = self.dicts[self.next().text]
            self.expect(")")
            n = len(d["keys"])
            return F.lit(n > 0) if t.text == "exists" else F.lit(n)
        if t.text == "exists" and self.peek().text == "(":
            # EXISTS(ds) — true when the dataset is non-empty; probes at
            # most one row (limit(1)), not a full count.
            self.next()
            inner = self.dataset()
            self.expect(")")
            return F.lit(len(inner.limit(1).take(1)) > 0)
        if t.text in ("min", "max") and self.peek().text == "(":
            # two-argument scalar MIN/MAX — LEAST/GREATEST
            self.next()
            a = self.value(df)
            self.expect(",")
            b = self.value(df)
            self.expect(")")
            return F.least(a, b) if t.text == "min" else F.greatest(a, b)
        if t.text == "length":
            self.expect("(")
            inner = self.value(df)
            self.expect(")")
            return F.length(inner)
        if t.text == "std" and self.peek().text == ".":
            return self._std_call(df)
        if t.text == "nofold" and self.peek().text == "(":
            self.next()
            inner = self.value(df)
            self.expect(")")
            return inner
        if t.text == "getenv" and self.peek().text == "(":
            # GETENV(name [, default]) (Thorlib.ecl:80) — resolved at
            # plan time on the driver, like the reference's codegen
            import os as _os

            self.next()
            nm = self.next()
            if nm.kind != "str":
                raise EclSyntaxError("GETENV needs a literal name")
            dflt = ""
            if self.accept(","):
                dv = self.next()
                if dv.kind != "str":
                    raise EclSyntaxError("GETENV default must be a literal")
                dflt = _unquote(dv.text)
            self.expect(")")
            return F.lit(_os.environ.get(_unquote(nm.text), dflt))
        if t.text == "catch" and self.peek().text == "(":
            # CATCH(expr, fallback) scalar form (no_catchds analogue for
            # values; testing/regress/ecl/catchexpr.ecl): evaluate the
            # first expression; a runtime failure yields the fallback.
            # LIMITATION (documented): the decision is made once at parse
            # time by probing a limit(1) evaluation — an expression that
            # only fails on rows beyond the first keeps the failing
            # branch, unlike the reference's per-evaluation CATCH. The
            # regress corpus exercises whole-expression failures (divide
            # by zero, FAIL()), which the probe classifies correctly.
            self.next()
            a = self.value(df)
            self.expect(",")
            b = self.value(df)
            self.expect(")")
            try:
                df.select(a.alias("probe")).limit(1).collect()
                return a
            except Exception:
                return b
        if t.text == "trim":
            self.expect("(")
            inner = self.value(df)
            self.expect(")")
            return F.rtrim(inner)  # ECL TRIM strips trailing blanks by default
        if t.text == "[":
            # set literal as a value: [1,2,3] — an array constant
            vals = []
            if self.peek().text != "]":
                while True:
                    vals.append(self._literal())
                    if not self.accept(","):
                        break
            self.expect("]")
            return F.lit(vals)
        if t.text == "(":
            c = self.value(df)
            self.expect(")")
            return c
        if t.text == "left" and self.peek().text == ".":
            # TRANSFORM-context LEFT.x — reads the input row's field
            self.next()
            return df[self.next().text]
        if t.text == "right" and self.peek().text == ".":
            # NORMALIZE-context RIGHT.y — reads the exploded child element
            right = getattr(self, "_right_struct", None)
            if right is None:
                raise EclSyntaxError(f"RIGHT.<field> outside NORMALIZE at {t.pos}")
            self.next()
            return right.getField(self.next().text)
        if t.kind == "ident" and t.text in self.sets:
            v = self.sets[t.text]
            if self.peek().text == "[":
                # set slicing, 1-based inclusive: s[a..b] / s[..b] /
                # s[a..] / s[a..*] / s[n]
                self.next()
                a = None
                if self.peek().kind == "num":
                    a = int(self.next().text)
                if self.accept("."):
                    self.expect(".")
                    b = None
                    if self.peek().kind == "num":
                        b = int(self.next().text)
                    elif self.accept("*"):
                        b = None
                    self.expect("]")
                    lo = (a or 1) - 1
                    v = v[lo:] if b is None else v[lo:b]
                else:
                    self.expect("]")
                    if a is None:
                        raise EclSyntaxError(f"set index needed at {t.pos}")
                    return F.lit(v[a - 1])
            return F.lit(v)
        if t.kind == "ident" and t.text in self.dicts and self.peek().text == "[":
            # dict[key].field — miss yields the field's DEFAULT, else the
            # type's empty value (''/0/false), as the reference renders it
            d = self.dicts[t.text]
            self.next()
            k = self._literal()
            self.expect("]")
            self.expect(".")
            fld = self.next().text
            names = [n for n, _ in d["value_fields"]]
            if fld not in names:
                raise EclSyntaxError(f"unknown dictionary value field {fld!r}")
            entry = d["values"].get(k)
            if entry is not None and entry.get(fld) is not None:
                return F.lit(entry[fld])
            if fld in d["defaults"]:
                return F.lit(d["defaults"][fld])
            ty = dict(d["value_fields"])[fld]
            return F.lit(self._type_zero(ty))
        if t.kind == "ident":
            if t.text in self.scalars and t.text not in df.columns:
                return self.scalars[t.text]
            return df[t.text]
        raise EclSyntaxError(f"unexpected token {t.text!r} at {t.pos}")

    def _std_call(self, df) -> Column:
        """STD.Str.<fn>(args) — the everyday Std.Str plugin surface
        (plugins/stringlib; functions/strings.py is the combinator
        layer). Name-matched case-insensitively like the reference."""
        self.next()  # '.'
        mod = self.next().text
        if mod != "str":
            raise EclSyntaxError(f"unsupported STD module {mod!r}")
        self.expect(".")
        fn = self.next().text
        self.expect("(")
        args: list = [self.value(df)]
        while self.accept(","):
            # Find's target/instance arguments must be literals (the
            # JVM locate() needs a plain string); peek for those.
            t = self.peek()
            if t.kind in ("num", "str"):
                self.next()
                args.append(_unquote(t.text) if t.kind == "str" else int(t.text))
            else:
                args.append(self.value(df))
        self.expect(")")
        from hpcc_platform_spark.functions import strings as S

        if fn == "touppercase":
            return F.upper(args[0])
        if fn == "tolowercase":
            return F.lower(args[0])
        if fn == "reverse":
            return F.reverse(args[0])
        if fn == "cleanspaces":
            return S.clean_spaces(args[0])
        if fn == "startswith":
            if not isinstance(args[1], str):
                raise EclSyntaxError("StartsWith needs a literal prefix")
            return S.starts_with(args[0], args[1])
        if fn == "endswith":
            if not isinstance(args[1], str):
                raise EclSyntaxError("EndsWith needs a literal suffix")
            return S.ends_with(args[0], args[1])
        if fn == "find":
            # Std.Str.Find(src, target, instance) -> 1-based position of
            # the instance-th occurrence; 0 when absent. Only instance=1
            # maps to the JVM locate().
            if not isinstance(args[1], str):
                raise EclSyntaxError("Find needs a literal target string")
            inst = args[2] if len(args) > 2 else 1
            if inst != 1:
                raise EclSyntaxError("Find supports instance=1 only")
            return F.locate(args[1], args[0])
        raise EclSyntaxError(f"unsupported STD.Str function {fn!r}")


def _cmp(op: str, a: Column, b: Column) -> Column:
    if op == "=":
        return a == b
    if op in ("<>", "!="):
        return a != b
    if op == "<":
        return a < b
    if op == "<=":
        return a <= b
    if op == ">":
        return a > b
    if op == ">=":
        return a >= b
    raise EclSyntaxError(f"unknown comparison {op!r}")


def run_ecl(
    text: str,
    catalog: Mapping[str, DataFrame],
    persist_cache=None,
    spark=None,
) -> DataFrame:
    """Parse and evaluate an ECL query (definitions + OUTPUTs / bare
    actions) against ``catalog`` (name → DataFrame). Returns the LAST
    action's dataset (use run_ecl_actions for all of them).
    ``persist_cache`` (a plans.PersistCache) activates the
    ``: PERSIST('name')`` workflow annotation on definitions; ``spark``
    is only needed when the catalog is empty (inline-dataset programs)."""
    return _Parser(_lex(text), catalog, persist_cache, spark).program()


def run_ecl_actions(
    text: str,
    catalog: Mapping[str, DataFrame],
    persist_cache=None,
    spark=None,
) -> list[DataFrame]:
    """Like run_ecl, but returns every action's result in program order —
    the reference's one-result-per-action workunit shape (regress key
    files list them as Result 1..N)."""
    p = _Parser(_lex(text), catalog, persist_cache, spark)
    p.program()
    return p.actions
