"""Text-search batch-query engine — the reference regress suite's
`$.Common.TextSearch` module re-expressed for Spark.

Reference ground truth: testing/regress/ecl/common/TextSearch.ecl —
a simplified search-query language (`parseQuery` :897-1427), three
plan rewrites (`transformAtLeast` :1540-1610, `transformNotIn`
:1620-1700, `transformIn` :1710-1800), a max-words-in-phrase
annotation pass (`doCalculateMaxWip` :1430-1490) and a stage-graph
executor (`SearchExecutor.processStage` :443-846) driven by GRAPH over
the word index built by setup/setuptext.ecl (re-implemented in
regress_fixtures._ts_invert_doc).

Execution model: a *batch* of query strings is the dataset; the word
index is a small broadcast fixture (the reference builds it once in
setup). Each query row parses/compiles/executes independently —
`batch_execute_df` maps the query table through mapInPandas with the
index broadcast, so 1M queries fan out across executors while each
query's own stage graph runs locally against the (tiny, broadcast)
index — the Spark shape of Roxie's one-agent-per-query execution. For
searching *large* corpora the distributed path is
operators/textsearch.py (term-pruned scans + aggregation plans); this
module is the query-language + plan-rewrite front end the regress
keys pin (textsearch1-3, textsearch1_thorlocal — all four key files
are byte-identical, so internalFlags variants share one engine).
"""

from __future__ import annotations

import re
from functools import lru_cache

# actionEnum (TextSearch.ecl:62-110) — ENUM values in declaration order
A_NONE = 0
A_READWORD = 1
A_READWORDSET = 2
A_ANDTERMS = 3
A_ORTERMS = 4
A_ANDNOTTERMS = 5
A_PHRASEAND = 6
A_PROXIMITYAND = 7
A_MOFNTERMS = 8
A_RANKMERGETERMS = 9
A_ROLLUPBYDOCUMENT = 10
A_NORMALIZEMATCH = 11
A_PHRASE1TO5AND = 12
A_GLOBALATLEAST = 13
A_CONTAINEDATLEAST = 14
A_TAGCONTAINSSEARCH = 15
A_TAGCONTAINSTERM = 16
A_TAGNOTCONTAINSTERM = 17
A_SAMECONTAINER = 18
A_NOTSAMECONTAINER = 19
A_MOFNCONTAINER = 20
A_RANKCONTAINER = 21
A_OVERLAPPROXIMITYAND = 22
A_ANDJOINTERMS = 23
A_ANDNOTJOINTERMS = 24
A_MOFNJOINTERMS = 25
A_RANKJOINTERMS = 26
A_PROXIMITYMERGEAND = 27
A_ROLLUPCONTAINER = 28
A_POSITIONFILTER = 29
A_CHOOSERANGE = 30
A_BUTNOTTERMS = 31
A_BUTNOTJOINTERMS = 32
A_PASSTHROUGH = 33
A_POSITIONNOTFILTER = 34

MAX_WIP_WORD_OR_ALIAS = 4       # TextSearch.ecl:55
MAX_WIP_TAG_CONTENTS = 65535    # :56
MAX_WORDS_IN_DOCUMENT = 1000000  # :57
MAX_COLUMNS_PER_LINE = 10000    # setup/ts.ecl MaxColumnsPerLine
MAX_RESULTS = 10000             # TextSearch.ecl MaxResults
HAS_UPPER = 2                   # ts.ecl wordFlags.hasUpper
HAS_LOWER = 1                   # ts.ecl wordFlags.hasLower

# hasSingleRowPerMatch / inheritsSingleRowPerMatch (TextSearch.ecl:185-203)
_SINGLE = {
    A_READWORD, A_READWORDSET, A_PHRASEAND, A_PROXIMITYAND,
    A_CONTAINEDATLEAST, A_TAGCONTAINSTERM, A_TAGCONTAINSSEARCH,
    A_OVERLAPPROXIMITYAND,
}
_INHERIT_SINGLE = {A_ORTERMS, A_TAGNOTCONTAINSTERM, A_NOTSAMECONTAINER}


def _node(**kw) -> dict:
    """A searchRecord (TextSearch.ecl:131-163) with zero defaults."""
    d = {
        "stage": 0, "term": 0, "action": A_NONE, "inputs": [],
        "maxwip": 0, "maxwipchild": 0, "maxwipleft": 0, "maxwipright": 0,
        "word": "", "words": [], "wordflagmask": 0, "wordflagcompare": 0,
        "source": 0, "segment": 0, "seekwpos": 0, "priority": 0,
        "mdrbl": 0, "mdral": 0, "minmatches": 0, "maxmatches": 0,
        "terms": [], "numinputs": 0,
    }
    d.update(kw)
    return d


class _QueryError(Exception):
    pass


_TOKEN_RE = re.compile(
    r'\s*(?:(-?[0-9]+)|"([A-Za-z][A-Za-z0-9]*)"|([A-Za-z_][A-Za-z0-9_]*)'
    r"|([(),:]))"
)


def _tokenize(text: str) -> list[tuple[str, str]]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            if text[i:].strip(" \t") == "":
                break
            raise _QueryError(f"bad token at {i}: {text[i:]!r}")
        if m.group(1) is not None:
            toks.append(("num", m.group(1)))
        elif m.group(2) is not None:
            toks.append(("qword", m.group(2)))
        elif m.group(3) is not None:
            toks.append(("kw", m.group(3).upper()))
        else:
            toks.append(("punc", m.group(4)))
        i = m.end()
    return toks


class _Parser:
    """Recursive-descent form of the PARSE RULE grammar
    (TextSearch.ecl term0/term1/termList :936-1374), producing the
    reverse-polish action list the reference's productionRecord
    accumulates."""

    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, text):
        k, v = self.next()
        if v != text:
            raise _QueryError(f"expected {text!r} got {v!r}")

    def number(self) -> int:
        k, v = self.next()
        if k != "num":
            raise _QueryError(f"expected number, got {v!r}")
        return int(v)

    def wordpat(self) -> str:
        k, v = self.next()
        if k != "kw":
            raise _QueryError(f"expected word, got {v!r}")
        return v.lower()

    # --- term0 / capsTerm0 (:938-957) ---
    def term0(self) -> dict:
        k, v = self.next()
        if k != "qword":
            raise _QueryError(f"expected quoted word, got {v!r}")
        n = _node(action=A_READWORD, word=v.lower())
        if self.peek() == ("punc", ":"):
            self.next()
            n["priority"] = self.number()
        return n

    def _caps_wrap(self, kw: str, inner) -> dict:
        self.expect("(")
        n = inner()
        self.expect(")")
        if kw == "CAPS":
            n["wordflagmask"], n["wordflagcompare"] = HAS_UPPER, HAS_UPPER
        elif kw == "NOCAPS":
            n["wordflagmask"], n["wordflagcompare"] = HAS_UPPER, 0
        else:  # ALLCAPS
            n["wordflagmask"] = HAS_UPPER + HAS_LOWER
            n["wordflagcompare"] = HAS_UPPER
        return n

    def caps_term0(self) -> dict:
        k, v = self.peek()
        if k == "kw" and v in ("CAPS", "NOCAPS", "ALLCAPS"):
            self.next()
            return self._caps_wrap(v, self.term0)
        return self.term0()

    def term0_list(self) -> dict:
        first = self.term0()
        n = _node(
            action=A_READWORDSET, words=[first["word"]],
            priority=first["priority"],
        )
        while self.peek() == ("punc", ","):
            self.next()
            t = self.term0()
            n["words"].append(t["word"])
            n["priority"] = t["priority"]
        return n

    def caps_term0_list(self) -> dict:
        k, v = self.peek()
        if k == "kw" and v in ("CAPS", "NOCAPS", "ALLCAPS"):
            self.next()
            return self._caps_wrap(v, self.term0_list)
        return self.term0_list()

    # --- termList (:981-984): list of exprs; returns (count, actions)
    def term_list(self) -> tuple[int, list]:
        count, acts = 1, self.expr()
        while self.peek() == ("punc", ","):
            self.next()
            acts += self.expr()
            count += 1
        return count, acts

    def _two(self) -> list:
        self.expect("(")
        a = self.expr()
        self.expect(",")
        b = self.expr()
        self.expect(")")
        return a + b

    def _nary(self) -> tuple[int, list]:
        self.expect("(")
        count, acts = self.term_list()
        self.expect(")")
        return count, acts

    # --- term1 (:986-1374) ---
    def expr(self) -> list:
        k, v = self.peek()
        if k == "qword":
            return [self.caps_term0()]
        if k == "punc" and v == "(":
            self.next()
            acts = self.expr()
            self.expect(")")
            return acts
        if k != "kw":
            raise _QueryError(f"unexpected token {v!r}")
        if v in ("CAPS", "NOCAPS", "ALLCAPS"):
            # bare capsTerm0 (:952-957) — the list form only occurs
            # inside SET(capsTerm0List)
            self.next()
            return [self._caps_wrap(v, self.term0)]
        self.next()
        if v == "SET":
            self.expect("(")
            n = self.caps_term0_list()
            self.expect(")")
            return [n]
        if v == "AND":
            c, acts = self._nary()
            return acts + [_node(action=A_ANDTERMS, numinputs=c)]
        if v == "ANDNOT":
            return self._two() + [_node(action=A_ANDNOTTERMS, numinputs=2)]
        if v == "BUTNOT":
            return self._two() + [_node(action=A_BUTNOTTERMS, numinputs=2)]
        if v == "BUTNOTJOIN":
            return self._two() + [
                _node(action=A_BUTNOTJOINTERMS, numinputs=2)
            ]
        if v == "RANK":
            return self._two() + [
                _node(action=A_RANKMERGETERMS, numinputs=2)
            ]
        if v in ("MOFN", "MOFNJOIN"):
            act = A_MOFNTERMS if v == "MOFN" else A_MOFNJOINTERMS
            self.expect("(")
            m1 = self.number()
            self.expect(",")
            if self.peek()[0] == "num":
                m2 = self.number()
                self.expect(",")
                c, acts = self.term_list()
                self.expect(")")
                return acts + [
                    _node(action=act, numinputs=c, minmatches=m1,
                          maxmatches=m2)
                ]
            c, acts = self.term_list()
            self.expect(")")
            return acts + [
                _node(action=act, numinputs=c, minmatches=m1, maxmatches=c)
            ]
        if v == "OR":
            c, acts = self._nary()
            return acts + [_node(action=A_ORTERMS, numinputs=c)]
        if v == "PHRASE":
            c, acts = self._nary()
            return acts + [_node(action=A_PHRASEAND, numinputs=c)]
        if v == "PHRASE1TO5":
            c, acts = self._nary()
            return acts + [_node(action=A_PHRASE1TO5AND, numinputs=c)]
        if v in ("PROXIMITY", "PROXMERGE"):
            act = (
                A_PROXIMITYAND if v == "PROXIMITY" else A_PROXIMITYMERGEAND
            )
            self.expect("(")
            a = self.expr()
            self.expect(",")
            b = self.expr()
            self.expect(",")
            d1 = self.number()
            self.expect(",")
            d2 = self.number()
            self.expect(")")
            return a + b + [
                _node(action=act, numinputs=2, mdrbl=d1, mdral=d2)
            ]
        if v == "OVERLAP":
            return self._two() + [
                _node(action=A_OVERLAPPROXIMITYAND, numinputs=2)
            ]
        if v == "PRE":
            return self._two() + [
                _node(action=A_PROXIMITYAND, numinputs=2, mdrbl=-1,
                      mdral=MAX_WORDS_IN_DOCUMENT)
            ]
        if v == "AFT":
            return self._two() + [
                _node(action=A_PROXIMITYAND, numinputs=2,
                      mdrbl=MAX_WORDS_IN_DOCUMENT, mdral=-1)
            ]
        if v == "ANDJOIN":
            c, acts = self._nary()
            return acts + [_node(action=A_ANDJOINTERMS, numinputs=c)]
        if v == "ANDNOTJOIN":
            return self._two() + [
                _node(action=A_ANDNOTJOINTERMS, numinputs=2)
            ]
        if v == "RANKJOIN":
            return self._two() + [_node(action=A_RANKJOINTERMS, numinputs=2)]
        if v == "ROLLAND":
            c, acts = self._nary()
            return acts + [
                _node(action=A_ANDTERMS, numinputs=c),
                _node(action=A_ROLLUPBYDOCUMENT, numinputs=1),
            ]
        if v == "NORM":
            self.expect("(")
            acts = self.expr()
            self.expect(")")
            return acts + [_node(action=A_NORMALIZEMATCH, numinputs=1)]
        if v == "ATLEAST":
            self.expect("(")
            m = self.number()
            self.expect(",")
            acts = self.expr()
            self.expect(")")
            return acts + [
                _node(action=A_GLOBALATLEAST, numinputs=1, minmatches=m)
            ]
        if v in ("IN", "NOTIN"):
            act = A_TAGCONTAINSSEARCH if v == "IN" else A_TAGNOTCONTAINSTERM
            self.expect("(")
            w = self.wordpat()
            self.expect(",")
            acts = self.expr()
            self.expect(")")
            return acts + [_node(action=act, numinputs=1, word=w)]
        if v == "SAME":
            return self._two() + [_node(action=A_SAMECONTAINER, numinputs=2)]
        if v in ("P", "S"):
            self.expect("(")
            acts = self.expr()
            self.expect(")")
            return acts + [
                _node(action=A_TAGCONTAINSSEARCH, numinputs=1,
                      word=v.lower())
            ]
        if v in ("AT", "NOTAT"):
            act = A_POSITIONFILTER if v == "AT" else A_POSITIONNOTFILTER
            self.expect("(")
            acts = self.expr()
            self.expect(",")
            n = self.number()
            self.expect(")")
            return acts + [_node(action=act, numinputs=1, seekwpos=n)]
        if v == "FIRST":
            self.expect("(")
            acts = self.expr()
            self.expect(",")
            n = self.number()
            self.expect(")")
            return acts + [
                _node(action=A_CHOOSERANGE, numinputs=1, minmatches=1,
                      maxmatches=n)
            ]
        if v == "RANGE":
            self.expect("(")
            acts = self.expr()
            self.expect(",")
            m1 = self.number()
            self.expect(",")
            m2 = self.number()
            self.expect(")")
            return acts + [
                _node(action=A_CHOOSERANGE, numinputs=1, minmatches=m1,
                      maxmatches=m2)
            ]
        if v == "_ATLEASTIN_":
            self.expect("(")
            m = self.number()
            self.expect(",")
            acts = self.expr()
            self.expect(",")
            t = self.number()
            self.expect(")")
            return acts + [
                _node(action=A_CONTAINEDATLEAST, numinputs=1,
                      minmatches=m, terms=[t])
            ]
        raise _QueryError(f"unknown operator {v!r}")


def parse_query(text: str) -> list[dict]:
    """parseQuery (TextSearch.ecl:897-1427): RPN actions with stage,
    term and input-stage assignment (assignStages :1399-1421). Returns
    [] when the grammar does not match (the reference's PARSE drops the
    row — the blank trailing query)."""
    try:
        toks = _tokenize(text)
        if not toks:
            return []
        p = _Parser(toks)
        acts = p.expr()
        if p.peek()[0] != "eof":
            raise _QueryError("trailing tokens")
    except _QueryError:
        return []
    stack: list[int] = []
    for i, n in enumerate(acts):
        stage = i + 1
        n["stage"] = stage
        n["term"] = stage
        k = n["numinputs"]
        n["inputs"] = stack[len(stack) - k:] if k else []
        del stack[len(stack) - k:]
        stack.append(stage)
    return acts


# ---------------------------------------------------------------------------
# Plan rewrites (TextSearch.ecl transformAtLeast / transformNotIn /
# transformIn / doCalculateMaxWip)


def _renumber_expand(nodes: list[dict], expand) -> list[dict]:
    """deleteExpandStages (TextSearch.ecl:1496-1517): renumber stages
    by each node's numStages (0 deletes the node, mapping it onto the
    previous surviving stage), remap inputs, then expand each survivor
    into numStages rows via ``expand(node, c)`` (1-based counter)."""
    out, mapping, prev = [], {}, 0
    for n in nodes:
        ns = n["numstages"]
        nxt = prev + ns
        if ns:
            row = dict(n)
            row["stage"] = prev + 1
            row["inputs"] = [mapping[s] for s in n["inputs"]]
            for c in range(1, ns + 1):
                out.append(expand(row, c))
        mapping[n["stage"]] = nxt
        prev = nxt
    return out


def transform_atleast(nodes: list[dict]) -> list[dict]:
    """transformAtLeast (TextSearch.ecl:1522-1614): a GlobalAtLeast
    inside a TagContainsSearch is swapped outside it and becomes a
    ContainedAtLeast over the container's gathered terms."""
    # stage1 (forward): outputTerms / active atleast list per stage
    terms_of: dict[int, list[int]] = {}
    atleast_of: dict[int, list[tuple]] = {}
    anno = []
    for n in nodes:
        in_terms = [t for s in n["inputs"] for t in terms_of[s]]
        in_al = [a for s in n["inputs"] for a in atleast_of[s]]
        out_terms = [n["term"]] if n["action"] in _SINGLE else in_terms
        if n["action"] == A_GLOBALATLEAST:
            out_al = in_al + [(n["term"], n["minmatches"], list(in_terms))]
        elif n["action"] != A_TAGCONTAINSSEARCH:
            out_al = in_al
        else:
            out_al = []
        m = dict(n)
        m["moved"] = in_al if n["action"] == A_TAGCONTAINSSEARCH else []
        terms_of[n["stage"]] = out_terms
        atleast_of[n["stage"]] = out_al
        anno.append(m)
    # stage2 (reverse): mark contained atleasts for removal
    contained: set[int] = set()
    for n in reversed(anno):
        remove = n["action"] == A_GLOBALATLEAST and n["stage"] in contained
        n["numstages"] = 0 if remove else 1 + len(n["moved"])
        if n["action"] == A_TAGCONTAINSSEARCH or n["stage"] in contained:
            contained.update(n["inputs"])

    def expand(row, c):
        if c == 1:
            r = dict(row)
        else:
            r = dict(row)
            r["stage"] = row["stage"] + (c - 1)
            r["inputs"] = [row["stage"] + c - 2]
            r["action"] = A_CONTAINEDATLEAST
            r["minmatches"] = row["moved"][c - 2][1]
            r["terms"] = list(row["moved"][c - 2][2])
        r.pop("moved", None)
        return r

    return _renumber_expand(anno, expand)


def _annotate_single(nodes: list[dict]) -> None:
    """stage1 of transformNotIn/transformIn: single-row-per-match
    flags (TextSearch.ecl doStage1)."""
    single: dict[int, bool] = {}
    for n in nodes:
        ins_single = all(single[s] for s in n["inputs"])
        is_single = (
            ins_single
            if n["action"] in _INHERIT_SINGLE
            else n["action"] in _SINGLE
        )
        n["single"] = is_single
        n["ins_single"] = ins_single
        single[n["stage"]] = is_single


def _push_container(nodes: list[dict], push_action: int) -> list[dict]:
    """Shared reverse pass + expansion of transformNotIn (:1620-1706)
    and transformIn (:1712-1800): push the container operator down to
    single-row-per-match nodes. ``push_action`` is TagNotContainsTerm
    or TagContainsSearch."""
    _annotate_single(nodes)
    newmap: dict[int, tuple[str, int]] = {}
    for n in reversed(nodes):
        nc, nt = newmap.get(n["stage"], ("", 0))
        n["newcontainer"], n["newterm"] = nc, nt
        if push_action == A_TAGNOTCONTAINSTERM:
            if n["single"] and nc != "":
                n["numstages"] = 2
            elif n["action"] == push_action and not n["single"]:
                n["numstages"] = 0
            else:
                n["numstages"] = 1
        else:
            n["numstages"] = 2 if (n["single"] and nc != "") else 1
        if n["action"] == push_action and not n["ins_single"]:
            for s in n["inputs"]:
                newmap[s] = (n["word"], n["term"])
        elif not n["single"] and nc != "":
            for s in n["inputs"]:
                newmap[s] = (nc, nt)

    def expand(row, c):
        r = dict(row)
        if c == 2:
            r["stage"] = row["stage"] + 1
            r["inputs"] = [row["stage"]]
            r["action"] = (
                A_TAGNOTCONTAINSTERM
                if push_action == A_TAGNOTCONTAINSTERM
                else A_TAGCONTAINSTERM
            )
            r["word"] = row["newcontainer"]
            r["term"] = row["newterm"]
        elif push_action == A_TAGCONTAINSSEARCH:
            nc = row["newcontainer"]
            act = row["action"]
            mapped = {
                A_ANDTERMS: A_SAMECONTAINER,
                A_ANDNOTTERMS: A_NOTSAMECONTAINER,
                A_MOFNTERMS: A_MOFNCONTAINER,
                A_RANKMERGETERMS: A_RANKCONTAINER,
            }
            if act in mapped and nc != "":
                r["action"] = mapped[act]
            elif act == A_TAGCONTAINSSEARCH:
                r["action"] = (
                    A_TAGCONTAINSSEARCH
                    if row["ins_single"]
                    else A_ROLLUPCONTAINER
                )
        for k in ("single", "ins_single", "newcontainer", "newterm"):
            r.pop(k, None)
        return r

    return _renumber_expand(nodes, expand)


def transform_notin(nodes):
    return _push_container(nodes, A_TAGNOTCONTAINSTERM)


def transform_in(nodes):
    return _push_container(nodes, A_TAGCONTAINSSEARCH)


def calc_maxwip(nodes: list[dict]) -> list[dict]:
    """doCalculateMaxWip (TextSearch.ecl:1430-1490): forward stack
    pass over the RPN graph."""
    stack: list[int] = []
    for n in nodes:
        k = len(n["inputs"])
        child = stack[len(stack) - k:] if k else []
        del stack[len(stack) - k:]
        max_l = child[0] if child else 0
        max_r = child[-1] if k > 1 else 0
        max_c = max(child) if child else 0
        sum_c = sum(child)
        a = n["action"]
        if a == A_READWORD:
            w = MAX_WIP_WORD_OR_ALIAS
        elif a in (A_PHRASEAND, A_PHRASE1TO5AND, A_OVERLAPPROXIMITYAND):
            w = sum_c
        elif a == A_PROXIMITYAND:
            w = max(n["mdrbl"], n["mdral"], 0) + sum_c
        elif a in (A_ANDNOTTERMS, A_BUTNOTTERMS, A_BUTNOTJOINTERMS):
            w = max_l
        elif a in (A_TAGCONTAINSTERM, A_TAGCONTAINSSEARCH):
            w = MAX_WIP_TAG_CONTENTS
        else:
            w = max_c
        n["maxwip"] = w
        n["maxwipleft"] = max_l
        n["maxwipright"] = max_r
        n["maxwipchild"] = max_c
        stack.append(w)
    return nodes


def compile_query(text: str) -> list[dict]:
    """parse + applySearchTransformations (TextSearch.ecl:1803-1809)."""
    return calc_maxwip(
        transform_in(transform_notin(transform_atleast(parse_query(text))))
    )


# ---------------------------------------------------------------------------
# Stage executor (SearchExecutor, TextSearch.ecl:245-846). A match is
# (doc, segment, wpos, wip, dpos, term, children); children is a tuple
# of (wpos, wip, term) kept sorted (wpos, wip).

_K_TEXT = 1   # ts.ecl kindType.TextEntry
_K_OPEN = 2   # kindType.OpenTagEntry


def _children_of(m) -> tuple:
    """createChildrenFromMatch (TextSearch.ecl:230-234)."""
    return m[6] if m[6] else ((m[2], m[3], m[5]),)


def _merge_children(l: tuple, r: tuple) -> tuple:
    """combineChildren (:236-241): merge + dedup on (wpos, wip, term)."""
    return tuple(sorted(set(l) | set(r)))


def _sort_key(m):
    return (m[0], m[1], m[2])


def _dedup_on_keys(rows):
    """merge/mergejoin DEDUP flag: drop rows equal on the stepped sort
    order (doc, segment, wpos), keeping the first."""
    out, last = [], None
    for m in rows:
        k = _sort_key(m)
        if k != last:
            out.append(m)
            last = k
    return out


class Executor:
    """One query's stage graph over the (already sorted) index rows —
    the GRAPH body of doExecuteQuery (TextSearch.ecl:800-828)."""

    def __init__(self, index_rows):
        # index row: (kind, word20, doc, segment, wpos, wip, flags,
        #             original20, dpos) in BUILD key order
        self.index = index_rows

    def _read(self, n: dict, kind: int, words: set[str]):
        """doReadWord/doReadWordSet/doReadContainer (:265-330, :540-560):
        stepped index read sorted (doc, segment, wpos, wip)."""
        mask, cmpv = n["wordflagmask"], n["wordflagcompare"]
        src, seg, term = n["source"], n["segment"], n["term"]
        rows = [
            (r[2], r[3], r[4], r[5], r[8], term, ())
            for r in self.index
            if r[0] == kind
            and r[1].rstrip() in words
            and (r[6] & mask) == cmpv
            and (seg == 0 or r[3] == seg)
            and (src == 0 or (r[2] >> 48) == src)
        ]
        rows.sort(key=lambda m: (m[0], m[1], m[2], m[3]))
        return rows

    # --- n-way structural helpers -------------------------------------
    @staticmethod
    def _classes(inputs, key):
        """Group every input's rows by the stepped equality key;
        returns {key: [rows_per_input]} in sorted key order."""
        cls: dict = {}
        for i, rows in enumerate(inputs):
            for m in rows:
                cls.setdefault(key(m), [[] for _ in inputs])[i].append(m)
        return dict(sorted(cls.items()))

    def _mergejoin(self, inputs, key, how="inner", dedup=False,
                   mmin=None, mmax=None):
        """MERGEJOIN over a stepped key equality (doAndTerms /
        doAndNotTerms / doRankMergeTerms / doMofNTerms / SameContainer
        family, TextSearch.ecl:325-380, :515-535): emit the rows of the
        qualifying inputs merged in stepped order."""
        out = []
        for _k, per in self._classes(inputs, key).items():
            matched = sum(1 for rows in per if rows)
            if how == "only":
                if per[0] and matched == 1:
                    out.extend(per[0])
                continue
            if mmin is not None:
                if mmin <= matched <= (mmax or len(inputs)):
                    for rows in per:
                        out.extend(rows)
                continue
            if how == "outer":
                if per[0]:
                    if matched == len(inputs):
                        for rows in per:
                            out.extend(rows)
                    else:
                        out.extend(per[0])
                continue
            if matched == len(inputs):
                for rows in per:
                    out.extend(rows)
        out.sort(key=_sort_key)
        return _dedup_on_keys(out) if dedup else out

    @staticmethod
    def _tuples(inputs, pair_ok):
        """Matching tuples of an n-way JOIN: one row per input, same
        doc, adjacent-pair condition ``pair_ok(l, r)`` (the thorstep2
        CMergeJoinProcessor tuple enumeration)."""
        if not all(inputs):
            return
        by_doc = Executor._classes(inputs, lambda m: m[0])
        for _doc, per in by_doc.items():
            if not all(per):
                continue

            def rec(i, tup):
                if i == len(per):
                    yield tuple(tup)
                    return
                for m in per[i]:
                    if i == 0 or pair_ok(tup[-1], m):
                        tup.append(m)
                        yield from rec(i + 1, tup)
                        tup.pop()

            yield from rec(0, [])

    # --- operators -----------------------------------------------------
    def _phrase(self, n, inputs, max_sep):
        """doPhraseAnd/doPhrase1To5And (:382-460): consecutive
        positions (r.wpos == l.wpos + l.wip), first-input row carries
        the match, wip = sum of tuple wips."""
        out = []
        for tup in self._tuples(
            inputs,
            lambda l, r: l[1] == r[1]
            and l[2] + 1 <= r[2] <= l[2] + max_sep
            and r[2] == l[2] + l[3],
        ):
            l = tup[0]
            wip = sum(m[3] for m in tup)
            out.append((l[0], l[1], l[2], wip, l[4], n["term"], l[6]))
        out.sort(key=_sort_key)
        return out

    def _denorm_join(self, n, inputs, pair_ok, how="inner",
                     mmin=None, mmax=None):
        """JOIN with createDenormalizedMatch (:404-470): tuple rows
        become children; left-only/outer/mofn variants."""
        term = n["term"]

        def denorm(tup):
            l = tup[0]
            wpos = min(m[2] for m in tup)
            wend = max(m[2] + m[3] for m in tup)
            children = tuple(sorted((m[2], m[3], m[5]) for m in tup))
            return (l[0], l[1], wpos, wend - wpos, l[4], term, children)

        out = []
        if mmin is not None:
            # MofN join: classes by doc; tuples over the matching
            # inputs when the matched count is within [min, max]
            by_doc = self._classes(inputs, lambda m: m[0])
            for _doc, per in by_doc.items():
                act = [rows for rows in per if rows]
                if not (mmin <= len(act) <= (mmax or len(inputs))):
                    continue
                for tup in self._tuples(act, pair_ok):
                    out.append(denorm(tup))
            out.sort(key=_sort_key)
            return out
        matched_left = set()
        for tup in self._tuples(inputs, pair_ok):
            matched_left.add(id(tup[0]))
            if how != "only":
                out.append(denorm(tup))
        if how in ("only", "outer"):
            for l in inputs[0]:
                if id(l) not in matched_left:
                    out.append(denorm((l,)))
        out.sort(key=_sort_key)
        return out

    def _proximity(self, n, inputs, merge_mode):
        """doProximityAnd / doProximityMergeAnd (:570-660)."""
        before, after = n["mdrbl"], n["mdral"]

        def hard(l, r):
            return (
                l[0] == r[0]
                and l[1] == r[1]
                and r[2] + r[3] + before >= l[2]
                and r[2] <= l[2] + l[3] + after
            )

        def overlaps(w, c):
            return c[0] <= w <= c[0] + c[1] - 1

        def any_overlap(lc, rc):
            for a in lc:
                for b in rc:
                    if (
                        overlaps(a[0], b) or overlaps(a[0] + a[1] - 1, b)
                        or overlaps(b[0], a) or overlaps(b[0] + b[1] - 1, a)
                    ):
                        return True
            return False

        L, R = inputs
        out, keepL, keepR = [], set(), set()
        for l in L:
            lc = _children_of(l)
            for r in R:
                if not hard(l, r):
                    continue
                rc = _children_of(r)
                if any_overlap(lc, rc):
                    continue
                if merge_mode:
                    keepL.add(id(l))
                    keepR.add(id(r))
                else:
                    wpos = min(l[2], r[2])
                    wend = max(l[2] + l[3], r[2] + r[3])
                    out.append(
                        (l[0], l[1], wpos, wend - wpos, l[4], n["term"],
                         _merge_children(lc, rc))
                    )
        if merge_mode:
            out = [m for m in L if id(m) in keepL] + [
                m for m in R if id(m) in keepR
            ]
        out.sort(key=_sort_key)
        return out

    def _overlap(self, n, inputs):
        """doOverlapProximityAnd (:700-740)."""
        L, R = inputs
        out = []
        for l in L:
            for r in R:
                if (
                    l[0] == r[0] and l[1] == r[1]
                    and r[2] + r[3] >= l[2] and r[2] <= l[2] + l[3]
                ):
                    wpos = min(l[2], r[2])
                    wend = max(l[2] + l[3], r[2] + r[3])
                    out.append(
                        (l[0], l[1], wpos, wend - wpos, l[4], n["term"],
                         _merge_children(
                             _children_of(l), _children_of(r)))
                    )
        out.sort(key=_sort_key)
        return out

    def _butnot(self, n, inputs):
        """doButNotTerms/doButNotJoinTerms (:345-365): left rows not
        positionally contained in any right row."""
        L, R = inputs
        out = [
            l
            for l in L
            if not any(
                l[0] == r[0] and l[1] == r[1]
                and r[2] <= l[2] <= r[2] + r[3]
                for r in R
            )
        ]
        return out

    def _tag_contains(self, n, inp, negate=False):
        """doTagContainsTerm / doTagNotContainsTerm (:600-650):
        term-inside-container join against an OpenTag index read."""
        containers = self._read(n, _K_OPEN, {n["word"]})
        if negate:
            out = [
                t
                for t in inp
                if not any(
                    t[0] == c[0] and t[1] == c[1]
                    and t[2] >= c[2] and t[2] + t[3] <= c[2] + c[3]
                    for c in containers
                )
            ]
            return out
        out = []
        for c in containers:
            centry = (c[2], c[3], c[5])
            for t in inp:
                if (
                    t[0] == c[0] and t[1] == c[1]
                    and t[2] >= c[2] and t[2] + t[3] <= c[2] + c[3]
                ):
                    out.append(
                        (c[0], c[1], c[2], c[3], c[4], n["term"],
                         _merge_children((centry,), _children_of(t)))
                    )
        out.sort(key=_sort_key)
        return out

    @staticmethod
    def _rollup_container(n, inp):
        """rollupContainerContents (:565-585): rollup by (doc, segment,
        wpos), children merged + deduped."""
        out = []
        for m in inp:
            if out and _sort_key(out[-1]) == _sort_key(m):
                prev = out[-1]
                out[-1] = prev[:5] + (
                    n["term"], _merge_children(prev[6], m[6]),
                )
            else:
                out.append(m[:5] + (n["term"], m[6]))
        return out

    def run(self, stages: list[dict]) -> list:
        results: dict[int, list] = {}
        last: list = []
        for n in stages:
            inputs = [results[s] for s in n["inputs"]]
            a = n["action"]
            if a == A_READWORD:
                r = self._read(n, _K_TEXT, {n["word"]})
            elif a == A_READWORDSET:
                r = self._read(n, _K_TEXT, set(n["words"]))
            elif a == A_ORTERMS:
                merged = []
                for i, rows in enumerate(inputs):
                    merged += [(m, i) for m in rows]
                merged.sort(key=lambda t: (_sort_key(t[0]), t[1]))
                r = _dedup_on_keys([m for m, _ in merged])
            elif a == A_ANDTERMS:
                r = self._mergejoin(
                    inputs, lambda m: m[0], dedup=True
                )
            elif a == A_ANDNOTTERMS:
                r = self._mergejoin(inputs, lambda m: m[0], how="only")
            elif a == A_RANKMERGETERMS:
                r = self._mergejoin(inputs, lambda m: m[0], how="outer")
            elif a == A_MOFNTERMS:
                r = self._mergejoin(
                    inputs, lambda m: m[0], dedup=True,
                    mmin=n["minmatches"], mmax=n["maxmatches"],
                )
            elif a == A_PHRASEAND:
                r = self._phrase(n, inputs, n["maxwipleft"])
            elif a == A_PHRASE1TO5AND:
                r = self._phrase(n, inputs, 5)
            elif a == A_PROXIMITYAND:
                r = self._proximity(n, inputs, merge_mode=False)
            elif a == A_PROXIMITYMERGEAND:
                r = self._proximity(n, inputs, merge_mode=True)
            elif a == A_OVERLAPPROXIMITYAND:
                r = self._overlap(n, inputs)
            elif a == A_ANDJOINTERMS:
                r = self._denorm_join(
                    n, inputs, lambda l, r_: l[2] != r_[2]
                )
            elif a == A_ANDNOTJOINTERMS:
                r = self._denorm_join(
                    n, inputs, lambda l, r_: True, how="only"
                )
            elif a == A_RANKJOINTERMS:
                r = self._denorm_join(
                    n, inputs, lambda l, r_: True, how="outer"
                )
            elif a == A_MOFNJOINTERMS:
                r = self._denorm_join(
                    n, inputs, lambda l, r_: True,
                    mmin=n["minmatches"], mmax=n["maxmatches"],
                )
            elif a == A_BUTNOTTERMS or a == A_BUTNOTJOINTERMS:
                r = self._butnot(n, inputs)
            elif a == A_GLOBALATLEAST:
                cnt: dict = {}
                for m in inputs[0]:
                    cnt[m[0]] = cnt.get(m[0], 0) + 1
                r = [m for m in inputs[0] if cnt[m[0]] >= n["minmatches"]]
            elif a == A_CONTAINEDATLEAST:
                ts = set(n["terms"])
                r = [
                    m
                    for m in inputs[0]
                    if sum(1 for c in m[6] if c[2] in ts)
                    >= n["minmatches"]
                ]
            elif a == A_TAGCONTAINSTERM:
                r = self._tag_contains(n, inputs[0])
            elif a == A_TAGCONTAINSSEARCH:
                r = self._rollup_container(
                    n, self._tag_contains(n, inputs[0])
                )
            elif a == A_TAGNOTCONTAINSTERM:
                r = self._tag_contains(n, inputs[0], negate=True)
            elif a in (A_SAMECONTAINER, A_NOTSAMECONTAINER,
                       A_MOFNCONTAINER):
                key = lambda m: (m[0], m[1], m[2], m[3])  # noqa: E731
                if a == A_SAMECONTAINER:
                    r = self._mergejoin(inputs, key)
                elif a == A_NOTSAMECONTAINER:
                    r = self._mergejoin(inputs, key, how="only")
                else:
                    r = self._mergejoin(
                        inputs, key, mmin=n["minmatches"],
                        mmax=n["maxmatches"],
                    )
            elif a == A_ROLLUPCONTAINER:
                r = self._rollup_container(n, inputs[0])
            elif a == A_ROLLUPBYDOCUMENT:
                r = []
                for m in inputs[0]:
                    if not r or r[-1][0] != m[0]:
                        r.append((m[0], 0, 0, 0, m[4], n["term"], m[6]))
            elif a == A_NORMALIZEMATCH:
                by_group: dict = {}
                order: list = []
                for m in inputs[0]:
                    kids = m[6] if m[6] else ((m[2], m[3], m[5]),)
                    g = (m[0], m[1])
                    if g not in by_group:
                        by_group[g] = []
                        order.append(g)
                    for c in kids:
                        by_group[g].append(
                            (m[0], m[1], c[0], c[1], m[4], n["term"], ())
                        )
                r = []
                for g in order:
                    rows = sorted(by_group[g], key=lambda m: (m[2], m[3]))
                    seen = None
                    for m in rows:
                        if (m[2], m[3]) != seen:
                            r.append(m)
                            seen = (m[2], m[3])
            elif a == A_POSITIONFILTER:
                r = [m for m in inputs[0] if m[2] == n["seekwpos"]]
            elif a == A_POSITIONNOTFILTER:
                r = [m for m in inputs[0] if m[2] != n["seekwpos"]]
            elif a == A_CHOOSERANGE:
                lo, hi = n["minmatches"], n["maxmatches"]
                r = inputs[0][lo - 1: hi]
            else:
                r = []
            results[n["stage"]] = r
            last = r
        return last


def user_output(matches: list) -> list[tuple]:
    """convertToUserOutput (TextSearch.ecl:848-862):
    (source, subdoc, wpos, wip, line, column, words)."""
    return [
        (
            m[0] >> 48,
            m[0] & 0xFFFFFFFFFFFF,
            m[2],
            m[3],
            m[4] // MAX_COLUMNS_PER_LINE,
            m[4] % MAX_COLUMNS_PER_LINE,
            [list(c) for c in m[6]],
        )
        for m in matches[:MAX_RESULTS]
    ]


def request_rows(stages: list[dict]) -> list[tuple]:
    """The processed searchRecord rows in output field order
    (TextSearch.ecl searchRecord :131-163; word/words are string20)."""
    return [
        (
            n["stage"], n["term"], n["action"],
            [[s] for s in n["inputs"]],
            n["maxwip"], n["maxwipchild"], n["maxwipleft"],
            n["maxwipright"],
            n["word"].ljust(20),
            [[w.ljust(20)] for w in n["words"]],
            n["wordflagmask"], n["wordflagcompare"], n["source"],
            n["segment"], n["seekwpos"], n["priority"],
            n["mdrbl"], n["mdral"], n["minmatches"], n["maxmatches"],
            [[t] for t in n["terms"]],
        )
        for n in stages
    ]


def batch_execute(queries: list[str], index_rows) -> list[tuple]:
    """doBatchExecute over a list of query strings → rows of
    (query, request, result) (TextSearch.ecl:1838-1843)."""
    out = []
    ex = Executor(index_rows)
    for q in queries:
        stages = compile_query(q)
        out.append((q, request_rows(stages), user_output(ex.run(stages))))
    return out


@lru_cache(maxsize=1)
def _output_schema():
    from pyspark.sql import types as T

    stage_ref = T.StructType([T.StructField("stage", T.LongType())])
    word_row = T.StructType([T.StructField("word", T.StringType())])
    term_row = T.StructType([T.StructField("term", T.LongType())])
    search = T.StructType(
        [
            T.StructField("stage", T.LongType()),
            T.StructField("term", T.LongType()),
            T.StructField("action", T.LongType()),
            T.StructField("inputs", T.ArrayType(stage_ref)),
            T.StructField("maxwip", T.LongType()),
            T.StructField("maxwipchild", T.LongType()),
            T.StructField("maxwipleft", T.LongType()),
            T.StructField("maxwipright", T.LongType()),
            T.StructField("word", T.StringType()),
            T.StructField("words", T.ArrayType(word_row)),
            T.StructField("wordflagmask", T.LongType()),
            T.StructField("wordflagcompare", T.LongType()),
            T.StructField("source", T.LongType()),
            T.StructField("segment", T.LongType()),
            T.StructField("seekwpos", T.LongType()),
            T.StructField("priority", T.LongType()),
            T.StructField("maxdistancerightbeforeleft", T.LongType()),
            T.StructField("maxdistancerightafterleft", T.LongType()),
            T.StructField("minmatches", T.LongType()),
            T.StructField("maxmatches", T.LongType()),
            T.StructField("termstoprocess", T.ArrayType(term_row)),
        ]
    )
    child = T.StructType(
        [
            T.StructField("wpos", T.LongType()),
            T.StructField("wip", T.LongType()),
            T.StructField("term", T.LongType()),
        ]
    )
    result = T.StructType(
        [
            T.StructField("source", T.LongType()),
            T.StructField("subdoc", T.LongType()),
            T.StructField("wpos", T.LongType()),
            T.StructField("wip", T.LongType()),
            T.StructField("line", T.LongType()),
            T.StructField("column", T.LongType()),
            T.StructField("words", T.ArrayType(child)),
        ]
    )
    return T.StructType(
        [
            T.StructField("query", T.StringType()),
            T.StructField("request", T.ArrayType(search)),
            T.StructField("result", T.ArrayType(result)),
        ]
    )


def batch_execute_df(queries_df, index_rows):
    """Spark front: one output row per query row, computed
    executor-side via mapInPandas with the (small, fixture-built) index
    broadcast — queries scale out, the index rides along like any
    broadcast dim."""
    import pandas as pd

    spark = queries_df.sparkSession
    qcol = next(c for c in queries_df.columns if c != "__ord__")
    has_ord = "__ord__" in queries_df.columns
    bidx = spark.sparkContext.broadcast(tuple(index_rows))

    def gen(batches):
        ex = Executor(bidx.value)
        for pdf in batches:
            rows = []
            ords = pdf["__ord__"].tolist() if has_ord else None
            for ri, q in enumerate(pdf[qcol].tolist()):
                stages = compile_query(q)
                req = [
                    {
                        "stage": r[0], "term": r[1], "action": r[2],
                        "inputs": [{"stage": s[0]} for s in r[3]],
                        "maxwip": r[4], "maxwipchild": r[5],
                        "maxwipleft": r[6], "maxwipright": r[7],
                        "word": r[8],
                        "words": [{"word": w[0]} for w in r[9]],
                        "wordflagmask": r[10], "wordflagcompare": r[11],
                        "source": r[12], "segment": r[13],
                        "seekwpos": r[14], "priority": r[15],
                        "maxdistancerightbeforeleft": r[16],
                        "maxdistancerightafterleft": r[17],
                        "minmatches": r[18], "maxmatches": r[19],
                        "termstoprocess": [{"term": t[0]} for t in r[20]],
                    }
                    for r in request_rows(stages)
                ]
                res = [
                    {
                        "source": u[0], "subdoc": u[1], "wpos": u[2],
                        "wip": u[3], "line": u[4], "column": u[5],
                        "words": [
                            {"wpos": c[0], "wip": c[1], "term": c[2]}
                            for c in u[6]
                        ],
                    }
                    for u in user_output(ex.run(stages))
                ]
                row = {"query": q, "request": req, "result": res}
                if has_ord:
                    row["__ord__"] = ords[ri]
                rows.append(row)
            cols = ["query", "request", "result"] + (
                ["__ord__"] if has_ord else []
            )
            yield pd.DataFrame(rows, columns=cols)

    schema = _output_schema()
    if has_ord:
        from pyspark.sql import types as T

        schema = T.StructType(
            schema.fields + [T.StructField("__ord__", T.LongType())]
        )
    return queries_df.mapInPandas(gen, schema=schema)
