"""PARSE tier 3 — the ECL PATTERN/TOKEN/RULE matcher (SURVEY.md §2.10).

Reference: ECL's pattern-mode PARSE engine (common/thorhelper/
thorregex.cpp regex activities, ecl/hqlcpp/hqlregex.cpp pattern codegen;
testing/regress/ecl/pat*.ecl pin the observable contract).  The engine
enumerates EVERY parse of a pattern at a text position — alternatives in
written order, repeats maximal-first (minimal-first under REPEAT(..,MIN))
— and PARSE's SCAN/NOSCAN/SCAN ALL options pick the attempt positions:

- NOSCAN (default): all parses at the FIRST position that matches;
- SCAN: after a match, recommence at the end of the first parse;
- SCAN ALL: collect parses at every position.

Duplicate emitted rows within one position's enumeration collapse (the
reference's packed parse forest shows one row per distinct result, see
pat2.ecl Result 7 vs patmin.ecl), which the caller implements by
evaluating its result record per parse tree and deduplicating values.

Spark-first: the enumerator is pure Python over one row's text, shipped
executor-side inside ``mapInPandas`` by the ECL front door — map-only,
parallel over partitions, no shuffle.  Work is cap-guarded (text length,
backtracking steps); ``operators/parse.py`` (regex tier) and
``operators/grammar.py`` (Earley tier) are the scale paths for large
corpora.

AST nodes are plain tuples (picklable for closure shipping):

  ("lit", s)                 quoted string
  ("regex", rx)              PATTERN('...') regex source
  ("any",)                   ANY single character
  ("first",) / ("last",)     text anchors
  ("seq", (n1, n2, ...))     juxtaposition
  ("alt", (n1, n2, ...))     a | b  /  a OR b  /  ['x','y'] literal sets
  ("rep", n, lo, hi, min)    REPEAT / opt / * + ?  (hi None = unbounded,
                             min True = minimal-first enumeration)
  ("named", name, n, kind)   a PATTERN/TOKEN/RULE definition
  ("ref", name)              use of a named definition (lazy; recursion
                             curtailed on same-position re-entry)
  ("nocase", n)              case-insensitive region
  ("check", n, c)            n IN c — n's matched text must fully match c
"""

from __future__ import annotations

import re
from collections.abc import Iterator

TEXT_CAP = 100_000
STEP_CAP = 20_000_000

# POSIX character classes → Python re equivalents (PATTERN('[[:digit:]]'))
_POSIX = {
    "[:alpha:]": "a-zA-Z",
    "[:digit:]": "0-9",
    "[:alnum:]": "a-zA-Z0-9",
    "[:space:]": r" \t\r\n\f\v",
    "[:upper:]": "A-Z",
    "[:lower:]": "a-z",
    "[:punct:]": r"!-/:-@\[-`{-~",
}

_RX_CACHE: dict[tuple[str, bool], re.Pattern] = {}


def _rx(src: str, ci: bool) -> re.Pattern:
    key = (src, ci)
    rx = _RX_CACHE.get(key)
    if rx is None:
        s = src
        for posix, py in _POSIX.items():
            s = s.replace(posix, py)
        rx = re.compile(s, (re.IGNORECASE | re.DOTALL) if ci else re.DOTALL)
        _RX_CACHE[key] = rx
    return rx


class PatternBudget(RuntimeError):
    """Raised when one row's enumeration exceeds the step/size caps."""


def _extent(children: tuple, pos: int, e: int) -> tuple:
    """Content (start, end) of a sub-match: the first real record's
    start (separator pseudo-records excluded) and the separator-trimmed
    end — what CHECK/VALIDATE/LENGTH constraints apply to."""
    ts = next(
        (r[1] for r in children if not r[0].startswith("__")), pos
    )
    return ts, _content_end(children, e)


def _content_start(children: tuple, pos: int) -> int:
    """Content start of a match: advance over the LEADING separator
    chain only — a rule whose first token skipped a separator starts
    AT the token (dpat2's MATCHTEXT(NounPhrase[2]) must not absorb the
    gap), but unrecorded pattern elements (pat2b's repeat(any)) keep
    the rule's own start."""
    starts: dict = {}

    def w(recs):
        for nm, s, e, cs in recs:
            if nm == "__sep__" and e > s:
                starts[s] = max(starts.get(s, e), e)
            w(cs)

    w(children)
    while pos in starts:
        pos = starts[pos]
    return pos


def _content_end(children: tuple, e: int) -> int:
    """Content end of a match: the consumed end minus any trailing
    separator chain.  Separator consumption is recorded as ``__sep__``
    pseudo-records; a separator ending exactly at the consumed end is
    trailing and trims off (repeatedly, for nested tokens)."""
    ends: dict = {}

    def w(recs):
        for nm, s, ee, cs in recs:
            if nm == "__sep__" and ee != s:
                ends[ee] = min(ends.get(ee, s), s)
            w(cs)

    w(children)
    while e in ends:
        e = ends[e]
    return e


class Matcher:
    """Backtracking enumerator over one text. ``enum(node, pos)`` yields
    ``(end, children)`` pairs in the reference's emission order;
    ``children`` is a tuple of match records ``(name, start, end,
    children)`` for named sub-patterns, document order."""

    def __init__(self, defs, text, nocase=False, skip=None):
        if len(text) > TEXT_CAP:
            raise PatternBudget(
                f"PARSE pattern enumeration over a {len(text):,}-char text "
                f"exceeds the {TEXT_CAP:,}-char cap; use operators/parse.py "
                "(regex tier) or operators/grammar.py (Earley tier) for "
                "long documents"
            )
        self.defs = defs
        self.text = text
        self.nocase = nocase
        self.skip = skip
        self.steps = 0
        self._active: dict[tuple[str, int], int] = {}
        # open regex-leaf generators on the current backtrack path;
        # a completed parse marks them committed (greedy length cut)
        self._rx_open: list = []

    def commit_regexes(self):
        """Called by the driver when a complete parse is reported: every
        open regex leaf participated in it, so none of them offers a
        shorter-than-chosen match afterwards (the reference's regex
        leaves are maximal-munch with failure-driven backtracking only —
        dpat3 reports namet "Hamor", never "Hamo")."""
        for flag in self._rx_open:
            flag[0] = True

    def _tick(self):
        self.steps += 1
        if self.steps > STEP_CAP:
            raise PatternBudget(
                f"PARSE pattern enumeration exceeded {STEP_CAP:,} "
                "backtracking steps on one row; simplify the pattern or "
                "use the operators/parse.py / grammar.py combinators"
            )

    def _skip_end(self, pos: int) -> int:
        """Greedy single-choice skip between elements (SKIP(pattern))."""
        it = self.enum(self.skip, pos, False)
        try:
            e, _ = next(it)
        except StopIteration:
            return pos
        finally:
            it.close()
        return e

    def enum(self, node, pos: int, ci: bool = False, ir: bool = False) -> Iterator:
        """``ir`` marks rule scope: bare literals/regexes inside a RULE
        are implicit tokens, so the separator skip applies before them
        (tomita-mode tokenization; parse.ecl's '(' use(E) ')')."""
        self._tick()
        text = self.text
        kind = node[0]
        ci = ci or self.nocase
        if kind == "lit":
            s = node[1]
            pos0 = pos
            if ir and self.skip is not None and len(s) > 0:
                # separators skip BEFORE tokens (hqlregex.cpp
                # insertSeparators with scan-side skipping — tpat5's
                # empty afterId pins position 4: NO trailing
                # consumption, and beforeId pins 7: pre-token skip)
                pos = self._skip_end(pos)
            e = pos + len(s)
            seg = text[pos:e]
            if seg == s or (ci and seg.lower() == s.lower()):
                if ir:
                    rec = (("__t__", pos, e, ()),)
                    if pos > pos0:
                        rec = (("__sep__", pos0, pos, ()),) + rec
                    yield (e, rec)
                else:
                    yield (e, ())
        elif kind == "regex":
            rx = _rx(node[1], ci)
            pos0 = pos
            if ir and self.skip is not None:
                pos2 = self._skip_end(pos)
                # zero-width regexes bind tight (tpat5's pattern('')):
                # only skip when the token actually consumes here
                if pos2 > pos and rx.match(text, pos2) is not None and (
                    rx.match(text, pos2).end() > pos2
                ):
                    pos = pos2
            m = rx.match(text, pos)
            if m is not None:
                greedy = m.end()
                if ir:
                    # rule scope: implicit token — maximal munch only;
                    # separators skip BEFORE tokens (see the lit arm)
                    rec = (("__t__", pos, greedy, ()),)
                    if pos > pos0:
                        rec = (("__sep__", pos0, pos, ()),) + rec
                    yield (greedy, rec)
                else:
                    flag = [False]
                    self._rx_open.append(flag)
                    try:
                        yield (greedy, ())
                        # pattern scope backtracks into shorter matches
                        # — unless the greedy choice already closed a
                        # complete parse (failure-driven only)
                        for e in range(greedy - 1, pos - 1, -1):
                            if flag[0]:
                                break
                            self._tick()
                            if rx.fullmatch(text, pos, e):
                                yield (e, ())
                                if flag[0]:
                                    break
                    finally:
                        # identity removal: flags compare equal by value
                        for i in range(len(self._rx_open) - 1, -1, -1):
                            if self._rx_open[i] is flag:
                                del self._rx_open[i]
                                break
        elif kind == "any":
            if pos < len(text):
                yield (pos + 1, ())
        elif kind == "first":
            if pos == 0:
                # anchor hit recorded: parses that differ only in how
                # they reached an end (consumed terminator vs LAST
                # assertion) are DISTINCT matches (pat4.ecl Result 3)
                yield (pos, (("__anchor_first__", pos, pos, ()),))
        elif kind == "last":
            if pos == len(text):
                yield (pos, (("__anchor_last__", pos, pos, ()),))
        elif kind == "seq":
            yield from self._seq(node[1], 0, pos, ci, ir)
        elif kind == "alt":
            for a in node[1]:
                yield from self.enum(a, pos, ci, ir)
        elif kind == "rep":
            _, inner, lo, hi, minimal = node
            yield from self._rep(inner, lo, hi, minimal, pos, 0, ci, ir)
        elif kind == "named":
            _, name, inner, dkind = node
            if dkind == "pattern" and ir:
                # a PATTERN referenced from rule scope is an implicit
                # token (hqlregex no_pat_imptoken): maximal munch —
                # dpat3's namet reports 'Hamor the Hivite', never the
                # shorter opt-less 'Hamor' (contrast dpat1's rule form)
                dkind = "token"
            if dkind == "token":
                pos0_t = pos
                if self.skip is not None:
                    pos2_t = self._skip_end(pos)
                    if pos2_t > pos:
                        pos = pos2_t
                # a TOKEN is a lexical unit: maximal munch, no
                # backtracking into shorter matches (pat5.ecl: patWord
                # lexes 'gavinxxx' whole, so `noun IN target` fails).
                # The record extent is the CONTENT extent; the trailing
                # separator (SKIP pattern — the reference inserts them
                # after endtoken, hqlregex.cpp insertSeparators) is
                # consumed but excluded, so MATCHTEXT/MATCHPOSITION
                # read the token text alone and a leading separator is
                # never absorbed into the match (dpat2's 'God')
                best = None
                for e, c in self.enum(inner, pos, ci, False):
                    self._tick()
                    te = _content_end(c, e)
                    if best is None or te > best[0]:
                        best = (te, e, c)
                if best is not None:
                    te, e, c = best
                    rec_t = ((name, pos, te, c),)
                    if pos > pos0_t:
                        rec_t = (
                            ("__sep__", pos0_t, pos, ()),
                        ) + rec_t
                    yield (max(e, te), rec_t)
            elif dkind == "rule":
                for e, c in self.enum(inner, pos, ci, True):
                    yield (
                        e,
                        (
                            (
                                name,
                                _content_start(c, pos),
                                _content_end(c, e),
                                c,
                            ),
                        ),
                    )
            else:
                for e, c in self.enum(inner, pos, ci, False):
                    yield (e, ((name, pos, e, c),))
        elif kind == "ref":
            name = node[1]
            target = self.defs.get(name)
            if target is None:
                raise KeyError(f"undefined pattern {name!r}")
            key = (name, pos)
            # bounded re-entry: a (name, pos) may be open several times
            # at once — suspended sibling generators in one seq chain
            # legitimately share a position (dpat4's trailing ws) — but
            # unbounded same-position re-entry is left recursion, which
            # this backtracking engine curtails at a fixed depth (the
            # reference's Tomita engine handles it natively; parse.ecl
            # style grammars nest correctly up to the cap)
            n_open = self._active.get(key, 0)
            if n_open >= 8:
                return
            self._active[key] = n_open + 1
            try:
                yield from self.enum(target, pos, ci, ir)
            finally:
                c = self._active.get(key, 1) - 1
                if c:
                    self._active[key] = c
                else:
                    del self._active[key]
        elif kind == "nocase":
            yield from self.enum(node[1], pos, True, ir)
        elif kind == "penalty":
            _, inner, pen = node
            mark = ((f"__penalty_{pen}__", pos, pos, ()),)
            for e, c in self.enum(inner, pos, ci, ir):
                yield (e, mark + c)
        elif kind == "assert":
            _, inner, direction, q, neg = node
            for e, c in self.enum(inner, pos, ci, ir):
                ts, te = _extent(c, pos, e)
                hit = False
                if direction == "after":
                    # lookbehind: q ends exactly where the match starts
                    for j in range(max(0, ts - 64), ts):
                        for qe, _qc in self.enum(q, j, ci):
                            self._tick()
                            if qe == ts:
                                hit = True
                                break
                        if hit:
                            break
                else:  # before: lookahead from the match end
                    for _qe, _qc in self.enum(q, te, ci):
                        hit = True
                        break
                if hit != neg:
                    yield (e, c)
        elif kind == "validate":
            _, inner, cond = node
            for e, c in self.enum(inner, pos, ci, ir):
                ts, te = _extent(c, pos, e)
                if cond(self.text[ts:te], ci or self.nocase):
                    yield (e, c)
        elif kind == "len":
            _, inner, lo, hi = node
            for e, c in self.enum(inner, pos, ci, ir):
                ts, te = _extent(c, pos, e)
                ln = te - ts
                if ln >= lo and (hi is None or ln <= hi):
                    yield (e, c)
        elif kind == "check":
            _, inner, constraint = node
            for e, c in self.enum(inner, pos, ci, ir):
                # the constraint must match the TOKEN's own text — the
                # record extent, excluding any leading separator — and
                # runs without separator skipping itself (pat5.ecl noun
                # IN pronoun over skip([' ',...]))
                ts, te = _extent(c, pos, e)
                ok = False
                saved_skip, self.skip = self.skip, None
                try:
                    cit = self.enum(constraint, ts, ci)
                    for ce, _cc in cit:
                        self._tick()
                        if ce == te:
                            ok = True
                            break
                    cit.close()
                finally:
                    self.skip = saved_skip
                if ok:
                    yield (e, c)
        else:  # pragma: no cover
            raise ValueError(f"unknown pattern node {kind!r}")

    def _seq(self, nodes, idx: int, pos: int, ci: bool, ir: bool) -> Iterator:
        if idx == len(nodes):
            yield (pos, ())
            return
        for e, c in self.enum(nodes[idx], pos, ci, ir):
            for e2, c2 in self._seq(nodes, idx + 1, e, ci, ir):
                yield (e2, c + c2)

    def _rep(self, node, lo, hi, minimal, pos, count, ci, ir: bool) -> Iterator:
        self._tick()
        if minimal and count >= lo:
            yield (pos, ())
        if hi is None or count < hi:
            for e, c in self.enum(node, pos, ci, ir):
                if e == pos and hi is None:
                    continue  # zero-width element in unbounded repeat
                for e2, c2 in self._rep(
                    node, lo, hi, minimal, e, count + 1, ci, ir
                ):
                    yield (e2, c + c2)
        if not minimal and count >= lo:
            yield (pos, ())


def run_parse(
    defs: dict,
    root,
    text: str,
    *,
    nocase: bool = False,
    skip=None,
    scan: str = "noscan",
    want: str = "all",
    whole: bool = False,
    asc: bool = False,
    best: bool = False,
    choose: str | None = None,
    many: bool = False,
    max_len: int | None = None,
) -> list[list[tuple[int, int, tuple]]]:
    """Enumerate matches of ``root`` over ``text`` under PARSE's scan
    semantics.  Returns GROUPS of matches — one group per collection
    event (attempt position); each match is ``(start, end, children)``.
    The caller evaluates its result record per match and deduplicates
    emitted rows WITHIN each group (reference parse-forest contract)."""
    m = Matcher(defs, text, nocase=nocase, skip=skip)
    n = len(text)

    def at(p: int) -> list:
        out = []
        it = m.enum(root, p)
        for e, c in it:
            m.commit_regexes()
            if max_len is not None and e - p > max_len:
                # MAXLENGTH(n): the match buffer caps at n chars
                continue
            if asc and e == p:
                # tomita mode: tokens consume — no zero-width match
                # (tpat4's empty input emits nothing)
                continue
            if whole:
                # trailing separator text may follow the last token
                ee = e
                if ee != n and skip is not None:
                    ee = m._skip_end(ee)
                if not (p == 0 and ee == n):
                    continue
            out.append((p, e, c))
            if want == "first":
                break
            if len(out) > 50_000:
                it.close()
                raise PatternBudget(
                    "PARSE enumerated >50,000 parses at one position; "
                    "the pattern is pathologically ambiguous"
                )
        it.close()
        return out

    def _score(children):
        s = 0

        def w(recs):
            nonlocal s
            for nm, _s, _e, cs in recs:
                if nm.startswith("__penalty_"):
                    s -= int(nm[10:-2])
                w(cs)

        w(children)
        return s

    def emit(g):
        if best or choose:
            # BEST/MAX/MIN keep one match per position: longest (MAX) /
            # shortest (MIN) extent, penalty-adjusted score breaks ties
            # (dpat2; thorrparse onMatch chooseMin/chooseMax/chooseBest)
            def rank(mch):
                ln = mch[1] - mch[0]
                if choose == "max":
                    ext = ln
                elif choose == "min":
                    ext = -ln
                else:
                    ext = 0
                return (ext, _score(mch[2]))

            g = [max(g, key=rank)]
        # tomita mode ('parse' option) reports matches shortest-first
        # at each position (parse.ecl Result 2); regex mode preserves
        # enumeration order
        groups.append(sorted(g, key=lambda x: x[1]) if asc else g)
        return g

    groups: list[list] = []
    if whole:
        g = at(0)
        if g:
            emit(g)
    elif scan == "noscan":
        for p in range(n + 1):
            g = at(p)
            if g:
                emit(g)
                break
    elif scan == "scan":
        p = 0
        last_try = -1
        while p <= n:
            # the scanner skips separators before each attempt, so a
            # rule OPENING with a zero-width pattern anchors after the
            # gap (tpat5's beforeId at 7, not 6)
            pe = m._skip_end(p) if skip is not None else p
            if pe == last_try:
                p += 1
                continue
            last_try = pe
            g = at(pe)
            if not g:
                p += 1
                continue
            g2 = emit(g)
            # SCAN recommences at the earliest end of this position's
            # KEPT matches (reference nextScanPosition = min end,
            # onMatch; with MANY MAX the kept match is the longest, so
            # the scan resumes past it — tpat1's LongestManyNoOverlap
            # keeps 'Florida Marlins' then resumes at 'After')
            p = max(min(e for _s, e, _c in g2), pe + 1)
    elif scan == "scanall":
        if asc:
            # tomita mode lexes the input once: matches start only at
            # token boundaries (parse.ecl Result 2 — no mid-token 'bc')
            positions = _token_starts(m, defs, root, n)
        else:
            positions = range(n + 1)
        for p in positions:
            g = at(p)
            if g:
                emit(g)
    else:  # pragma: no cover
        raise ValueError(f"unknown scan mode {scan!r}")
    if choose and not many and groups:
        # MAX/MIN without MANY keep ONE match for the whole row — the
        # globally longest/shortest, earliest on ties (tpat1's
        # LongestMatch: one 'Bicentennial Park' row per document)
        allm = [mch for g0 in groups for mch in g0]

        def _grank(mch):
            ln = mch[1] - mch[0]
            return (
                ln if choose == "max" else -ln,
                -mch[0],
                _score(mch[2]),
            )

        groups = [[max(allm, key=_grank)]]
    return groups


def _token_starts(m: Matcher, defs: dict, root, n: int) -> list:
    """Greedy-lex the text with the grammar's terminal inventory to find
    token start positions — tomita-mode SCAN ALL attempts matches only
    at these boundaries (thortparse lexes once per scan line)."""
    terms: list = []
    seen: set = set()

    def walk(node):
        k = node[0]
        if k in ("lit", "regex"):
            terms.append(node)
        elif k in ("seq", "alt"):
            for x in node[1]:
                walk(x)
        elif k == "rep":
            walk(node[1])
        elif k == "named":
            if node[3] == "token":
                # a NAMED TOKEN is an atomic lexeme: the lexer munches
                # it maximally and never offers boundaries inside it
                # (tpat1's scan-all must not match 'IAMI' inside the
                # 'MIAMI' token)
                terms.append(node)
            else:
                walk(node[2])
        elif k in ("nocase", "check", "validate", "len"):
            walk(node[1])
        elif k == "ref":
            if node[1] not in seen:
                seen.add(node[1])
                t = defs.get(node[1])
                if t is not None:
                    walk(t)

    walk(root)
    if not terms:
        return list(range(n + 1))
    starts: list = []
    p = 0
    while p <= n:
        p2 = m._skip_end(p) if m.skip is not None else p
        if p2 > n or (starts and p2 == starts[-1]):
            break
        starts.append(p2)
        best = p2
        for t in terms:
            it = m.enum(t, p2, False)
            try:
                e, _ = next(it)  # greedy first yield = maximal munch
            except StopIteration:
                continue
            finally:
                it.close()
            if e > best:
                best = e
        p = best if best > p2 else p2 + 1
    return starts


def tree_key(children: tuple, referenced: frozenset, kinds: dict) -> tuple:
    """Canonical identity of one parse for duplicate collapsing: the
    (name, start, end) records of TOKEN/RULE matches (always structural
    — pat2b.ecl Result 7 keeps all 99), result-referenced PATTERN
    matches (patmin.ecl), and anchor hits, in document order.  Parses
    identical under this key merge — the reference's DFA conversion
    collapses unreferenced charclass-pattern ambiguity (pat2.ecl Result
    7 = 36 distinct extents) while assertion paths stay distinct
    (pat4.ecl Result 3)."""
    out: list = []

    def walk(recs):
        for nm, s, e, cs in recs:
            if (
                nm in referenced
                or nm.startswith("__anchor")
                or kinds.get(nm) in ("token", "rule")
            ):
                out.append((nm, s, e))
            walk(cs)

    walk(children)
    return tuple(out)


def find_path(children: tuple, path: list) -> tuple | None:
    """Resolve a MATCHTEXT-style path (``a[3]/word[1]``) against a parse
    tree.  ``path`` is a list of ``(name, index_or_None)``; each
    component selects matching descendants (any depth, document order)
    of the current node set, then applies its 1-based index.  A missing
    index keeps all instances for intermediate components and means
    "first" for the final one (pat19.ecl pins the contract: ``e/a[2]``
    is the 2nd instance of the PATH, not index-within-first-e)."""

    def descendants(recs: tuple, name: str, acc: list) -> None:
        for r in recs:
            if r[0] == name:
                acc.append(r)
            descendants(r[3], name, acc)

    cur = [("", 0, 0, children)]
    for i, (name, idx) in enumerate(path):
        found: list = []
        for node in cur:
            descendants(node[3], name, found)
        last = i == len(path) - 1
        if idx is None and not last:
            cur = found
        else:
            j = (idx or 1) - 1
            cur = [found[j]] if j < len(found) else []
        if not cur:
            return None
    return cur[0]


def _tree_skip(nm: str) -> bool:
    return nm == "__sep__" or nm.startswith(("__anchor", "__penalty"))


def parse_tree_str(
    text: str, children: tuple, kinds: dict, tomita: bool, tracked=frozenset()
) -> str:
    """The parselib default parse-tree rendering: ``name[child ...]``
    with unnamed terminals as quoted text (plugins/parselib
    getDefaultParseTree; tpat2.ecl pins the format).  Walker contract
    pinned by dpat1/dpat3: rule-scope instances always appear; inside
    token content (explicit tokens, or patterns referenced from rule
    scope — implicit tokens) only ``tracked`` names (result-referenced
    or MATCHED()-listed) appear; bare terminals render in tomita mode
    only; the match root is unnamed in regex mode."""

    def render(r, in_token):
        nm, s, e, cs = r
        if _tree_skip(nm):
            return None
        if nm == "__t__":
            return ('"' + text[s:e] + '"') if tomita and not in_token else None
        if in_token and nm not in tracked:
            sub = [
                x
                for c in cs
                if (x := render(c, True)) is not None
            ]
            return " ".join(sub) if sub else None
        child_tok = in_token or kinds.get(nm) in ("token", "pattern")
        sub = [
            x for c in cs if (x := render(c, child_tok)) is not None
        ]
        if sub:
            return nm + "[" + " ".join(sub) + "]"
        return nm + '"' + text[s:e] + '"'

    if not tomita and len(children) == 1 and children[0][3]:
        # regex-mode walker root is unnamed: bare brackets around the
        # top rule's children (dpat1's `Tree: [namet[...] ...]`)
        sub = [
            x
            for c in children[0][3]
            if (x := render(c, False)) is not None
        ]
        return "[" + " ".join(sub) + "]"
    return " ".join(
        x for c in children if (x := render(c, False)) is not None
    )


def parse_tree_xml(
    text: str, children: tuple, kinds: dict, tomita: bool, tracked=frozenset()
) -> str:
    """The parselib XML parse-tree rendering (getXmlParseTree): tags
    indented one space per level, terminals inline, a <matches>
    wrapper.  Same walker contract as parse_tree_str."""
    out: list = []

    def rec(r, indent, in_token):
        nm, s, e, cs = r
        if _tree_skip(nm):
            return
        if nm == "__t__":
            if tomita and not in_token:
                out.append(text[s:e])
            return
        if in_token and nm not in tracked:
            for c in cs:
                rec(c, indent, True)
            return
        child_tok = in_token or kinds.get(nm) in ("token", "pattern")
        kids = [c for c in cs if not _tree_skip(c[0])]
        probe: list = []
        save = out[:]
        del out[:]
        for c in kids:
            rec(c, indent + 1, child_tok)
        probe = out[:]
        del out[:]
        out.extend(save)
        out.append(" " * indent + "<" + nm + ">")
        if probe:
            out.append("\n")
            out.extend(probe)
            out.append(" " * indent)
        else:
            out.append(text[s:e])
        out.append("</" + nm + ">\n")

    if not tomita and len(children) == 1 and children[0][3]:
        for c in children[0][3]:
            rec(c, 0, False)
    else:
        for c in children:
            rec(c, 0, False)
    return "<matches>" + "".join(out) + "</matches>"
