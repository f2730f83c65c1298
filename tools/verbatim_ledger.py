"""Regenerate the verbatim-coverage ledger (COVERAGE.md §verbatim).

Prints a per-family table of the reference's key-XML files (the
denominator), how many are pinned VERBATIM by
tests/test_reference_regress.py, the documented scope cuts, and the
remaining frontier. Usage:

    python tools/verbatim_ledger.py            # markdown table to stdout
    python tools/verbatim_ledger.py --write    # ALSO rewrite the table
                                               # block in COVERAGE.md in
                                               # place (keeps the totals
                                               # honest — r14/r15 both
                                               # shipped stale hand-
                                               # committed totals)
"""
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_KEYDIR = os.environ.get(
    "SPARK_GRAFT_REF_KEYS", "/root/reference/testing/regress/ecl/key"
)

# Documented scope cuts (SURVEY.md §5): fixtures that derive from
# Project Gutenberg texts the reference downloads at setup time and
# which are verifiably absent from /root/reference/testing/regress/
# download/ — the searchIndex/searchSource family — plus the
# C++-emulation family (arbitrary BEGINC++ dataset bodies), plus the
# other-language EMBED/plugin surfaces and the platform spray/despray
# services (SURVEY.md §5 "Verbatim-denominator scope cuts": their
# PySpark-native analogues are pandas_udf/mapInPandas and native
# parquet/file I/O — running Java/JS/Python-2 embeds or dfu spray
# inside this engine is out of scope by design, not unfinished work).
SCOPE_CUTS = {
    "indexmerge",  # getSearchIndex() over the downloaded texts
    "textsearch4",  # executeBatchAgainstSearchIndex: same Gutenberg
    #                 searchIndex fixture as stepping7-9
    "normalize4",  # _LINKCOUNTED_ BEGINC++ dataset bodies (rtlMalloc)
    "issue16712",  # key XML exists but NO .ecl source anywhere in the
    #                reference tree — unrunnable by construction
}

# Prefix-form scope cuts: the whole Gutenberg-fixture stepping tail
# (stepping7/7a-h, 8/8a/8b, 9a/9b, steplimit1-3 — all drive
# getSearchIndex() over texts the reference downloads at setup time,
# absent from /root/reference/testing/regress/download/).
SCOPE_CUT_PREFIXES = ("stepping7", "stepping8", "stepping9", "steplimit")


def _pattern_cuts(keys):
    """Family-level scope cuts by name pattern (embed/plugin/spray
    surfaces — SURVEY.md §5). Each matched file was verified to drive
    an other-language EMBED (Java/JS/Python/R/C++/mysql/wasm — e.g.
    embed.ecl is EMBED(C++), javagather.ecl EMBED(Java), libraryjava /
    aaalibraryjava build a Java-embedded library), the reference's
    parquet PLUGIN surface (this engine's parquet I/O is native), or
    the dfu spray/despray Dali services. Their PySpark-native analogues
    are pandas_udf / mapInPandas and spark.read/write — running a JVM/
    CPython-2/V8/R/wasm embed inside this engine is out of scope by
    design, not unfinished work."""
    rx = re.compile(
        r"^(javaembed|embedpy|embedjs|embedactivity|parquet"
        r"|py[23]?(embedactivity|import|streame)|spray_|despray$"
        r"|embedjava|embedr\d*$|embed$|embedforward$|embedcppinline$"
        r"|cppembed|mysqlembed|wasmembed"
        r"|java-(activity|fold|stream)$|javagather$|javaimport$"
        r"|javalibrary$|javapersist$|javascope$|libraryjava$"
        r"|aaalibraryjava$)",
        re.I,
    )
    return {k for k in keys if rx.match(k)}


def families(names):
    out = {}
    for n in names:
        fam = re.match(r"^[A-Za-z_]+", n)
        key = fam.group(0).rstrip("_").lower() if fam else n
        out.setdefault(key, []).append(n)
    return out


def build_table():
    """The ledger table as a list of markdown lines (plus the set of
    verbatim names with no key file, for the stderr warning)."""
    txt = open(
        os.path.join(_REPO, "tests", "test_reference_regress.py")
    ).read()
    m = re.search(r"VERBATIM = \[(.*?)\n\]", txt, re.S)
    verbatim = set(re.findall(r'"([^"]+)"', m.group(1)))
    keys = sorted(
        f[:-4] for f in os.listdir(_KEYDIR) if f.endswith(".xml")
    )
    keyset = set(keys)
    cuts = SCOPE_CUTS | _pattern_cuts(keyset)
    cuts |= {k for k in keyset if k.startswith(SCOPE_CUT_PREFIXES)}
    missing_v = sorted(verbatim - keyset)
    fams = families(keys)
    rows = []
    for fam, members in sorted(fams.items()):
        v = sum(1 for x in members if x in verbatim)
        c = sum(1 for x in members if x in cuts)
        r = len(members) - v - c
        rows.append((fam, len(members), v, c, r))
    big = [r for r in rows if r[1] >= 4 or r[2] > 0 or r[3] > 0]
    small_tot = [r for r in rows if r not in big]
    lines = [
        "| family | keys | verbatim | scope-cut | remaining |",
        "|---|---|---|---|---|",
    ]
    for fam, n, v, c, r in sorted(big, key=lambda x: -x[4]):
        lines.append(f"| {fam} | {n} | {v} | {c} | {r} |")
    sn = sum(r[1] for r in small_tot)
    sv = sum(r[2] for r in small_tot)
    sc = sum(r[3] for r in small_tot)
    lines.append(
        f"| (untouched families with <4 keys, {len(small_tot)}"
        f" families) | {sn} | {sv} | {sc} | {sn - sv - sc} |"
    )
    tot_v = len(verbatim & keyset)
    tot_c = len(cuts & keyset)
    lines.append(
        f"| **total** | **{len(keys)}** | **{tot_v}** | **{tot_c}** |"
        f" **{len(keys) - tot_v - tot_c}** |"
    )
    return lines, missing_v


def write_coverage(lines):
    """Replace the ledger table block in COVERAGE.md in place (from the
    '| family | ...' header through the trailing '| **total** |' row)."""
    path = os.path.join(_REPO, "COVERAGE.md")
    doc = open(path).read().split("\n")
    try:
        start = doc.index(lines[0])
    except ValueError:
        print("COVERAGE.md: ledger table header not found", file=sys.stderr)
        return 1
    end = start
    while end < len(doc) and doc[end].startswith("|"):
        end += 1
    doc[start:end] = lines
    open(path, "w").write("\n".join(doc))
    print(f"COVERAGE.md: table rewritten ({end - start} -> {len(lines)}"
          " lines)", file=sys.stderr)
    return 0


def main():
    lines, missing_v = build_table()
    for ln in lines:
        print(ln)
    if missing_v:
        print(f"\nverbatim entries with no key file: {missing_v}",
              file=sys.stderr)
    if "--write" in sys.argv:
        return write_coverage(lines)
    return 0


if __name__ == "__main__":
    sys.exit(main())
