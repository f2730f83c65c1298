"""COVERAGE.md ledger freshness gate.

r14 and r15 both shipped stale hand-committed ledger totals; this test
makes the snapshot honest by construction: the committed COVERAGE.md
table must byte-match what `tools/verbatim_ledger.py --write` would
produce from the VERBATIM list and the reference key directory. Run
`python tools/verbatim_ledger.py --write` after editing the VERBATIM
list (or the scope-cut patterns) to regenerate it.
"""
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_KEYDIR = os.environ.get(
    "SPARK_GRAFT_REF_KEYS", "/root/reference/testing/regress/ecl/key"
)


@pytest.mark.skipif(not os.path.isdir(_KEYDIR), reason="reference absent")
def test_coverage_md_ledger_table_is_fresh():
    sys.path.insert(0, os.path.join(_REPO, "tools"))
    import verbatim_ledger as VL

    lines, _missing = VL.build_table()
    doc = open(os.path.join(_REPO, "COVERAGE.md")).read().split("\n")
    assert lines[0] in doc, "COVERAGE.md lost the ledger table header"
    start = doc.index(lines[0])
    got = doc[start : start + len(lines)]
    assert got == lines, (
        "COVERAGE.md ledger table is stale — run "
        "`python tools/verbatim_ledger.py --write`"
    )
    # and the table ends where the fresh one ends (no orphan rows)
    tail = start + len(lines)
    assert tail >= len(doc) or not doc[tail].startswith("|"), (
        "COVERAGE.md ledger table has trailing orphan rows — run "
        "`python tools/verbatim_ledger.py --write`"
    )
