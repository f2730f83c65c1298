"""Correlated-filter literal-map fallback census gate (r15 verdict #7).

`_corr_filter_array` prefers the UNBOUNDED re-based plans — the
groupBy(key) + collect_list + co-partitioned join for row contexts, and
the one-row broadcast map<key, array<row>> crossJoin for element
contexts (sqfilt2's sum(booksDs, price) inside a persons-element
filter). The cap-guarded driver literal map remains only for contexts
that cannot re-base their frame.

r16 census frontier: sqshare 10 + sqfilt2 1 (11 total driver-collect
takes). r17 closed it: OUTPUT projections re-base via _member_value
(joins COMPOSE onto one swap frame keyed on the original df, so name
resolution never re-bases mid-projection — the failure mode of the r16
attempt), and element contexts re-base via the broadcast-map plan. This
test pins the frontier at ZERO for both files so a regression that
pushes any shape back onto the driver-collect path fails loudly.
"""
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ECL = "/root/reference/testing/regress/ecl"


@pytest.mark.skipif(not os.path.isdir(_ECL), reason="reference absent")
def test_fallback_census_frontier(spark):
    sys.path.insert(0, _REPO)
    import hpcc_platform_spark.eclfront as ef
    from test_reference_regress import _queryxml, read_ecl

    hits = {}
    for name in ("sqfilt2", "sqshare"):
        ef._Parser._corr_fallback_hits = 0
        acts = ef.run_ecl_actions(
            read_ecl(os.path.join(_ECL, f"{name}.ecl")),
            {},
            spark=spark,
            stored=_queryxml(name),
        )
        for df in acts:
            df.collect()
        hits[name] = ef._Parser._corr_fallback_hits
    assert hits["sqshare"] == 0, (
        "sqshare regressed onto the driver-collect correlated fallback "
        f"(was 0 after the r17 re-base): {hits['sqshare']} hits"
    )
    assert hits["sqfilt2"] == 0, (
        "sqfilt2 regressed onto the driver-collect correlated fallback "
        f"(was 0 after the r17 element-map re-base): {hits['sqfilt2']} hits"
    )
