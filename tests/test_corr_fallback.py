"""Correlated-filter literal-map fallback census gate (r15 verdict #7).

`_corr_filter_array` prefers the UNBOUNDED re-based join plan
(groupBy(key) + collect_list + one co-partitioned join); the cap-guarded
driver literal map is the fallback for contexts that cannot re-base
their frame. A full census over the VERBATIM suite (tools/corr_census.py, r16)
found the fallback takes concentrated in two files: sqshare (10 — its
hoisted scalars over correlated separate datasets resolve source chains
against the ORIGINAL frame, so the projection cannot swap to the joined
plan mid-member; r16 attempt reverted) and sqfilt2 (1). This test pins
that frontier so a regression that silently pushes more shapes onto the
driver-collect path fails loudly.
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
    # the r16 census frontier: sqshare 10, sqfilt2 1
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
    assert hits["sqshare"] <= 10, (
        "sqshare's fallback takes grew past the r16 census (10): "
        f"{hits['sqshare']} hits"
    )
    assert hits["sqfilt2"] <= 1, (
        "sqfilt2's fallback takes grew past the r16 census (1): "
        f"{hits['sqfilt2']} hits"
    )
