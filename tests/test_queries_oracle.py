"""The core correctness gate, locally: every registered query with an
oracle must match DuckDB on the test scale factor — the same comparison
the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from hpcc_platform_spark.queries import REGISTRY
from tests.helpers import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        assert df.limit(1).count() >= 0  # rows-only smoke for non-SQL ops
        return
    assert_matches_oracle(df, duck, qd.oracle, name=name)
